"""Point-cloud -> view projection + segment assignment.

Parity with reference identification/pc_projection.py, including the
documented quirks (SURVEY.md §7.8-9): the DTU <10%-inbounds fallback with
invented intrinsics, the TYT bbox-normalized pseudo-projection, rounded-
pixel mask lookup with later-masks-overwrite, first-view-wins assignment
and max-merged mask areas.
"""
from __future__ import annotations

from typing import Dict, List, Tuple

import numpy as np

DTU_WH = (1554, 1162)
TYT_FALLBACK_WH = (982, 543)


def project_points_to_view(points: np.ndarray, camera: Dict,
                           dataset_type: str) -> Tuple[np.ndarray, np.ndarray]:
    dataset_type = dataset_type.lower()
    if dataset_type == "dtu":
        world_mat = camera["world_mat"]
        scale_mat = camera["scale_mat"]
        cam_mat = camera["camera_mat"]
        homo = np.hstack([points, np.ones((len(points), 1))])
        scaled = (scale_mat @ homo.T).T
        cam_pts = (world_mat @ scaled.T).T
        z = cam_pts[:, 2].copy()
        fx, fy = cam_mat[0, 0], cam_mat[1, 1]
        cx, cy = cam_mat[0, 2], cam_mat[1, 2]
        x = cam_pts[:, 0] / cam_pts[:, 3]
        y = cam_pts[:, 1] / cam_pts[:, 3]
        pts2d = np.column_stack([fx * x + cx, fy * y + cy])

        w, h = DTU_WH
        in_bounds = np.all((pts2d >= [0, 0]) & (pts2d < [w, h]), axis=1)
        if in_bounds.sum() < 0.1 * len(points):
            # fallback heuristic with invented intrinsics (quirk §7.9)
            cam_pos = -np.linalg.inv(world_mat[:3, :3]) @ world_mat[:3, 3]
            vec = points - cam_pos
            nrm = vec / np.linalg.norm(vec, axis=1, keepdims=True)
            pts2d = nrm[:, :2] / (nrm[:, 2:3] + 1e-10)
            pts2d = np.column_stack([pts2d[:, 0] * (w / 3) + w / 2,
                                     pts2d[:, 1] * (h / 3) + h / 2])
        return pts2d, z

    if dataset_type == "nerf":
        K = camera["camera_mat"][:3, :3]
        R = camera["world_mat"][:3, :3]
        t = camera["world_mat"][:3, 3]
        cam_pts = (R @ points.T).T + t
        proj = (K @ cam_pts.T).T
        return proj[:, :2] / proj[:, 2:], cam_pts[:, 2]

    if dataset_type == "tyt":
        w, h = camera.get("img_size", TYT_FALLBACK_WH)
        valid = ~np.isnan(points).any(axis=1)
        if not valid.any():
            return np.zeros((len(points), 2)), np.zeros(len(points))
        lo = points[valid].min(axis=0)
        hi = points[valid].max(axis=0)
        pad = 0.1
        nx = pad + (1 - 2 * pad) * (points[:, 0] - lo[0]) / (hi[0] - lo[0] + 1e-10)
        ny = pad + (1 - 2 * pad) * (points[:, 1] - lo[1]) / (hi[1] - lo[1] + 1e-10)
        pts2d = np.nan_to_num(np.column_stack([nx * w, ny * h]))
        world_mat = camera["world_mat"]
        R = world_mat[:3, :3]
        t = world_mat[:3, 3]
        C = -R.T @ t
        z = (points - C) @ R[2, :]
        return pts2d, z

    raise ValueError(f"Dataset type {dataset_type} not projectable")


def assign_segment_indices_simple(points_2d: np.ndarray,
                                  masks: List[np.ndarray]) -> np.ndarray:
    """Sequential mask-index assignment by rounded pixel; later masks
    overwrite earlier within a view (pc_projection.py:111-135)."""
    if not masks:
        return -np.ones(len(points_2d), dtype=int)
    seg = -np.ones(len(points_2d), dtype=int)
    ys = np.round(points_2d[:, 1]).astype(int)
    xs = np.round(points_2d[:, 0]).astype(int)
    for mask_idx, mask in enumerate(masks):
        ok = ((xs >= 0) & (xs < mask.shape[1])
              & (ys >= 0) & (ys < mask.shape[0]))
        inside = np.zeros_like(ok)
        inside[ok] = mask[ys[ok], xs[ok]] > 0
        seg[inside] = mask_idx
    return seg


def _occlusion_mask(pts2d: np.ndarray, depths: np.ndarray, visible,
                    w: int, h: int, bin_px: int = 8,
                    rel_tol: float = 0.05) -> np.ndarray:
    """Points within (1+rel_tol) of their pixel-bin's nearest depth.

    The reference projection is occlusion-blind (pc_projection.py:111-135
    looks masks up by rounded pixel with no z-test), which floods an
    object's segment with every point BEHIND it along the view — measured
    on the under-sampled-sphere scene: 26 actual sphere SfM points, but
    5,553 points assigned to the sphere's segment, so the mask-area
    augmentation target (sqrt(area)*0.1 = 26) never fires. This opt-in
    z-cull keeps, per coarse pixel bin, only the depth-nearest surface."""
    bx = np.clip(pts2d[:, 0].astype(int) // bin_px, 0, (w - 1) // bin_px)
    by = np.clip(pts2d[:, 1].astype(int) // bin_px, 0, (h - 1) // bin_px)
    flat = by * ((w + bin_px - 1) // bin_px) + bx
    nbins = ((h + bin_px - 1) // bin_px) * ((w + bin_px - 1) // bin_px)
    near = np.full(nbins, np.inf)
    np.minimum.at(near, flat[visible], depths[visible])
    return depths <= near[flat] * (1.0 + rel_tol)


def project_segments(points: np.ndarray, all_masks: List[List[Dict]],
                     cameras_dict: Dict, dataset_type: str,
                     z_cull: bool = False
                     ) -> Tuple[np.ndarray, Dict[int, int]]:
    """First-view-wins segment assignment + max-merged mask areas
    (identification/main.py:114-148). `z_cull=False` is reference parity
    (occlusion-blind); True enables the per-pixel-bin depth test above."""
    segment_indices = -np.ones(len(points), dtype=int)
    mask_areas: Dict[int, int] = {}
    for view_idx, masks_list in enumerate(all_masks):
        if not masks_list:
            continue
        camera = cameras_dict[f"camera_{view_idx:03d}"]
        seg_masks = [m["segmentation"] for m in masks_list]
        for mask_idx, mask in enumerate(seg_masks):
            area = int(np.sum(mask > 0))
            mask_areas[mask_idx] = max(mask_areas.get(mask_idx, 0), area)

        h, w = seg_masks[0].shape
        pts2d, depths = project_points_to_view(points, camera, dataset_type)
        in_bounds = np.all((pts2d >= [0, 0]) & (pts2d < [w, h]), axis=1)
        visible = in_bounds & (depths > 0) & (segment_indices == -1)
        if z_cull:
            front = _occlusion_mask(pts2d, depths,
                                    in_bounds & (depths > 0), w, h)
            visible = visible & front
        if not visible.any():
            continue
        clipped = np.clip(pts2d[visible], [0, 0], [w - 1, h - 1])
        view_seg = assign_segment_indices_simple(clipped, seg_masks)
        segment_indices[visible] = np.where(view_seg != -1, view_seg, -1)
    return segment_indices, mask_areas
