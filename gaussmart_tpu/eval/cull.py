"""Mask-based mesh culling before DTU Chamfer evaluation.

Behavior parity with reference scripts/eval_dtu/evaluate_single_scene.py:
19-101: project mesh vertices into every view with P = world_mat@scale_mat
decomposed into K[R|t], sample the 24px-dilated object masks, keep only
vertices visible inside a mask in EVERY view, then rescale vertices to
world via scale_mat. numpy/cv2 (no torch/trimesh/skimage).
"""
from __future__ import annotations

import glob
import os
from typing import Tuple

import numpy as np

from gaussmart_tpu.mesh.meshing import TriMesh

DTU_WH = (1600, 1200)


def load_K_Rt_from_P(P: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Decompose a 3x4 projection into intrinsics K (4x4) and pose c2w (4x4)
    via RQ decomposition (the IDR/DTU convention)."""
    import cv2

    out = cv2.decomposeProjectionMatrix(P.astype(np.float64))
    K, R, t = out[0], out[1], out[2]
    K = K / K[2, 2]
    intrinsics = np.eye(4)
    intrinsics[:3, :3] = K
    pose = np.eye(4)
    pose[:3, :3] = R.transpose()
    pose[:3, 3] = (t[:3] / t[3])[:, 0]
    return intrinsics, pose


def dilate_mask(mask: np.ndarray, radius: int = 24) -> np.ndarray:
    import cv2

    kernel = cv2.getStructuringElement(cv2.MORPH_ELLIPSE,
                                       (2 * radius + 1, 2 * radius + 1))
    return cv2.dilate(mask.astype(np.uint8), kernel).astype(bool)


def cull_mesh_by_masks(mesh: TriMesh, cameras_npz: str, mask_dir: str,
                       image_wh: Tuple[int, int] = DTU_WH,
                       dilation: int = 24) -> TriMesh:
    import cv2

    cam = np.load(cameras_npz)
    n_images = sum(1 for k in cam.files if k.startswith("world_mat_")
                   and not k.startswith("world_mat_inv"))
    W, H = image_wh

    mask_paths = sorted(glob.glob(os.path.join(mask_dir, "*.png")))
    verts = np.asarray(mesh.vertices, np.float64)
    hom = np.concatenate([verts, np.ones((len(verts), 1))], axis=1)

    keep = np.ones(len(verts), bool)
    scale_mat0 = cam["scale_mat_0"].astype(np.float64)
    for i in range(n_images):
        world_mat = cam[f"world_mat_{i}"].astype(np.float64)
        scale_mat = cam[f"scale_mat_{i}"].astype(np.float64)
        P = (world_mat @ scale_mat)[:3, :4]
        intr, pose = load_K_Rt_from_P(P)
        w2c = np.linalg.inv(pose)
        cp = (intr[:3, :3] @ (w2c[:3] @ hom.T))
        pix = cp[:2] / (cp[2:3] + 1e-6)
        u = pix[0]
        v = pix[1]
        valid = (u > 0) & (u < W - 1) & (v > 0) & (v < H - 1)
        if i < len(mask_paths):
            m = cv2.imread(mask_paths[i])[:, :, 0] > 127
            m = dilate_mask(m, dilation)
            mh, mw = m.shape
            ui = np.clip(np.round(u * (mw - 1) / (W - 1)).astype(int), 0, mw - 1)
            vi = np.clip(np.round(v * (mh - 1) / (H - 1)).astype(int), 0, mh - 1)
            inside = m[vi, ui]
        else:
            inside = np.ones(len(verts), bool)
        # outside the image counts as kept (1-valid term in the reference)
        keep &= inside | ~valid

    face_keep = keep[mesh.faces].all(axis=1)
    out = TriMesh(verts.copy(), mesh.faces[face_keep],
                  mesh.vertex_colors.copy() if mesh.vertex_colors is not None
                  else None)
    out = out.remove_unreferenced()
    # rescale to world (evaluate_single_scene.py:98-100)
    out.vertices = out.vertices * scale_mat0[0, 0] + scale_mat0[:3, 3][None]
    return out


def main(argv=None):
    import argparse
    from gaussmart_tpu.mesh.meshing import load_mesh_ply, save_mesh_ply
    from gaussmart_tpu.eval.chamfer import evaluate_dtu_mesh

    p = argparse.ArgumentParser("DTU single-scene culled evaluation")
    p.add_argument("--input_mesh", required=True)
    p.add_argument("--scan_id", type=int, required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--mask_dir", required=True,
                   help="dataset root containing scanN/{cameras.npz,mask}")
    p.add_argument("--DTU", required=True, help="official GT root")
    a = p.parse_args(argv)

    os.makedirs(a.output_dir, exist_ok=True)
    mesh = load_mesh_ply(a.input_mesh)
    instance = os.path.join(a.mask_dir, f"scan{a.scan_id}")
    culled = cull_mesh_by_masks(mesh,
                                os.path.join(instance, "cameras.npz"),
                                os.path.join(instance, "mask"))
    culled_path = os.path.join(a.output_dir, "culled_mesh.ply")
    save_mesh_ply(culled_path, culled)
    evaluate_dtu_mesh(culled_path, a.scan_id, a.DTU, a.output_dir)


if __name__ == "__main__":
    main()
