"""Scene/dataset readers: COLMAP and Blender(NeRF-synthetic) formats.

Capability parity with reference scene/dataset_readers.py and
utils/camera_utils.py: nerf++ normalization radius, llffhold-8 eval split,
segment-artifact loading (segment_indices.npy / mask_areas.npy from the
identification pipeline output dirs), the 1600px auto-downscale rule, and
RGBA->mask splitting. Images are decoded to numpy float32 CHW on host; the
training input pipeline ships them to device asynchronously in batches
rather than per-iteration copies.
"""
from __future__ import annotations

import dataclasses
import json
import os
from pathlib import Path
from typing import Dict, List, Optional

import numpy as np

from gaussmart_tpu.cameras import Camera, focal2fov, fov2focal, world_to_view
from gaussmart_tpu.io import colmap
from gaussmart_tpu.io.ply import fetch_point_cloud, store_point_cloud
from gaussmart_tpu.ops.sh import sh2rgb

# identification-pipeline artifact locations (CWD-relative in the reference —
# dataset_readers.py:115-127; kept, plus a source-dir-relative variant).
SEGMENT_ARTIFACT_DIRS = [
    os.path.join("identification", "results", "segments", "point_cloud"),
    os.path.join("segmentation", "results", "point_cloud"),
]


@dataclasses.dataclass
class CameraInfo:
    uid: int
    R: np.ndarray
    T: np.ndarray
    fovy: float
    fovx: float
    image_path: str
    image_name: str
    width: int
    height: int
    # Blender images need alpha compositing at load time
    white_background: Optional[bool] = None


@dataclasses.dataclass
class PointCloud:
    points: np.ndarray
    colors: np.ndarray
    normals: np.ndarray
    segments: np.ndarray
    mask_areas: Dict[int, float]


@dataclasses.dataclass
class SceneInfo:
    point_cloud: PointCloud
    train_cameras: List[CameraInfo]
    test_cameras: List[CameraInfo]
    nerf_normalization: Dict
    ply_path: str


def nerfpp_norm(cam_infos: List[CameraInfo]) -> Dict:
    """Camera-bounding-sphere normalization (dataset_readers.py:45-66)."""
    centers = []
    for cam in cam_infos:
        w2c = world_to_view(cam.R, cam.T).T  # column-vector
        c2w = np.linalg.inv(w2c)
        centers.append(c2w[:3, 3])
    centers = np.stack(centers, axis=0)
    center = centers.mean(axis=0)
    diagonal = np.linalg.norm(centers - center, axis=1).max()
    return {"translate": -center, "radius": diagonal * 1.1}


def load_segment_artifacts(n_points: int, extra_dirs: List[str] = ()):
    """Load segment indices + mask areas from the identification pipeline
    output (fetchPly behavior, dataset_readers.py:115-146)."""
    segments = None
    mask_areas: Dict[int, float] = {}
    dirs = list(extra_dirs) + SEGMENT_ARTIFACT_DIRS
    for d in dirs:
        p = os.path.join(d, "segment_indices.npy")
        if segments is None and os.path.exists(p):
            segments = np.load(p)
    for d in dirs:
        p = os.path.join(d, "mask_areas.npy")
        if not mask_areas and os.path.exists(p):
            mask_areas = np.load(p, allow_pickle=True).item()
    if segments is None:
        segments = np.zeros(n_points, np.int32)
    return segments, mask_areas


def fetch_pcd(path: str, extra_artifact_dirs: List[str] = ()) -> PointCloud:
    pts, cols, normals = fetch_point_cloud(path)
    segments, mask_areas = load_segment_artifacts(len(pts), extra_artifact_dirs)
    # length reconciliation quirk (dataset_readers.py:152-160)
    if len(segments) != len(pts):
        m = min(len(segments), len(pts))
        pts, cols, normals, segments = pts[:m], cols[:m], normals[:m], segments[:m]
    return PointCloud(pts, cols, normals, segments.astype(np.int32), mask_areas)


def read_colmap_scene(path: str, images: str = "images", eval_split: bool = False,
                      llffhold: int = 8) -> SceneInfo:
    sparse = os.path.join(path, "sparse/0")
    try:
        extr = colmap.read_images_binary(os.path.join(sparse, "images.bin"))
        intr = colmap.read_cameras_binary(os.path.join(sparse, "cameras.bin"))
    except FileNotFoundError:
        extr = colmap.read_images_text(os.path.join(sparse, "images.txt"))
        intr = colmap.read_cameras_text(os.path.join(sparse, "cameras.txt"))

    cam_infos = []
    for key in extr:
        e = extr[key]
        i = intr[e.camera_id]
        R = colmap.qvec2rotmat(e.qvec).T
        if i.model == "SIMPLE_PINHOLE":
            fovx = focal2fov(i.params[0], i.width)
            fovy = focal2fov(i.params[0], i.height)
        elif i.model == "PINHOLE":
            fovx = focal2fov(i.params[0], i.width)
            fovy = focal2fov(i.params[1], i.height)
        else:
            raise ValueError(
                f"Unsupported COLMAP camera model {i.model}: undistort first "
                "(PINHOLE / SIMPLE_PINHOLE only)")
        image_path = os.path.join(path, images, os.path.basename(e.name))
        cam_infos.append(CameraInfo(
            uid=i.id, R=R, T=np.array(e.tvec), fovx=fovx, fovy=fovy,
            image_path=image_path,
            image_name=os.path.basename(image_path).split(".")[0],
            width=i.width, height=i.height))
    cam_infos.sort(key=lambda c: c.image_name)

    if eval_split:
        train = [c for i, c in enumerate(cam_infos) if i % llffhold != 0]
        test = [c for i, c in enumerate(cam_infos) if i % llffhold == 0]
    else:
        train, test = cam_infos, []

    norm = nerfpp_norm(train)

    # prefer the identification pipeline's cleaned+segmented cloud
    ply_path = None
    for d in SEGMENT_ARTIFACT_DIRS:
        p = os.path.join(d, "segmented_point_cloud.ply")
        if os.path.exists(p):
            ply_path = p
            break
    if ply_path is None:
        ply_path = os.path.join(sparse, "points3D.ply")
        if not os.path.exists(ply_path):
            try:
                xyz, rgb, _ = colmap.read_points3d_binary(
                    os.path.join(sparse, "points3D.bin"))
            except FileNotFoundError:
                xyz, rgb, _ = colmap.read_points3d_text(
                    os.path.join(sparse, "points3D.txt"))
            store_point_cloud(ply_path, xyz, rgb)

    pcd = fetch_pcd(ply_path)
    return SceneInfo(pcd, train, test, norm, ply_path)


def read_blender_scene(path: str, white_background: bool,
                       eval_split: bool = False, extension: str = ".png",
                       rng: Optional[np.random.Generator] = None) -> SceneInfo:
    """NeRF-synthetic reader (dataset_readers.py:260-336)."""
    def read_transforms(fname, uid0):
        with open(os.path.join(path, fname)) as f:
            contents = json.load(f)
        fovx = contents["camera_angle_x"]
        infos = []
        for idx, frame in enumerate(contents["frames"]):
            img_path = os.path.join(path, frame["file_path"] + extension)
            c2w = np.array(frame["transform_matrix"])
            c2w[:3, 1:3] *= -1          # OpenGL -> COLMAP axes
            w2c = np.linalg.inv(c2w)
            R = w2c[:3, :3].T
            T = w2c[:3, 3]
            from PIL import Image
            with Image.open(img_path) as im:
                width, height = im.size
            fovy = focal2fov(fov2focal(fovx, width), height)
            infos.append(CameraInfo(
                uid=uid0 + idx, R=R, T=T, fovx=fovx, fovy=fovy,
                image_path=img_path, image_name=Path(img_path).stem,
                width=width, height=height, white_background=white_background))
        return infos

    train = read_transforms("transforms_train.json", 0)
    test = read_transforms("transforms_test.json", len(train))
    if not eval_split:
        train = train + test
        test = []
    norm = nerfpp_norm(train)

    ply_path = os.path.join(path, "points3d.ply")
    if not os.path.exists(ply_path):
        rng = rng or np.random.default_rng(0)
        num_pts = 100_000
        xyz = rng.random((num_pts, 3)) * 2.6 - 1.3
        shs = rng.random((num_pts, 3)) / 255.0
        store_point_cloud(ply_path, xyz, np.asarray(sh2rgb(shs)) * 255)
    pcd = fetch_pcd(ply_path)
    return SceneInfo(pcd, train, test, norm, ply_path)


def detect_and_read(source_path: str, images: str = "images",
                    white_background: bool = False,
                    eval_split: bool = False) -> SceneInfo:
    """Scene-type autodetect (scene/__init__.py:43-49)."""
    if os.path.exists(os.path.join(source_path, "sparse")):
        return read_colmap_scene(source_path, images, eval_split)
    if os.path.exists(os.path.join(source_path, "transforms_train.json")):
        return read_blender_scene(source_path, white_background, eval_split)
    raise ValueError(f"Could not recognize scene type at {source_path}")


# -- image loading with the reference's resolution rules --------------------

_WARNED = False


def compute_resolution(orig_w: int, orig_h: int, resolution: int,
                       resolution_scale: float = 1.0):
    """utils/camera_utils.py:19-39 rules: divisors {1,2,4,8}; -1 means
    auto-cap at 1600px width; other values are an explicit target width."""
    global _WARNED
    if resolution in (1, 2, 4, 8):
        return (round(orig_w / (resolution_scale * resolution)),
                round(orig_h / (resolution_scale * resolution)))
    if resolution == -1:
        if orig_w > 1600:
            if not _WARNED:
                print("[ INFO ] large input images detected; rescaling to 1.6K "
                      "width (use --resolution 1 to disable)")
                _WARNED = True
            global_down = orig_w / 1600
        else:
            global_down = 1
    else:
        global_down = orig_w / resolution
    scale = float(global_down) * float(resolution_scale)
    return int(orig_w / scale), int(orig_h / scale)


def load_camera(info: CameraInfo, resolution: int = -1,
                resolution_scale: float = 1.0) -> Camera:
    """Decode + resize the image, build the Camera (loadCam parity)."""
    from PIL import Image

    with Image.open(info.image_path) as pil:
        w, h = compute_resolution(pil.size[0], pil.size[1], resolution,
                                  resolution_scale)
        if info.white_background is not None and pil.mode == "RGBA":
            # Blender/NeRF-synthetic: composite onto the background at FULL
            # resolution BEFORE resizing (dataset_readers.py:285-291
            # composites, loadCam resizes the composited RGB) — resizing
            # straight alpha first bleeds the RGB of fully transparent
            # pixels into object edges.
            full = np.asarray(pil).astype(np.float32) / 255.0
            bg = 1.0 if info.white_background else 0.0
            rgb = full[..., :3] * full[..., 3:4] + bg * (1 - full[..., 3:4])
            comp = Image.fromarray(
                (np.clip(rgb, 0, 1) * 255.0).astype(np.uint8), "RGB")
            arr = np.asarray(comp.resize((w, h))).astype(np.float32) / 255.0
        else:
            pil = pil.resize((w, h))
            arr = np.asarray(pil).astype(np.float32) / 255.0

    alpha_mask = None
    if arr.ndim == 3 and arr.shape[2] == 4:
        if info.white_background is not None:
            bg = 1.0 if info.white_background else 0.0
            rgb = arr[..., :3] * arr[..., 3:4] + bg * (1 - arr[..., 3:4])
        else:
            # COLMAP RGBA: raw RGB + a SEPARATE alpha mask. The reference
            # keeps the GT premultiply commented out (scene/cameras.py:
            # 43-48), so the training target is the raw RGB; only mesh
            # extraction consumes gt_alpha_mask.
            rgb = arr[..., :3]
            alpha_mask = arr[..., 3:4].transpose(2, 0, 1)
        arr = rgb
    elif arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    image = np.clip(arr.transpose(2, 0, 1), 0.0, 1.0)

    return Camera(uid=info.uid, colmap_id=info.uid, image_name=info.image_name,
                  R=info.R, T=info.T, fovx=info.fovx, fovy=info.fovy,
                  width=image.shape[2], height=image.shape[1],
                  image=image, alpha_mask=alpha_mask)


def camera_to_json(idx: int, cam: CameraInfo) -> dict:
    """cameras.json entry (utils/camera_utils.py:64-83)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = cam.R.transpose()
    Rt[:3, 3] = cam.T
    Rt[3, 3] = 1.0
    W2C = np.linalg.inv(Rt)
    return {
        "id": idx,
        "img_name": cam.image_name,
        "width": cam.width,
        "height": cam.height,
        "position": W2C[:3, 3].tolist(),
        "rotation": [r.tolist() for r in W2C[:3, :3]],
        "fy": fov2focal(cam.fovy, cam.height),
        "fx": fov2focal(cam.fovx, cam.width),
    }
