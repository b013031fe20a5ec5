"""Camera model.

Convention parity with the reference (scene/cameras.py:50-59,
utils/graphics_utils.py:32-67): row-vector matrices, i.e.
``x_view = x_world_h @ world_view`` and ``x_clip = x_world_h @ full_proj``.
znear=0.01, zfar=100, z_sign=+1 perspective with w_clip = z_view.

TPU-first differences: a camera is an immutable pytree of jnp arrays (no
nn.Module); GT images live in host memory as numpy and are shipped to device
in batches by the input pipeline, not per-iteration `.cuda()` copies.
"""
from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


def fov2focal(fov: float, pixels: float) -> float:
    return pixels / (2 * math.tan(fov / 2))


def focal2fov(focal: float, pixels: float) -> float:
    return 2 * math.atan(pixels / (2 * focal))


def world_to_view(R: np.ndarray, t: np.ndarray,
                  translate=np.array([0.0, 0.0, 0.0]), scale=1.0) -> np.ndarray:
    """Row-vector world->view transform (getWorld2View2 composed with the
    .transpose(0,1) applied at scene/cameras.py:57)."""
    Rt = np.zeros((4, 4))
    Rt[:3, :3] = R.transpose()
    Rt[:3, 3] = t
    Rt[3, 3] = 1.0
    C2W = np.linalg.inv(Rt)
    cam_center = (C2W[:3, 3] + translate) * scale
    C2W[:3, 3] = cam_center
    Rt = np.linalg.inv(C2W)
    return Rt.T.astype(np.float32)  # row-vector convention


def projection_matrix(znear: float, zfar: float, fovx: float, fovy: float) -> np.ndarray:
    """Row-vector perspective projection (getProjectionMatrix then .T)."""
    tan_half_fovy = math.tan(fovy / 2)
    tan_half_fovx = math.tan(fovx / 2)
    top = tan_half_fovy * znear
    right = tan_half_fovx * znear
    P = np.zeros((4, 4), dtype=np.float32)
    z_sign = 1.0
    P[0, 0] = znear / right
    P[1, 1] = znear / top
    P[3, 2] = z_sign
    P[2, 2] = z_sign * zfar / (zfar - znear)
    P[2, 3] = -(zfar * znear) / (zfar - znear)
    return P.T  # row-vector convention


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class CameraParams:
    """Device-side camera parameters (a pytree — safe to pass into jit).

    All matrices use the row-vector convention described in the module doc.
    Width/height/fov are static metadata fields.
    """
    world_view: jnp.ndarray      # [4,4]
    full_proj: jnp.ndarray       # [4,4]
    camera_center: jnp.ndarray   # [3]
    tanfovx: jnp.ndarray         # scalar
    tanfovy: jnp.ndarray         # scalar
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))


@dataclasses.dataclass
class Camera:
    """Host-side camera with GT image; mirrors scene/cameras.py Camera."""
    uid: int
    colmap_id: int
    image_name: str
    R: np.ndarray               # [3,3] cam-to-world rotation (COLMAP style)
    T: np.ndarray               # [3] world-to-cam translation
    fovx: float
    fovy: float
    width: int
    height: int
    image: Optional[np.ndarray] = None        # [3,H,W] float32 in [0,1]
    alpha_mask: Optional[np.ndarray] = None   # [1,H,W] or None
    znear: float = 0.01
    zfar: float = 100.0
    trans: np.ndarray = dataclasses.field(default_factory=lambda: np.zeros(3))
    scale: float = 1.0

    def __post_init__(self):
        self.world_view = world_to_view(self.R, self.T, self.trans, self.scale)
        self.proj = projection_matrix(self.znear, self.zfar, self.fovx, self.fovy)
        self.full_proj = (self.world_view @ self.proj).astype(np.float32)
        self.camera_center = np.linalg.inv(self.world_view)[3, :3].astype(np.float32)

    @property
    def image_width(self) -> int:
        return self.width

    @property
    def image_height(self) -> int:
        return self.height

    def params(self) -> CameraParams:
        return CameraParams(
            world_view=jnp.asarray(self.world_view),
            full_proj=jnp.asarray(self.full_proj),
            camera_center=jnp.asarray(self.camera_center),
            tanfovx=jnp.asarray(math.tan(self.fovx * 0.5), jnp.float32),
            tanfovy=jnp.asarray(math.tan(self.fovy * 0.5), jnp.float32),
            width=self.width,
            height=self.height,
        )

    def c2w(self) -> np.ndarray:
        """Column-vector camera-to-world 4x4 (for trajectory/mesh utils)."""
        return np.linalg.inv(self.world_view.T)


class MiniCam:
    """Viewer-protocol camera (scene/cameras.py:61-73)."""

    def __init__(self, width, height, fovy, fovx, znear, zfar,
                 world_view_transform, full_proj_transform):
        self.width = int(width)
        self.height = int(height)
        self.image_width = int(width)
        self.image_height = int(height)
        self.fovx = fovx
        self.fovy = fovy
        self.znear = znear
        self.zfar = zfar
        self.world_view = np.asarray(world_view_transform, np.float32)
        self.full_proj = np.asarray(full_proj_transform, np.float32)
        self.camera_center = np.linalg.inv(self.world_view)[3, :3]

    def params(self) -> CameraParams:
        return CameraParams(
            world_view=jnp.asarray(self.world_view),
            full_proj=jnp.asarray(self.full_proj),
            camera_center=jnp.asarray(self.camera_center),
            tanfovx=jnp.asarray(math.tan(self.fovx * 0.5), jnp.float32),
            tanfovy=jnp.asarray(math.tan(self.fovy * 0.5), jnp.float32),
            width=self.width,
            height=self.height,
        )
