"""Depth map -> world points -> pseudo surface normals.

Behavior parity with reference utils/point_utils.py:9-37 (ray-grid
unprojection, central-difference cross-product normals, zero border). Pure
jnp so it differentiates through the normal-consistency regularizer.
"""
from __future__ import annotations

import jax.numpy as jnp

from gaussmart_tpu.cameras import CameraParams
from gaussmart_tpu.transforms import safe_normalize


def _c2w_and_intrins(cam: CameraParams):
    W, H = cam.width, cam.height
    c2w = jnp.linalg.inv(cam.world_view.T)      # column-vector cam-to-world
    ndc2pix = jnp.array([
        [W / 2.0, 0.0, 0.0, W / 2.0],
        [0.0, H / 2.0, 0.0, H / 2.0],
        [0.0, 0.0, 0.0, 1.0]], jnp.float32).T    # [4,3]
    projection = c2w.T @ cam.full_proj           # == pure projection matrix
    intrins = (projection @ ndc2pix)[:3, :3].T
    return c2w, intrins


def depths_to_points(cam: CameraParams, depthmap: jnp.ndarray) -> jnp.ndarray:
    """[1,H,W] depth -> [H*W, 3] world points along pixel rays."""
    W, H = cam.width, cam.height
    c2w, intrins = _c2w_and_intrins(cam)
    grid_x, grid_y = jnp.meshgrid(jnp.arange(W, dtype=jnp.float32),
                                  jnp.arange(H, dtype=jnp.float32), indexing="xy")
    points = jnp.stack([grid_x, grid_y, jnp.ones_like(grid_x)], axis=-1).reshape(-1, 3)
    rays_d = points @ jnp.linalg.inv(intrins).T @ c2w[:3, :3].T
    rays_o = c2w[:3, 3]
    return depthmap.reshape(-1, 1) * rays_d + rays_o


def depth_to_normal(cam: CameraParams, depth: jnp.ndarray) -> jnp.ndarray:
    """[1,H,W] depth -> [H,W,3] normals (zero at the 1px border)."""
    H, W = depth.shape[1], depth.shape[2]
    points = depths_to_points(cam, depth).reshape(H, W, 3)
    dx = points[2:, 1:-1] - points[:-2, 1:-1]
    dy = points[1:-1, 2:] - points[1:-1, :-2]
    n = safe_normalize(jnp.cross(dx, dy))
    out = jnp.zeros_like(points)
    return out.at[1:-1, 1:-1].set(n)
