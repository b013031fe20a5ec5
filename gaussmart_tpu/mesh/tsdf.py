"""TSDF fusion on TPU.

Two modes, mirroring the reference's meshing paths (utils/mesh_utils.py):

 * **Bounded grid fusion** (`TSDFVolume`): projective TSDF over a uniform
   voxel grid — the open3d `ScalableTSDFVolume.integrate` capability
   (mesh_utils.py:140-181) rebuilt as a jitted jnp update: every frame is
   one fused XLA program (project all voxels, bilinear-sample depth/color,
   truncate, weighted running mean). The grid is dense (bounds from the
   camera bounding sphere) — HBM-resident, no host transfers per frame.

 * **Sample-based unbounded fusion** (`fuse_samples`): evaluate the fused
   TSDF at arbitrary query points with Mip-NeRF-360 contraction-adaptive
   truncation (mesh_utils.py:184-279), used by the blockwise marching pass.
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from gaussmart_tpu.cameras import CameraParams


def _project(points: jnp.ndarray, full_proj: jnp.ndarray):
    """Row-vector NDC projection: returns (ndc_xy [N,2], z_view [N])."""
    h = jnp.concatenate([points, jnp.ones_like(points[:, :1])], axis=1)
    clip = h @ full_proj
    z = clip[:, 3]
    ndc = clip[:, :2] / jnp.where(jnp.abs(z) < 1e-9, 1e-9, z)[:, None]
    return ndc, z


def _bilinear(img: jnp.ndarray, ndc: jnp.ndarray):
    """Sample [C,H,W] at NDC coords (align_corners=True, border padding)."""
    C, H, W = img.shape
    x = (ndc[:, 0] * 0.5 + 0.5) * (W - 1)
    y = (ndc[:, 1] * 0.5 + 0.5) * (H - 1)
    x = jnp.clip(x, 0, W - 1)
    y = jnp.clip(y, 0, H - 1)
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    fx = x - x0
    fy = y - y0
    v00 = img[:, y0, x0]
    v01 = img[:, y0, x0 + 1]
    v10 = img[:, y0 + 1, x0]
    v11 = img[:, y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy)
            + v10 * (1 - fx) * fy + v11 * fx * fy)


CHUNK = 16_777_216  # voxels per inner step; bounds transient memory


@functools.partial(jax.jit, donate_argnums=(0, 1, 2), static_argnums=(3,))
def _integrate_grid(tsdf, weight, color, dims, origin, voxel_size, depth,
                    rgb, full_proj, sdf_trunc, depth_trunc):
    """One frame of projective TSDF integration over flattened voxels.

    Voxel world coordinates are generated from the flat index inside the
    program (ix,iy,iz de-interleave + affine) instead of being passed as a
    persistent [N,3] array: at DTU-recipe resolutions (~420M voxels,
    reference scripts/dtu_eval_mesh.py:32) the coordinate array alone is
    5 GB of HBM + a >10 GB host meshgrid, which previously forced the
    voxel-size cap long before the TSDF/weight/color state itself did.
    The grid is processed in CHUNK-sized slices via lax.map so the
    transient working set stays bounded while the persistent state
    (tsdf/weight/color, 20 B/voxel) can fill most of HBM."""
    n = tsdf.shape[0]                    # padded to a multiple of CHUNK
    dy, dz = dims[1], dims[2]
    n_chunks = n // CHUNK if n % CHUNK == 0 else -(-n // CHUNK)

    def body(args):
        t, w, col, base = args
        idx = base * CHUNK + jnp.arange(t.shape[0], dtype=jnp.int32)
        iz = idx % dz
        iy = (idx // dz) % dy
        ix = idx // (dz * dy)
        points = (jnp.stack([ix, iy, iz], axis=1).astype(jnp.float32)
                  * voxel_size + origin[None, :])
        ndc, z = _project(points, full_proj)
        in_img = (jnp.abs(ndc) < 1.0).all(axis=1) & (z > 0)
        d = _bilinear(depth[None], ndc)[0]
        c = _bilinear(rgb, ndc).T                              # [M,3]
        valid_d = (d > 0) & (d <= depth_trunc)
        sdf = d - z
        upd = in_img & valid_d & (sdf > -sdf_trunc)
        sdf = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
        w_new = w + upd
        safe = jnp.maximum(w_new, 1.0)
        t = jnp.where(upd, (t * w + sdf) / safe, t)
        col = jnp.where(upd[:, None], (col * w[:, None] + c) / safe[:, None],
                        col)
        return t, w_new, col

    if n_chunks <= 1:
        t, w, col = body((tsdf, weight, color, jnp.int32(0)))
        return t, w, col
    # n is padded to n_chunks*CHUNK at init, so these reshapes are free
    # (no copy of the donated multi-GB state)
    t, w, col = jax.lax.map(
        lambda a: body((a[0], a[1], a[2], a[3])),
        (tsdf.reshape(n_chunks, CHUNK), weight.reshape(n_chunks, CHUNK),
         color.reshape(n_chunks, CHUNK, 3),
         jnp.arange(n_chunks, dtype=jnp.int32)))
    return t.reshape(n), w.reshape(n), col.reshape(n, 3)


class TSDFVolume:
    """Dense bounded TSDF grid."""

    def __init__(self, bounds_min, bounds_max, voxel_size: float,
                 sdf_trunc: float, max_voxels: int = 420_000_000):
        self.voxel_size = float(voxel_size)
        self.sdf_trunc = float(sdf_trunc)
        self.origin = np.asarray(bounds_min, np.float64)
        dims = np.ceil((np.asarray(bounds_max) - self.origin)
                       / voxel_size).astype(int) + 1
        if int(np.prod(dims)) > max_voxels:
            scale = (np.prod(dims) / max_voxels) ** (1 / 3)
            self.voxel_size *= float(scale)
            dims = np.ceil((np.asarray(bounds_max) - self.origin)
                           / self.voxel_size).astype(int) + 1
            print(f"[tsdf] grid capped: voxel_size -> {self.voxel_size:.5f}")
        self.dims = tuple(int(d) for d in dims)
        n = int(np.prod(self.dims))
        self._n = n
        # pad the flat state to a CHUNK multiple so the chunked integrate
        # can reshape in place (padding voxels compute garbage and are
        # sliced off at extraction)
        n_pad = n if n <= CHUNK else -(-n // CHUNK) * CHUNK
        self.tsdf = jnp.ones(n_pad, jnp.float32)
        self.weight = jnp.zeros(n_pad, jnp.float32)
        self.color = jnp.zeros((n_pad, 3), jnp.float32)

    def integrate(self, depth: jnp.ndarray, rgb: jnp.ndarray,
                  cam: CameraParams, depth_trunc: float):
        self.tsdf, self.weight, self.color = _integrate_grid(
            self.tsdf, self.weight, self.color, self.dims,
            jnp.asarray(self.origin, jnp.float32),
            jnp.float32(self.voxel_size),
            jnp.asarray(depth), jnp.asarray(rgb),
            jnp.asarray(cam.full_proj),
            jnp.float32(self.sdf_trunc), jnp.float32(depth_trunc))

    def extract_mesh(self):
        from gaussmart_tpu.mesh.marching import marching_tetrahedra
        from gaussmart_tpu.mesh.meshing import TriMesh

        vol = np.asarray(self.tsdf[:self._n]).reshape(self.dims)
        w = np.asarray(self.weight[:self._n]).reshape(self.dims)
        # Unobserved voxels must not generate surface (open3d skips them):
        # mark NaN; marching drops any triangle touching a NaN corner.
        vol = np.where(w > 0, vol, np.nan)
        v, f = marching_tetrahedra(vol.astype(np.float64), level=0.0,
                                   spacing=(self.voxel_size,) * 3,
                                   origin=self.origin)
        mesh = TriMesh(v, f).merge_vertices(digits=6)
        if len(mesh.vertices):
            mesh.vertex_colors = np.asarray(self.sample_colors(mesh.vertices))
        return mesh

    def sample_colors(self, verts: np.ndarray) -> np.ndarray:
        """Trilinear color lookup at world positions."""
        g = (np.asarray(verts) - self.origin) / self.voxel_size
        g = np.clip(g, 0, np.array(self.dims) - 1.001)
        i0 = np.floor(g).astype(int)
        fr = g - i0
        col = np.asarray(self.color[:self._n]).reshape(self.dims + (3,))
        out = np.zeros((len(g), 3))
        for dx in (0, 1):
            for dy in (0, 1):
                for dz in (0, 1):
                    wgt = ((fr[:, 0] if dx else 1 - fr[:, 0])
                           * (fr[:, 1] if dy else 1 - fr[:, 1])
                           * (fr[:, 2] if dz else 1 - fr[:, 2]))
                    out += wgt[:, None] * col[i0[:, 0] + dx, i0[:, 1] + dy,
                                              i0[:, 2] + dz]
        return out


# ---------------------------------------------------------------------------
# unbounded (contraction) fusion at query samples
# ---------------------------------------------------------------------------

def contract(x):
    mag = jnp.linalg.norm(x, axis=-1, keepdims=True)
    return jnp.where(mag < 1, x, (2 - 1 / jnp.maximum(mag, 1e-9)) * (x / jnp.maximum(mag, 1e-9)))


def uncontract(y):
    mag = jnp.linalg.norm(y, axis=-1, keepdims=True)
    return jnp.where(mag < 1, y, y / jnp.maximum(mag, 1e-9) / jnp.maximum(2 - mag, 1e-2))


@functools.partial(jax.jit, static_argnames=("adaptive",))
def _fuse_batch(samples, depths, rgbs, full_projs, voxel_size, center, radius,
                adaptive: bool):
    """Fuse all frames at the given contracted-space samples
    (mesh_utils.py:195-243 semantics: running weighted mean starting at
    tsdf=1, weight=1)."""
    if adaptive:
        mag = jnp.linalg.norm(samples, axis=-1)
        sdf_trunc = 5 * voxel_size * jnp.ones_like(mag)
        sdf_trunc = jnp.where(
            mag > 1, sdf_trunc / (2 - jnp.clip(mag, None, 1.9)), sdf_trunc)
        world = uncontract(samples) * radius + center
    else:
        sdf_trunc = 5 * voxel_size * jnp.ones(samples.shape[0])
        world = samples

    def body(carry, frame):
        tsdf, rgb_acc, weight = carry
        depth, rgb, fp = frame
        ndc, z = _project(world, fp)
        mask_proj = (jnp.abs(ndc) < 1.0).all(axis=1) & (z > 0)
        d = _bilinear(depth[None], ndc)[0]
        c = _bilinear(rgb, ndc).T
        sdf = d - z
        mask = mask_proj & (sdf > -sdf_trunc)
        sdf = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
        wp = weight + 1.0
        tsdf = jnp.where(mask, (tsdf * weight + sdf) / wp, tsdf)
        rgb_acc = jnp.where(mask[:, None],
                            (rgb_acc * weight[:, None] + c) / wp[:, None],
                            rgb_acc)
        weight = jnp.where(mask, wp, weight)
        return (tsdf, rgb_acc, weight), None

    n = samples.shape[0]
    init = (jnp.ones(n, jnp.float32), jnp.zeros((n, 3), jnp.float32),
            jnp.ones(n, jnp.float32))
    (tsdf, rgb_acc, _), _ = jax.lax.scan(body, init,
                                         (depths, rgbs, full_projs))
    return tsdf, rgb_acc


def fuse_samples(samples: np.ndarray, depths: jnp.ndarray, rgbs: jnp.ndarray,
                 full_projs: jnp.ndarray, voxel_size: float,
                 center: np.ndarray, radius: float,
                 adaptive: bool = True) -> Tuple[np.ndarray, np.ndarray]:
    tsdf, rgb = _fuse_batch(
        jnp.asarray(samples, jnp.float32), depths, rgbs, full_projs,
        jnp.float32(voxel_size), jnp.asarray(center, jnp.float32),
        jnp.float32(radius), adaptive)
    return np.asarray(tsdf), np.asarray(rgb)
