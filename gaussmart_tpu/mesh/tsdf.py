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
import os
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


def _nearest(img: jnp.ndarray, ndc: jnp.ndarray):
    """Sample [C,H,W] at NDC coords, nearest pixel (open3d parity: depth
    must NOT be bilinearly blended — interpolating across a mask/silhouette
    boundary manufactures phantom depths like d/2 that pass the d>0 test
    and float spurious geometry in front of the surface)."""
    C, H, W = img.shape
    x = jnp.clip(jnp.round((ndc[:, 0] * 0.5 + 0.5) * (W - 1)).astype(
        jnp.int32), 0, W - 1)
    y = jnp.clip(jnp.round((ndc[:, 1] * 0.5 + 0.5) * (H - 1)).astype(
        jnp.int32), 0, H - 1)
    return img[:, y, x]


CHUNK = 8_388_608   # voxels per inner step; bounds transient memory


@functools.partial(jax.jit, donate_argnums=(0, 1, 2))
def _integrate_chunk(tsdf, weight, color, base, dydz, origin, voxel_size,
                     depth, rgb, full_proj, sdf_trunc, depth_trunc):
    """One frame of projective TSDF integration over one chunk of voxels.

    Voxel world coordinates are generated from the flat index inside the
    program (ix,iy,iz de-interleave + affine) instead of being passed as a
    persistent [N,3] array: at DTU-recipe resolutions (~420M voxels,
    reference scripts/dtu_eval_mesh.py:32) the coordinate array alone is
    5 GB of HBM + a >10 GB host meshgrid. The grid state lives as
    independent per-chunk device arrays; each call donates its chunk, so
    the update is in place and the transient working set is one chunk —
    a single whole-grid program would double the multi-GB state through
    the output buffers and OOM HBM."""
    idx = base + jnp.arange(tsdf.shape[0], dtype=jnp.int32)
    dy, dz = dydz
    iz = idx % dz
    iy = (idx // dz) % dy
    ix = idx // (dz * dy)
    points = (jnp.stack([ix, iy, iz], axis=1).astype(jnp.float32)
              * voxel_size + origin[None, :])
    ndc, z = _project(points, full_proj)
    in_img = (jnp.abs(ndc) < 1.0).all(axis=1) & (z > 0)
    d = _nearest(depth[None], ndc)[0]
    c = _nearest(rgb, ndc).T                                   # [M,3]
    valid_d = (d > 0) & (d <= depth_trunc)
    sdf = d - z
    upd = in_img & valid_d & (sdf > -sdf_trunc)
    sdf = jnp.clip(sdf / sdf_trunc, -1.0, 1.0)
    w_new = weight + upd
    safe = jnp.maximum(w_new, 1.0)
    tsdf = jnp.where(upd, (tsdf * weight + sdf) / safe, tsdf)
    color = jnp.where(upd[:, None],
                      (color * weight[:, None] + c) / safe[:, None], color)
    return tsdf, w_new, color


@jax.jit
def _quantize_chunk(tsdf, weight):
    """int8 wire format for the device->host grid pull: sdf in [-1,1]
    quantized to 1/127 (≪ the marching interpolation tolerance), -128 =
    unobserved. 1 B/voxel instead of 8 — the tunnel-bandwidth-bound step."""
    q = jnp.round(jnp.clip(tsdf, -1.0, 1.0) * 127.0).astype(jnp.int8)
    return jnp.where(weight > 0, q, jnp.int8(-128))


class TSDFVolume:
    """Dense bounded TSDF grid."""

    def __init__(self, bounds_min, bounds_max, voxel_size: float,
                 sdf_trunc: float, max_voxels: int = None):
        if max_voxels is None:
            # grid state is 20 B/voxel (tsdf+weight+rgb f32); 200M ≈ 4 GB,
            # which coexists with the scene/render buffers on a 16 GB v5e.
            # Bigger chips (v5p: 95 GB) can raise this — up to the int32
            # flat-index ceiling (voxel coordinates are de-interleaved from
            # a 32-bit flat index inside the integration program).
            max_voxels = int(os.environ.get("GAUSSMART_TSDF_MAX_VOXELS",
                                            200_000_000))
        max_voxels = min(max_voxels, 2**31 - CHUNK)
        self.voxel_size = float(voxel_size)
        self.sdf_trunc = float(sdf_trunc)
        self.origin = np.asarray(bounds_min, np.float64)
        dims = np.ceil((np.asarray(bounds_max) - self.origin)
                       / voxel_size).astype(int) + 1
        if int(np.prod(dims)) > max_voxels:
            scale = (np.prod(dims) / max_voxels) ** (1 / 3)
            self.voxel_size *= float(scale)
            # keep the truncation band the caller asked for in VOXELS
            # (callers compute sdf_trunc = k*voxel_size; a fixed band over
            # coarser voxels thins below one voxel and punches holes)
            self.sdf_trunc *= float(scale)
            dims = np.ceil((np.asarray(bounds_max) - self.origin)
                           / self.voxel_size).astype(int) + 1
            print(f"[tsdf] grid capped: voxel_size -> {self.voxel_size:.5f} "
                  f"(sdf_trunc scaled with it -> {self.sdf_trunc:.5f})")
        self.dims = tuple(int(d) for d in dims)
        n = int(np.prod(self.dims))
        self._n = n
        # state is a list of independent per-chunk device arrays so each
        # frame's update donates in place (one big array would need a
        # second multi-GB output buffer)
        self._chunks = [min(CHUNK, n - b) for b in range(0, n, CHUNK)]
        self.tsdf = [jnp.ones(c, jnp.float32) for c in self._chunks]
        self.weight = [jnp.zeros(c, jnp.float32) for c in self._chunks]
        self.color = [jnp.zeros((c, 3), jnp.float32) for c in self._chunks]

    def integrate(self, depth: jnp.ndarray, rgb: jnp.ndarray,
                  cam: CameraParams, depth_trunc: float):
        depth = jnp.asarray(depth)
        rgb = jnp.asarray(rgb)
        proj = jnp.asarray(cam.full_proj)
        origin = jnp.asarray(self.origin, jnp.float32)
        base = 0
        for i, c in enumerate(self._chunks):
            self.tsdf[i], self.weight[i], self.color[i] = _integrate_chunk(
                self.tsdf[i], self.weight[i], self.color[i],
                jnp.int32(base), (self.dims[1], self.dims[2]), origin,
                jnp.float32(self.voxel_size), depth, rgb, proj,
                jnp.float32(self.sdf_trunc), jnp.float32(depth_trunc))
            base += c

    def extract_mesh(self):
        from gaussmart_tpu.mesh.marching import marching_tetrahedra
        from gaussmart_tpu.mesh.meshing import TriMesh

        # pull the grid as int8 (1 B/voxel): over a slow host link this
        # transfer dominates extraction, and marching only needs ~2 decimal
        # digits of the normalized sdf
        q = np.concatenate([np.asarray(_quantize_chunk(t, w))
                            for t, w in zip(self.tsdf, self.weight)])
        q = q.reshape(self.dims)
        # Unobserved voxels must not generate surface (open3d skips them):
        # mark NaN; marching drops any TET touching a NaN corner. float32
        # throughout: at the 200M-voxel cap a float64 grid is a 1.6 GB
        # transient that the native path would immediately re-copy to f32.
        vol = np.where(q == np.int8(-128), np.float32(np.nan),
                       q.astype(np.float32) / np.float32(127.0))
        v, f = marching_tetrahedra(vol, level=0.0,
                                   spacing=(self.voxel_size,) * 3,
                                   origin=self.origin)
        mesh = TriMesh(v, f).merge_vertices(digits=6)
        if len(mesh.vertices):
            mesh.vertex_colors = np.asarray(self.sample_colors(mesh.vertices))
        return mesh

    def sample_colors(self, verts: np.ndarray) -> np.ndarray:
        """Trilinear color lookup at world positions.

        Gathers happen on device per chunk-plane so only per-vertex colors
        cross the host link (the full color grid is 12 B/voxel)."""
        g = (np.asarray(verts) - self.origin) / self.voxel_size
        g = np.clip(g, 0, np.array(self.dims) - 1.001)
        i0 = np.floor(g).astype(np.int64)
        fr = (g - i0).astype(np.float32)
        out = np.zeros((len(g), 3), np.float32)
        dy, dz = self.dims[1], self.dims[2]
        flat = (i0[:, 0] * dy + i0[:, 1]) * dz + i0[:, 2]
        offs = {(dx, dyy, dzz): (dx * dy + dyy) * dz + dzz
                for dx in (0, 1) for dyy in (0, 1) for dzz in (0, 1)}
        base = 0
        for i, c in enumerate(self._chunks):
            col = self.color[i]
            for (dx, dyy, dzz), off in offs.items():
                tgt = flat + off
                sel = (tgt >= base) & (tgt < base + c)
                if not sel.any():
                    continue
                local = jnp.asarray(tgt[sel] - base, jnp.int32)
                vals = np.asarray(col[local])
                wgt = ((fr[sel, 0] if dx else 1 - fr[sel, 0])
                       * (fr[sel, 1] if dyy else 1 - fr[sel, 1])
                       * (fr[sel, 2] if dzz else 1 - fr[sel, 2]))
                out[sel] += wgt[:, None] * vals
            base += c
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
