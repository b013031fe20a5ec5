"""GaussianExtractor — render all views, fuse TSDF, extract meshes.

Parity with reference utils/mesh_utils.py:73-295: `reconstruction` caches
rgb + surf-depth maps per view, `extract_mesh_bounded` runs grid TSDF
fusion, `extract_mesh_unbounded` runs contraction-space fusion + blockwise
marching, `export_image` writes renders/gt/vis. TPU-first: each view's
render and each TSDF integration is a jitted XLA program; maps stay on
device until export.
"""
from __future__ import annotations

import os
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from gaussmart_tpu.cameras import Camera
from gaussmart_tpu.mesh.marching import marching_cubes_with_contraction
from gaussmart_tpu.mesh.meshing import TriMesh
from gaussmart_tpu.mesh.tsdf import TSDFVolume, contract, fuse_samples
from gaussmart_tpu.models.gaussians import GaussianState
from gaussmart_tpu.render.api import render
from gaussmart_tpu.trajectory import (estimate_bounding_sphere, save_img_f32,
                                      save_img_u8)


class GaussianExtractor:
    def __init__(self, state: GaussianState, bg_color=None,
                 depth_ratio: float = 0.0, backend: str = "auto",
                 mesh=None):
        self.state = state
        self.bg = jnp.asarray(bg_color if bg_color is not None else [0, 0, 0],
                              jnp.float32)
        self.depth_ratio = depth_ratio
        self.backend = backend
        self.mesh = mesh          # device mesh for *_sharded backends
        self.clean()

    def clean(self):
        self.rgbmaps: List[jnp.ndarray] = []
        self.depthmaps: List[jnp.ndarray] = []
        self.normalmaps: List[jnp.ndarray] = []
        self.viewpoint_stack: List[Camera] = []

    def reconstruction(self, viewpoint_stack: List[Camera]):
        self.clean()
        self.viewpoint_stack = list(viewpoint_stack)

        # Inference must never truncate (CUDA parity: the reference
        # duplicates into every touched tile). The needed duplicate budget
        # is scene-dependent — late-training splats can cover hundreds of
        # tiles — so escalate until the kernel reports zero dropped
        # duplicates (each level is one cached recompile; the budget is
        # monotone across frames).
        budget = [64, 12]

        def make_fn(b):
            return jax.jit(lambda cam: render(
                cam, self.state, self.bg, depth_ratio=self.depth_ratio,
                backend=self.backend, mesh=self.mesh,
                raster_budget=(b[0], b[1])))

        render_fn = make_fn(budget)
        for cam in self.viewpoint_stack:
            pkg = render_fn(cam.params())
            while int(pkg["n_dropped"]) > 0 and budget[0] < 512:
                budget[0] = min(budget[0] * 2, 512)
                budget[1] = min(budget[1] * 2, 64)
                print(f"[extract] duplicate budget -> {tuple(budget)} "
                      f"(dropped {int(pkg['n_dropped'])})")
                render_fn = make_fn(budget)
                pkg = render_fn(cam.params())
            self.rgbmaps.append(pkg["render"])
            self.depthmaps.append(pkg["surf_depth"])
            # unit-normalized render normal (reference mesh_utils.py:110 —
            # cached there but its save/video path is commented out; we
            # keep the stream live for the normal trajectory video)
            n = pkg["rend_normal"]
            n = n / jnp.maximum(jnp.linalg.norm(n, axis=0, keepdims=True),
                                1e-9)
            self.normalmaps.append(n)
        self.center, self.radius = estimate_bounding_sphere(self.viewpoint_stack)
        print(f"The estimated bounding radius is {self.radius:.2f}")
        print(f"Use at least {2.0 * self.radius:.2f} for depth_trunc")

    def _observed_bounds(self, depth_trunc: float, sdf_trunc: float,
                         mask_background: bool):
        """Bounding box of the OBSERVED surface (valid rendered depth
        unprojected to world), padded by the truncation band. The reference
        ScalableTSDFVolume is unbounded — it integrates anything within
        depth_trunc of any CAMERA, which can lie well outside
        center ± depth_trunc (e.g. floors running behind a camera ring) —
        so a dense grid must be sized to the content, not the center."""
        from gaussmart_tpu.ops.depth_normal import depths_to_points

        lo = np.full(3, np.inf)
        hi = np.full(3, -np.inf)
        for cam, depth in zip(self.viewpoint_stack, self.depthmaps):
            d = depth[0]
            if mask_background and cam.alpha_mask is not None:
                d = jnp.where(jnp.asarray(cam.alpha_mask[0]) < 0.5, 0.0, d)
            valid = ((d > 0) & (d <= depth_trunc)).reshape(-1)
            pts = depths_to_points(cam.params(), d[None])
            big = jnp.where(valid[:, None], pts, -jnp.inf).max(axis=0)
            small = jnp.where(valid[:, None], pts, jnp.inf).min(axis=0)
            lo = np.minimum(lo, np.asarray(small))
            hi = np.maximum(hi, np.asarray(big))
        if not np.all(np.isfinite(lo)) or not np.all(np.isfinite(hi)):
            return self.center - depth_trunc, self.center + depth_trunc
        pad = 3.0 * sdf_trunc
        return lo - pad, hi + pad

    def extract_mesh_bounded(self, voxel_size=0.004, sdf_trunc=0.02,
                             depth_trunc=3.0, mask_background=True) -> TriMesh:
        print("Running tsdf volume integration ...")
        print(f"voxel_size: {voxel_size}\nsdf_trunc: {sdf_trunc}\n"
              f"depth_trunc: {depth_trunc}")
        lo, hi = self._observed_bounds(depth_trunc, sdf_trunc,
                                       mask_background)
        vol = TSDFVolume(lo, hi, voxel_size, sdf_trunc)
        for cam, rgb, depth in zip(self.viewpoint_stack, self.rgbmaps,
                                   self.depthmaps):
            d = depth[0]
            if mask_background and cam.alpha_mask is not None:
                d = jnp.where(jnp.asarray(cam.alpha_mask[0]) < 0.5, 0.0, d)
            vol.integrate(d, jnp.clip(rgb, 0, 1), cam.params(), depth_trunc)
        return vol.extract_mesh()

    def extract_mesh_unbounded(self, resolution: int = 1024) -> TriMesh:
        depths = jnp.stack([d[0] for d in self.depthmaps])
        rgbs = jnp.stack([jnp.clip(r, 0, 1) for r in self.rgbmaps])
        projs = jnp.stack([jnp.asarray(c.full_proj)
                           for c in self.viewpoint_stack])
        center = np.asarray(self.center, np.float32)
        radius = float(self.radius)
        voxel_size = radius * 2 / resolution
        print(f"Computing sdf grid resolution {resolution}^3, "
              f"voxel_size {voxel_size}")

        def sdf_fn(pts_contracted: np.ndarray) -> np.ndarray:
            tsdf, _ = fuse_samples(pts_contracted, depths, rgbs, projs,
                                   voxel_size, center, radius, adaptive=True)
            return tsdf

        # bounding radius in contracted space from the splats' 95th pct
        xyz = np.asarray(self.state.params.xyz)[np.asarray(self.state.aux.active)]
        normed = (xyz - center) / radius
        Rq = np.asarray(jnp.linalg.norm(contract(jnp.asarray(normed)), axis=-1))
        R = min(float(np.quantile(Rq, 0.95)) + 0.01, 1.9)

        from gaussmart_tpu.mesh.tsdf import uncontract

        def inv_contraction(v):
            return np.asarray(uncontract(jnp.asarray(v, jnp.float32))) * radius + center

        block = 128 if resolution % 128 == 0 else 64
        mesh = marching_cubes_with_contraction(
            sdf=sdf_fn, resolution=resolution,
            bounding_box_min=(-R, -R, -R), bounding_box_max=(R, R, R),
            level=0.0, inv_contraction=inv_contraction, block=block)

        if len(mesh.vertices):
            print("texturing mesh ...")
            _, rgbv = fuse_samples(mesh.vertices.astype(np.float32), depths,
                                   rgbs, projs, voxel_size, center, radius,
                                   adaptive=False)
            mesh.vertex_colors = rgbv
        return mesh

    def export_image(self, path: str):
        render_path = os.path.join(path, "renders")
        gts_path = os.path.join(path, "gt")
        vis_path = os.path.join(path, "vis")
        for p in (render_path, gts_path, vis_path):
            os.makedirs(p, exist_ok=True)
        for idx, cam in enumerate(self.viewpoint_stack):
            if cam.image is not None:
                save_img_u8(np.transpose(cam.image, (1, 2, 0)),
                            os.path.join(gts_path, f"{idx:05d}.png"))
            save_img_u8(np.transpose(np.asarray(self.rgbmaps[idx]), (1, 2, 0)),
                        os.path.join(render_path, f"{idx:05d}.png"))
            save_img_f32(np.asarray(self.depthmaps[idx][0]),
                         os.path.join(vis_path, f"depth_{idx:05d}.tiff"))
            save_img_u8(np.transpose(np.asarray(self.normalmaps[idx]),
                                     (1, 2, 0)) * 0.5 + 0.5,
                        os.path.join(vis_path, f"normal_{idx:05d}.png"))
