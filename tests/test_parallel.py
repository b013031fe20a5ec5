"""Multi-device sharding on the 8-way virtual CPU mesh."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussmart_tpu.cameras import Camera
from gaussmart_tpu.config import OptimizationParams
from gaussmart_tpu.models.gaussians import init_from_pcd
from gaussmart_tpu.optim import init_adam
from gaussmart_tpu.parallel.sharding import (BatchedCameras, make_dp_train_step,
                                             make_mesh, render_row_sharded)
from gaussmart_tpu.render import raster_common
from gaussmart_tpu.render.raster_dense import rasterize_pixels


def make_scene(rng, n=16, width=16, height=16):
    pts = np.stack([rng.uniform(-0.5, 0.5, n), rng.uniform(-0.5, 0.5, n),
                    rng.uniform(2.0, 4.0, n)], axis=1).astype(np.float32)
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=0, spatial_lr_scale=1.0, capacity=32)
    cams = []
    for i in range(8):
        ang = 0.05 * i
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"c{i}", R=R,
                           T=np.array([0.05 * i, 0.0, 0.0]), fovx=0.8,
                           fovy=0.8, width=width, height=height))
    return state, cams


def test_dp_step_runs_and_matches_singlechip_direction(rng):
    n_dev = len(jax.devices())
    assert n_dev == 8
    mesh = make_mesh()
    state, cams = make_scene(rng)
    adam = init_adam(state.params)
    opt = OptimizationParams()

    batched = BatchedCameras.stack([c.params() for c in cams])
    gts = jnp.stack([jnp.asarray(rng.random((3, 16, 16)), jnp.float32)
                     for _ in cams])

    step = make_dp_train_step(opt, mesh, sh_degree=0, white_background=False,
                              spatial_lr_scale=1.0)
    params, adam2, aux, metrics = step(
        state.params, adam, state.aux, batched, gts,
        jnp.asarray(1, jnp.int32))
    assert np.isfinite(float(metrics.total))
    # params moved
    assert float(jnp.abs(params.xyz - state.params.xyz).max()) > 0
    # densification stats accumulated over all 8 cameras
    denom = np.asarray(aux.denom)
    assert denom.max() > 1.0  # visible in multiple views


def test_row_sharded_render_matches_dense(rng):
    mesh = make_mesh()
    state, cams = make_scene(rng)
    cam = cams[0].params()
    prep = raster_common.preprocess(
        state.params.xyz, state.get_scaling, state.params.rotation,
        state.get_opacity[:, 0], state.get_features, state.aux.active,
        cam, sh_degree=0)
    means2d = jnp.zeros((state.capacity, 2))
    bg = jnp.zeros(3)

    ref = rasterize_pixels(prep, means2d, bg, 16, 16, chunk=8)
    out = render_row_sharded(mesh, prep, means2d, bg, 16, 16, chunk=8)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(out["allmap"]),
                               np.asarray(ref["allmap"]), atol=1e-5)
