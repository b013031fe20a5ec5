"""End-to-end smoke: the jitted train step fits a synthetic scene.

Mirror of the reference's only correctness signal (in-loop eval PSNR,
SURVEY.md §4): render a ground-truth image from known splats, perturb them,
and verify optimization recovers image quality.
"""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gaussmart_tpu.cameras import Camera
from gaussmart_tpu.config import OptimizationParams
from gaussmart_tpu.models.gaussians import init_from_pcd
from gaussmart_tpu.optim import init_adam
from gaussmart_tpu.render.api import render
from gaussmart_tpu.train_lib import make_train_step
import pytest

pytestmark = pytest.mark.slow  # full training driver runs — run via the full suite



def make_cameras(n_cams=4, width=24, height=24):
    cams = []
    for i in range(n_cams):
        ang = 2 * np.pi * i / n_cams * 0.12
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        T = np.array([0.2 * i - 0.3, 0.0, 0.0])
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"c{i}", R=R, T=T,
                           fovx=0.9, fovy=0.9, width=width, height=height))
    return cams


def test_train_step_improves_psnr(rng):
    n = 24
    pts = np.stack([rng.uniform(-0.8, 0.8, n), rng.uniform(-0.8, 0.8, n),
                    rng.uniform(2.5, 4.0, n)], axis=1).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)

    gt_state = init_from_pcd(pts, cols, None, max_sh_degree=0,
                             spatial_lr_scale=1.0, capacity=64)
    # make the GT splats chunky and opaque
    gt_state = gt_state.replace(params=dataclasses.replace(
        gt_state.params,
        scaling=gt_state.params.scaling.at[:n].set(np.log(0.25)),
        opacity=gt_state.params.opacity.at[:n].set(2.0)))

    cams = make_cameras()
    bg = jnp.zeros(3)
    gts = [render(c.params(), gt_state, bg)["render"] for c in cams]

    # perturbed init: jittered positions, gray colors
    pts2 = pts + rng.normal(scale=0.1, size=pts.shape).astype(np.float32)
    state = init_from_pcd(pts2, np.full_like(cols, 0.5), None, max_sh_degree=0,
                          spatial_lr_scale=1.0, capacity=64)
    state = state.replace(params=dataclasses.replace(
        state.params,
        scaling=state.params.scaling.at[:n].set(np.log(0.25)),
        opacity=state.params.opacity.at[:n].set(1.0)))

    opt = OptimizationParams(position_lr_init=0.002, position_lr_final=0.0002,
                             position_lr_max_steps=400)
    step = make_train_step(opt, sh_degree=0, white_background=False,
                           spatial_lr_scale=1.0, donate=False)

    params, adam, aux = state.params, init_adam(state.params), state.aux
    psnr_first = None
    for it in range(1, 201):
        cam = cams[it % len(cams)]
        params, adam, aux, metrics, _ = step(
            params, adam, aux, cam.params(), gts[it % len(cams)],
            jnp.asarray(it, jnp.int32))
        if psnr_first is None:
            psnr_first = float(metrics.psnr)
    psnr_last = float(metrics.psnr)
    assert np.isfinite(psnr_last)
    assert psnr_last > psnr_first + 3.0, (psnr_first, psnr_last)
    assert psnr_last > 20.0, psnr_last


def test_metrics_are_finite(rng):
    n = 8
    pts = rng.normal(size=(n, 3)).astype(np.float32) + np.array([0, 0, 3])
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=0, spatial_lr_scale=1.0, capacity=32)
    cam = make_cameras(1)[0]
    opt = OptimizationParams()
    step = make_train_step(opt, sh_degree=0, white_background=True,
                           spatial_lr_scale=1.0, donate=False)
    gt = jnp.ones((3, cam.height, cam.width)) * 0.5
    params, adam, aux, metrics, _ = step(
        state.params, init_adam(state.params), state.aux, cam.params(), gt,
        jnp.asarray(1, jnp.int32))
    for v in metrics:
        assert np.isfinite(np.asarray(v)).all()


def test_adam_on_densify_drop_skips_update(rng):
    """`adam_on_densify="drop"` leaves params/adam untouched exactly on
    densify-schedule iterations (reference quirk, COMPONENTS.md #3)."""
    n = 8
    pts = rng.normal(size=(n, 3)).astype(np.float32) + np.array([0, 0, 3])
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=0, spatial_lr_scale=1.0, capacity=32)
    cam = make_cameras(1)[0]
    opt = OptimizationParams(densify_from_iter=50, densify_until_iter=1000,
                             densification_interval=100)
    step = make_train_step(opt, sh_degree=0, white_background=False,
                           spatial_lr_scale=1.0, donate=False,
                           adam_on_densify="drop")
    gt = jnp.ones((3, cam.height, cam.width)) * 0.5
    params, adam, aux = state.params, init_adam(state.params), state.aux

    # densify iteration: 100 % 100 == 0 and 50 < 100 < 1000 -> no update
    p1, a1, _, _, _ = step(params, adam, aux, cam.params(), gt,
                           jnp.asarray(100, jnp.int32))
    assert np.allclose(np.asarray(p1.xyz), np.asarray(params.xyz))
    assert int(a1.step) == int(adam.step)

    # ordinary iteration -> update applies
    p2, a2, _, _, _ = step(params, adam, aux, cam.params(), gt,
                           jnp.asarray(101, jnp.int32))
    assert not np.allclose(np.asarray(p2.xyz), np.asarray(params.xyz))
    assert int(a2.step) == int(adam.step) + 1
