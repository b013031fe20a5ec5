"""Multi-device sharding on the 8-way virtual CPU mesh."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # 8-device virtual mesh + jitted sharded steps — run via the full suite


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
    params, adam2, aux, metrics, it2 = step(
        state.params, adam, state.aux, batched, gts,
        jnp.asarray(1, jnp.int32))
    assert np.isfinite(float(metrics.total))
    assert int(it2) == 2
    # params moved
    assert float(jnp.abs(params.xyz - state.params.xyz).max()) > 0
    # densification stats accumulated over all 8 cameras
    denom = np.asarray(aux.denom)
    assert denom.max() > 1.0  # visible in multiple views


def test_dp_step_pallas_backend_matches_dense(rng):
    """The production Pallas kernel under shard_map (interpret on CPU):
    one DP step with backend='pallas' must match backend='dense'."""
    mesh = make_mesh()
    state, cams = make_scene(rng, n=24, width=32, height=32)
    adam = init_adam(state.params)
    opt = OptimizationParams()

    batched = BatchedCameras.stack([c.params() for c in cams])
    gts = jnp.stack([jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
                     for _ in cams])
    it0 = jnp.asarray(1, jnp.int32)

    outs = {}
    for backend in ("dense", "pallas"):
        step = make_dp_train_step(opt, mesh, sh_degree=0,
                                  white_background=False,
                                  spatial_lr_scale=1.0, backend=backend)
        outs[backend] = step(state.params, adam, state.aux, batched, gts, it0)

    pd, pp = outs["dense"][0], outs["pallas"][0]
    for name in ("xyz", "scaling", "rotation", "opacity", "features_dc"):
        d, p = np.asarray(getattr(pd, name)), np.asarray(getattr(pp, name))
        scale = np.abs(d).max() + 1e-6
        np.testing.assert_allclose(p, d, atol=5e-3 * scale, rtol=5e-2,
                                   err_msg=f"DP pallas-vs-dense: {name}")
    assert abs(float(outs["pallas"][3].total)
               - float(outs["dense"][3].total)) < 1e-3


def test_dp_training_with_densify_via_cli_driver(rng, tmp_path):
    """training(n_devices=4): N steps including a densify pass + opacity
    reset on the virtual mesh, through the real driver."""
    import json
    import os
    from PIL import Image
    from gaussmart_tpu.io.ply import store_point_cloud
    from gaussmart_tpu.config import (ModelParams, OptimizationParams,
                                      PipelineParams)
    from gaussmart_tpu.train import training

    src = tmp_path / "scene"
    os.makedirs(src / "train")
    frames = []
    for i in range(8):
        img = np.zeros((24, 24, 4), np.uint8)
        img[6:18, 6:18, 0] = 255
        img[:, :, 3] = 255
        Image.fromarray(img, "RGBA").save(src / "train" / f"r_{i}.png")
        ang = 0.1 * i
        c, s = np.cos(ang), np.sin(ang)
        c2w = np.array([[c, 0, s, 0.1 * i], [0, 1, 0, 0],
                        [-s, 0, c, 3.0], [0, 0, 0, 1.0]])
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    pts = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    store_point_cloud(str(src / "points3d.ply"), pts,
                      rng.integers(0, 255, (64, 3)).astype(np.float64))

    dataset = ModelParams(source_path=str(src),
                          model_path=str(tmp_path / "out"),
                          white_background=True, sh_degree=1, resolution=1)
    opt = OptimizationParams(
        iterations=25, densify_from_iter=5, densify_until_iter=22,
        densification_interval=10, opacity_reset_interval=40,
        opacity_cull=0.005, position_lr_max_steps=25)
    pipe = PipelineParams(backend="dense")
    state, adam = training(
        dataset, opt, pipe, testing_iterations=[], saving_iterations=[25],
        checkpoint_iterations=[], use_dino_loss=False, quiet=True,
        capacity=256, n_devices=4)
    assert int(state.n_active) > 0
    assert (tmp_path / "out" / "point_cloud" / "iteration_25"
            / "point_cloud.ply").exists()


def test_mp_training_with_densify_via_cli_driver(rng, tmp_path):
    """training(n_devices=4, parallel_mode='mp'): Gaussian-sharded training
    through the real driver, including a densify pass + capacity handling
    (arena sharding re-pinned after scatters)."""
    import json
    import os
    from PIL import Image
    from gaussmart_tpu.io.ply import store_point_cloud
    from gaussmart_tpu.config import (ModelParams, OptimizationParams,
                                      PipelineParams)
    from gaussmart_tpu.train import training

    src = tmp_path / "scene"
    os.makedirs(src / "train")
    frames = []
    for i in range(8):
        img = np.zeros((24, 24, 4), np.uint8)
        img[6:18, 6:18, 0] = 255
        img[:, :, 3] = 255
        Image.fromarray(img, "RGBA").save(src / "train" / f"r_{i}.png")
        ang = 0.1 * i
        c, s = np.cos(ang), np.sin(ang)
        c2w = np.array([[c, 0, s, 0.1 * i], [0, 1, 0, 0],
                        [-s, 0, c, 3.0], [0, 0, 0, 1.0]])
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    pts = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    store_point_cloud(str(src / "points3d.ply"), pts,
                      rng.integers(0, 255, (64, 3)).astype(np.float64))

    dataset = ModelParams(source_path=str(src),
                          model_path=str(tmp_path / "out_mp"),
                          white_background=True, sh_degree=1, resolution=1)
    opt = OptimizationParams(
        iterations=25, densify_from_iter=5, densify_until_iter=22,
        densification_interval=10, opacity_reset_interval=40,
        opacity_cull=0.005, position_lr_max_steps=25)
    pipe = PipelineParams(backend="dense")
    state, adam = training(
        dataset, opt, pipe, testing_iterations=[], saving_iterations=[25],
        checkpoint_iterations=[], use_dino_loss=False, quiet=True,
        capacity=256, n_devices=4, parallel_mode="mp")
    assert int(state.n_active) > 0
    assert (tmp_path / "out_mp" / "point_cloud" / "iteration_25"
            / "point_cloud.ply").exists()
    # state leaves carry the arena sharding, not replicas
    assert not state.params.xyz.sharding.is_fully_replicated


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


def test_gaussian_sharded_render_matches_dense(rng):
    """Splat-sharded rendering (8 depth strata on the virtual mesh) must
    match the single-device dense composite, including median depth and
    the distortion integral."""
    from gaussmart_tpu.parallel.sharding import render_gaussian_sharded

    mesh = make_mesh()
    state, cams = make_scene(rng, n=32, width=32, height=24)
    cam = cams[0].params()
    prep = raster_common.preprocess(
        state.params.xyz, state.get_scaling, state.params.rotation,
        state.get_opacity[:, 0], state.get_features, state.aux.active,
        cam, sh_degree=0)
    means2d = jnp.zeros((state.capacity, 2))
    bg = jnp.array([0.2, 0.1, 0.4])

    ref = rasterize_pixels(prep, means2d, bg, 32, 24, chunk=8)
    out = render_gaussian_sharded(mesh, prep, means2d, bg, 32, 24, chunk=8)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["allmap"]),
                               np.asarray(ref["allmap"]), atol=2e-3)


def test_gaussian_sharded_render_pallas_backend(rng):
    """The production tiled kernel behind the two-pass fold (init_state
    path, interpret mode on the virtual mesh) must match the dense
    composite too."""
    from gaussmart_tpu.parallel.sharding import render_gaussian_sharded

    mesh = make_mesh()
    state, cams = make_scene(rng, n=32, width=32, height=24)
    cam = cams[0].params()
    prep = raster_common.preprocess(
        state.params.xyz, state.get_scaling, state.params.rotation,
        state.get_opacity[:, 0], state.get_features, state.aux.active,
        cam, sh_degree=0)
    means2d = jnp.zeros((state.capacity, 2))
    bg = jnp.array([0.2, 0.1, 0.4])

    ref = rasterize_pixels(prep, means2d, bg, 32, 24, chunk=8)
    out = render_gaussian_sharded(mesh, prep, means2d, bg, 32, 24,
                                  backend="pallas")
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["allmap"]),
                               np.asarray(ref["allmap"]), atol=2e-3)


def test_mp_train_step_matches_singlechip(rng):
    """Model-parallel (Gaussian-sharded) TRAINING: params, Adam moments and
    densify stats sharded over the 8-way mesh; one full step (render, loss,
    reverse AD through the two-pass fold, stats, masked Adam) must match
    the single-chip dense step, and the outputs must KEEP the arena
    sharding — the memory-scaling contract."""
    from gaussmart_tpu.parallel.sharding import (make_mp_train_step,
                                                 shard_state)
    from gaussmart_tpu.train_lib import make_train_step

    mesh = make_mesh()
    state, cams = make_scene(rng, n=32, width=32, height=24)
    opt = OptimizationParams()
    adam = init_adam(state.params)
    cam = cams[0].params()
    gt = jnp.asarray(rng.random((3, 24, 32)), jnp.float32)
    it = jnp.asarray(1, jnp.int32)

    ref_step = make_train_step(opt, sh_degree=0, white_background=False,
                               backend="dense", spatial_lr_scale=1.0,
                               donate=False)
    rp, ra, rx, rm, _ = ref_step(state.params, adam, state.aux, cam, gt, it)

    mp_step = make_mp_train_step(opt, mesh, sh_degree=0,
                                 white_background=False)
    sp, sa, sx = shard_state(state.params, adam, state.aux, mesh)
    mp, ma, mx, mm, it2 = mp_step(sp, sa, sx, cam, gt, it)

    np.testing.assert_allclose(float(mm.total), float(rm.total), atol=1e-4)
    np.testing.assert_allclose(np.asarray(mp.xyz), np.asarray(rp.xyz),
                               atol=5e-4)
    np.testing.assert_allclose(np.asarray(ma.mu.xyz), np.asarray(ra.mu.xyz),
                               atol=1e-4)
    np.testing.assert_allclose(np.asarray(mx.grad_accum),
                               np.asarray(rx.grad_accum), atol=1e-4,
                               rtol=0.05)
    assert int(it2) == 2
    # memory-scaling contract: state stays split over the mesh
    assert not mp.xyz.sharding.is_fully_replicated
    assert not ma.mu.xyz.sharding.is_fully_replicated
    assert not mx.grad_accum.sharding.is_fully_replicated


def test_dp_step_adam_on_densify_drop(rng):
    """DP step honors adam_on_densify='drop' (reference parity, same as the
    single-chip and MP steps): on a densify iteration the Adam update is
    discarded — params and moments come back unchanged."""
    from gaussmart_tpu.parallel.sharding import (BatchedCameras,
                                                 make_dp_train_step,
                                                 replicate, shard_batch)

    mesh = make_mesh()
    n_dev = mesh.devices.size
    state, cams = make_scene(rng, n=32, width=32, height=24)
    opt = OptimizationParams(densify_from_iter=0, densify_until_iter=100,
                             densification_interval=2)
    adam = init_adam(state.params)
    batched = BatchedCameras.stack([cams[i % len(cams)].params()
                                    for i in range(n_dev)])
    gts = jnp.asarray(rng.random((n_dev, 3, 24, 32)), jnp.float32)
    params, adam0, aux = replicate((state.params, adam, state.aux), mesh)
    batched, gts = shard_batch((batched, gts), mesh)

    step = make_dp_train_step(opt, mesh, sh_degree=0, white_background=False,
                              adam_on_densify="drop")
    # iteration 4: in window, past from_iter, divisible by the interval
    it = jnp.asarray(4, jnp.int32)
    p, a, x, m, _ = step(params, adam0, aux, batched, gts, it)
    np.testing.assert_array_equal(np.asarray(p.xyz), np.asarray(params.xyz))
    np.testing.assert_array_equal(np.asarray(a.mu.xyz),
                                  np.asarray(adam0.mu.xyz))
    # densify stats still accumulate on the dropped iteration
    assert float(jnp.abs(x.grad_accum).sum()) > 0

    # iteration 5: not a densify iteration -> update applies
    p2, *_ = step(params, adam0, aux, batched, gts, it + 1)
    assert float(jnp.abs(p2.xyz - params.xyz).max()) > 0


def test_mp_train_step_pallas_backend_matches_dense(rng):
    """Gaussian-sharded training through the PRODUCTION Pallas kernel
    (differentiable seeded core, interpret mode on the virtual mesh): one
    full MP step must match the MP step with the dense inner compositor."""
    from gaussmart_tpu.parallel.sharding import (make_mp_train_step,
                                                 shard_state)

    mesh = make_mesh()
    state, cams = make_scene(rng, n=32, width=32, height=24)
    opt = OptimizationParams()
    adam = init_adam(state.params)
    cam = cams[0].params()
    gt = jnp.asarray(rng.random((3, 24, 32)), jnp.float32)
    it = jnp.asarray(1, jnp.int32)

    outs = {}
    for backend in ("gaussian_sharded", "gaussian_sharded_pallas"):
        step = make_mp_train_step(opt, mesh, sh_degree=0,
                                  white_background=False, backend=backend)
        sp, sa, sx = shard_state(state.params, adam, state.aux, mesh)
        outs[backend] = step(sp, sa, sx, cam, gt, it)

    dp, da, dx, dm, _ = outs["gaussian_sharded"]
    pp, pa, px, pm, _ = outs["gaussian_sharded_pallas"]
    np.testing.assert_allclose(float(pm.total), float(dm.total), atol=1e-4)
    for name in ("xyz", "opacity", "scaling", "features_dc"):
        a, b = np.asarray(getattr(pp, name)), np.asarray(getattr(dp, name))
        scale = max(1.0, np.abs(b).max())
        np.testing.assert_allclose(a, b, atol=2e-4 * scale,
                                   err_msg=f"MP pallas-vs-dense: {name}")
    np.testing.assert_allclose(np.asarray(pa.mu.xyz), np.asarray(da.mu.xyz),
                               atol=2e-3, rtol=0.05)
    np.testing.assert_allclose(np.asarray(px.grad_accum),
                               np.asarray(dx.grad_accum), atol=1e-4,
                               rtol=0.05)
    # memory-scaling contract survives the pallas path
    assert not pp.xyz.sharding.is_fully_replicated


def test_gaussian_sharded_gradients_match_dense(rng):
    """jax.grad flows through the two-pass sharded composite (stratum
    gathers, all_gather of transmittance factors, psum fold): gradients wrt
    splat opacity and color match the single-device dense composite — the
    building block for Gaussian-sharded (model-parallel) training."""
    from gaussmart_tpu.parallel.sharding import render_gaussian_sharded

    mesh = make_mesh()
    state, cams = make_scene(rng, n=32, width=32, height=24)
    cam = cams[0].params()
    base = raster_common.preprocess(
        state.params.xyz, state.get_scaling, state.params.rotation,
        state.get_opacity[:, 0], state.get_features, state.aux.active,
        cam, sh_degree=0)
    means2d = jnp.zeros((state.capacity, 2))
    bg = jnp.array([0.3, 0.2, 0.1])
    W = jnp.asarray(rng.random((3, 24, 32)), jnp.float32)

    def loss_sharded(opacity, color):
        prep = base._replace(opacity=opacity, color=color)
        out = render_gaussian_sharded(mesh, prep, means2d, bg, 32, 24,
                                      chunk=8)
        return jnp.sum(out["image"] * W)

    def loss_dense(opacity, color):
        prep = base._replace(opacity=opacity, color=color)
        out = rasterize_pixels(prep, means2d, bg, 32, 24, chunk=8)
        return jnp.sum(out["image"] * W)

    # shard_map requires jit for transforms (no eager closed_call)
    g_s = jax.jit(jax.grad(loss_sharded, argnums=(0, 1)))(
        base.opacity, base.color)
    g_d = jax.jit(jax.grad(loss_dense, argnums=(0, 1)))(
        base.opacity, base.color)
    for a, b in zip(g_s, g_d):
        scale = max(1.0, float(jnp.abs(b).max()))
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-3 * scale)


def test_api_render_sharded_backends_match_dense(rng):
    """Multi-device inference through the public render API (what the
    render CLI's --n_devices uses): row_sharded with a height that is NOT
    a multiple of the mesh (pad+crop path) and gaussian_sharded, both
    against the dense composite including the full allmap decode."""
    from gaussmart_tpu.render.api import render

    mesh = make_mesh()
    state, cams = make_scene(rng, n=32, width=32, height=28)  # 28 % 8 != 0
    cam = cams[0].params()
    bg = jnp.array([0.15, 0.25, 0.35])

    ref = render(cam, state, bg, backend="dense")
    row = render(cam, state, bg, backend="row_sharded", mesh=mesh)
    gs = render(cam, state, bg, backend="gaussian_sharded", mesh=mesh)
    gsp = render(cam, state, bg, backend="gaussian_sharded_pallas",
                 mesh=mesh)

    for key, atol_row, atol_gs in (("render", 1e-5, 5e-4),
                                   ("rend_alpha", 1e-5, 5e-4),
                                   ("surf_depth", 1e-4, 5e-3),
                                   ("rend_normal", 1e-5, 5e-4)):
        np.testing.assert_allclose(np.asarray(row[key]),
                                   np.asarray(ref[key]), atol=atol_row,
                                   err_msg=f"row_sharded {key}")
        np.testing.assert_allclose(np.asarray(gs[key]),
                                   np.asarray(ref[key]), atol=atol_gs,
                                   err_msg=f"gaussian_sharded {key}")
        np.testing.assert_allclose(np.asarray(gsp[key]),
                                   np.asarray(ref[key]), atol=atol_gs,
                                   err_msg=f"gaussian_sharded_pallas {key}")


def test_gaussian_sharded_dense_overlap(rng):
    """Saturating overlap exercises the cross-stratum T_EPS cutoff and the
    median crossing landing mid-stratum."""
    from gaussmart_tpu.parallel.sharding import render_gaussian_sharded

    mesh = make_mesh()
    n = 48
    pts = np.stack([rng.uniform(-0.2, 0.2, n), rng.uniform(-0.2, 0.2, n),
                    rng.uniform(2.0, 4.0, n)], axis=1).astype(np.float32)
    from gaussmart_tpu.models.gaussians import init_from_pcd
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=0, spatial_lr_scale=1.0, capacity=48)
    import dataclasses as dc
    from gaussmart_tpu.transforms import inverse_sigmoid
    op = np.full(n, 0.8, np.float32)
    state = state.replace(params=dc.replace(
        state.params,
        opacity=state.params.opacity.at[:, 0].set(
            np.asarray(inverse_sigmoid(op)))))
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.7, width=32,
                 height=24).params()
    prep = raster_common.preprocess(
        state.params.xyz, state.get_scaling, state.params.rotation,
        state.get_opacity[:, 0], state.get_features, state.aux.active,
        cam, sh_degree=0)
    means2d = jnp.zeros((n, 2))
    bg = jnp.zeros(3)
    ref = rasterize_pixels(prep, means2d, bg, 32, 24, chunk=8)
    out = render_gaussian_sharded(mesh, prep, means2d, bg, 32, 24, chunk=8)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=5e-4)
    am_o, am_r = np.asarray(out["allmap"]), np.asarray(ref["allmap"])
    np.testing.assert_allclose(am_o[[0, 1, 2, 3, 4, 6]],
                               am_r[[0, 1, 2, 3, 4, 6]], atol=5e-3)
    # median: discrete pick; allow rare boundary flips
    med_mismatch = np.mean(np.abs(am_o[5] - am_r[5]) > 1e-3)
    assert med_mismatch < 0.02, med_mismatch


def test_gaussian_sharded_sticky_termination_carry(rng):
    """The single-chip walk freezes a pixel FOR GOOD once T(1-a) < T_EPS,
    with frozen T as large as T_EPS/(1-ALPHA_MAX)=1e-2 — far above T_EPS —
    so the fold cannot reconstruct `done` from T alone. With the min-test
    carry (pass-1 min_test + zeroed seed T + last-live-stratum final T) the
    sharded composite must match the dense single-chip walk to fp rounding
    even where termination bites mid-stratum."""
    from gaussmart_tpu.parallel.sharding import render_gaussian_sharded
    from gaussmart_tpu.render.raster_common import T_EPS

    mesh = make_mesh()
    n = 64
    # a deep stack of near-opaque splats on one line of sight: T crosses
    # T_EPS within a few entries, and the cut lands mid-stratum for many
    # pixels
    pts = np.stack([rng.uniform(-0.12, 0.12, n), rng.uniform(-0.12, 0.12, n),
                    rng.uniform(2.0, 4.0, n)], axis=1).astype(np.float32)
    from gaussmart_tpu.models.gaussians import init_from_pcd
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=0, spatial_lr_scale=1.0, capacity=64)
    import dataclasses as dc
    from gaussmart_tpu.transforms import inverse_sigmoid
    op = np.full(n, 0.95, np.float32)
    state = state.replace(params=dc.replace(
        state.params,
        opacity=state.params.opacity.at[:, 0].set(
            np.asarray(inverse_sigmoid(op)))))
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.7, width=32,
                 height=24).params()
    prep = raster_common.preprocess(
        state.params.xyz, state.get_scaling, state.params.rotation,
        state.get_opacity[:, 0], state.get_features, state.aux.active,
        cam, sh_degree=0)
    means2d = jnp.zeros((n, 2))
    bg = jnp.asarray([0.2, 0.4, 0.6])

    ref = rasterize_pixels(prep, means2d, bg, 32, 24, chunk=8,
                           return_raw=True)
    # the regime under test must actually occur: frozen T well above T_EPS
    doneT = np.asarray(ref["raw"]["T"])[np.asarray(ref["raw"]["done"])]
    assert doneT.size > 0 and doneT.max() > 3 * T_EPS, (
        "scene must early-terminate with frozen T >> T_EPS")

    out = render_gaussian_sharded(mesh, prep, means2d, bg, 32, 24, chunk=8)
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=2e-5)
    am_o, am_r = np.asarray(out["allmap"]), np.asarray(ref["allmap"])
    np.testing.assert_allclose(am_o[[0, 1, 2, 3, 4, 6]],
                               am_r[[0, 1, 2, 3, 4, 6]], atol=2e-4)
