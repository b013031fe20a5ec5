"""Pallas tiled rasterizer vs the dense oracle (interpret mode on CPU)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussmart_tpu.cameras import Camera
from gaussmart_tpu.render import raster_common
from gaussmart_tpu.render.raster_dense import rasterize_pixels
from gaussmart_tpu.render.raster_pallas import rasterize_tiled
from gaussmart_tpu.ops.sh import rgb2sh

from test_raster import make_camera, make_scene


def prep_scene(rng, n=30, width=64, height=32, **kw):
    cam = make_camera(width=width, height=height)
    xyz, scales, quats, opac, shs, _ = make_scene(n, rng, **kw)
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                    jnp.ones(n, bool), cam.params(),
                                    sh_degree=0)
    return cam, prep, (xyz, scales, quats, opac, shs)


def test_forward_matches_dense(rng):
    cam, prep, _ = prep_scene(rng)
    n = prep.depth.shape[0]
    means2d = jnp.zeros((n, 2))
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = rasterize_pixels(prep, means2d, bg, cam.width, cam.height, chunk=8)
    out = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                          interpret=True)
    _assert_close_modulo_binning(out, ref)


@pytest.mark.slow
def test_forward_matches_dense_dense_overlap(rng):
    """Heavy overlap triggers early termination paths."""
    cam, prep, _ = prep_scene(rng, n=60, spread=0.15, scale=0.4, opacity=0.95)
    n = prep.depth.shape[0]
    means2d = jnp.zeros((n, 2))
    bg = jnp.zeros(3)
    ref = rasterize_pixels(prep, means2d, bg, cam.width, cam.height, chunk=8)
    out = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                          interpret=True)
    _assert_close_modulo_binning(out, ref)


def _assert_close_modulo_binning(out, ref):
    """16px tile binning truncates contributions outside the 3-sigma rect
    (the CUDA reference truncates identically); the dense oracle keeps
    them. Continuous channels may differ by ~alpha_eps at isolated border
    pixels; the median-depth channel is a discrete pick, so a truncated
    marginal contributor can flip it entirely at such pixels — compare it
    by mismatch rate."""
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=6e-3)
    am_out = np.asarray(out["allmap"])
    am_ref = np.asarray(ref["allmap"])
    cont = [0, 1, 2, 3, 4, 6]
    np.testing.assert_allclose(am_out[cont], am_ref[cont], atol=3e-2)
    med_mismatch = np.abs(am_out[5] - am_ref[5]) > 3e-2
    assert med_mismatch.mean() < 0.005, f"median flips: {med_mismatch.sum()}"


def test_gradients_match_dense(rng):
    cam = make_camera(width=32, height=32)
    n = 12
    xyz, scales, quats, opac, shs, _ = make_scene(n, rng, scale=0.25)
    target = jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
    bg = jnp.array([0.3, 0.3, 0.3])

    def loss(backend, xyz, scales, opac, shs, means2d):
        prep = raster_common.preprocess(
            xyz, scales, quats, opac, shs, jnp.ones(n, bool), cam.params(),
            sh_degree=0)
        if backend == "pallas":
            out = rasterize_tiled(prep, means2d, bg, 32, 32, interpret=True)
        else:
            out = rasterize_pixels(prep, means2d, bg, 32, 32, chunk=8)
        img = out["image"]
        am = out["allmap"]
        # touch every channel so all grad paths are exercised
        return (jnp.sum((img - target) ** 2)
                + 0.05 * jnp.sum(am[6])          # distortion
                + 0.01 * jnp.sum(am[0])          # expected depth
                + 0.01 * jnp.sum(am[2:5] ** 2)   # normals
                + 0.02 * jnp.sum(am[5])          # median depth
                + 0.01 * jnp.sum(am[1]))         # alpha

    means2d = jnp.zeros((n, 2))
    args = (xyz, scales, opac, shs, means2d)
    l_ref = float(loss("dense", *args))
    l_pal = float(loss("pallas", *args))
    assert abs(l_ref - l_pal) < 1e-3 * max(1.0, abs(l_ref))

    g_ref = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 2, 3, 4))(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3, 4))(*args)
    names = ["xyz", "scales", "opac", "shs", "means2d"]
    for nm, gr, gp in zip(names, g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gp, gr, atol=3e-3 * scale, rtol=2e-2,
                                   err_msg=f"grad mismatch: {nm}")


@pytest.mark.slow
def test_seeded_gradients_match_dense(rng):
    """Custom VJP of the SEEDED (init_state) core vs autodiff of the dense
    seeded compositor: gradients wrt splat inputs AND the (T0, M1_0, M2_0)
    seed must match, with cotangents on the raw T/M1/M2 outputs — exactly
    the wiring Gaussian-sharded training puts through the kernel."""
    cam = make_camera(width=32, height=32)
    n = 12
    xyz, scales, quats, opac, shs, _ = make_scene(n, rng, scale=0.25)
    npix = 32 * 32
    r2 = np.random.default_rng(7)
    T0 = jnp.asarray(r2.uniform(0.3, 1.0, npix).astype(np.float32))
    M1_0 = jnp.asarray(r2.uniform(0.0, 0.3, npix).astype(np.float32))
    M2_0 = jnp.asarray(r2.uniform(0.0, 0.2, npix).astype(np.float32))
    target = jnp.asarray(rng.random((3, 32, 32)).astype(np.float32))
    bg = jnp.zeros(3)

    def loss(backend, xyz, scales, opac, means2d, T0, M1_0, M2_0):
        prep = raster_common.preprocess(
            xyz, scales, quats, opac, shs, jnp.ones(n, bool), cam.params(),
            sh_degree=0)
        init = {"T": T0, "M1": M1_0, "M2": M2_0}
        if backend == "pallas":
            out = rasterize_tiled(prep, means2d, bg, 32, 32, interpret=True,
                                  init_state=init, return_raw=True)
        else:
            out = rasterize_pixels(prep, means2d, bg, 32, 32, chunk=8,
                                   init_state=init, return_raw=True)
        img, am, raw = out["image"], out["allmap"], out["raw"]
        # touch every channel incl. the raw fold outputs
        return (jnp.sum((img - target) ** 2)
                + 0.05 * jnp.sum(am[6])          # distortion
                + 0.01 * jnp.sum(am[0])          # expected depth
                + 0.01 * jnp.sum(am[2:5] ** 2)   # normals
                + 0.02 * jnp.sum(am[5])          # median depth
                + 0.01 * jnp.sum(am[1])          # alpha
                + 0.03 * jnp.sum(raw["T"] ** 2)
                + 0.02 * jnp.sum(raw["M1"] ** 2)
                + 0.01 * jnp.sum(raw["M2"]))

    means2d = jnp.zeros((n, 2))
    args = (xyz, scales, opac, means2d, T0, M1_0, M2_0)
    l_ref = float(loss("dense", *args))
    l_pal = float(loss("pallas", *args))
    assert abs(l_ref - l_pal) < 1e-3 * max(1.0, abs(l_ref))

    argnums = tuple(range(len(args)))
    g_ref = jax.grad(lambda *a: loss("dense", *a), argnums=argnums)(*args)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=argnums)(*args)
    names = ["xyz", "scales", "opac", "means2d", "T0", "M1_0", "M2_0"]
    for nm, gr, gp in zip(names, g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        scale = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gp, gr, atol=3e-3 * scale, rtol=2e-2,
                                   err_msg=f"seeded grad mismatch: {nm}")


@pytest.mark.slow
def test_giant_splat_full_rect_within_budget(rng):
    """A splat covering the whole frame keeps its FULL footprint at the
    default budget (no per-splat cap in the compacted binning — CUDA
    duplication semantics): every frame pixel is lit, zero drops."""
    cam = make_camera(width=128, height=128, fov=1.0)
    xyz = jnp.array([[0.0, 0.0, 2.0]])
    scales = jnp.array([[1.2, 1.2]])          # huge: covers the whole frame
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.9])
    shs = jnp.asarray(rgb2sh(np.ones((1, 1, 3), np.float32)))
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                    jnp.ones(1, bool), cam.params(),
                                    sh_degree=0)
    out = rasterize_tiled(prep, jnp.zeros((1, 2)), jnp.zeros(3), 128, 128,
                          max_dup=4, interpret=True)
    assert int(out["n_dropped"]) == 0
    alpha = np.asarray(out["allmap"][1])
    assert alpha[63, 63] > 0.5 and alpha[64, 64] > 0.5
    assert alpha.min() > 0.1  # no truncated corner tiles
    ref = rasterize_pixels(prep, jnp.zeros((1, 2)), jnp.zeros(3), 128, 128)
    np.testing.assert_allclose(alpha, np.asarray(ref["allmap"][1]),
                               atol=2e-5)


@pytest.mark.slow
def test_budget_overflow_drops_are_counted(rng):
    """When total wanted (splat, tile) pairs exceed the global W budget
    (incl. its 4096 small-scene floor) the overflow is dropped and
    n_dropped reports it exactly."""
    size = 256
    cam, prep, _ = prep_scene(rng, n=48, width=size, height=size, scale=0.9,
                              spread=0.4, depth_range=(1.5, 4.0))
    n = prep.depth.shape[0]
    means2d = jnp.zeros((n, 2))
    # count the wants straight from the clipped tight footprint rects
    rx = np.asarray(prep.rx).astype(np.float64)
    ry = np.asarray(prep.ry).astype(np.float64)
    cx, cy = np.asarray(prep.center2d).T
    tiles_x = tiles_y = 2 * ((size + 31) // 32)
    val = np.asarray(prep.valid) & (rx > 0) & (ry > 0)
    nx = np.clip(np.floor((cx + rx) / 16) + 1, 0, tiles_x) - np.clip(
        np.floor((cx - rx) / 16), 0, tiles_x)
    ny = np.clip(np.floor((cy + ry) / 16) + 1, 0, tiles_y) - np.clip(
        np.floor((cy - ry) / 16), 0, tiles_y)
    total = int((np.where(val, nx, 0) * np.where(val, ny, 0)).sum())
    W = max(n, 1024) * 3                      # max_dup=0, work_mult=3
    assert total > W, f"scene must overflow the test budget ({total})"
    # the rect enumeration (conic_cull=False) drops exactly rect_wants - W
    out = rasterize_tiled(prep, means2d, jnp.zeros(3), size, size,
                          max_dup=0, work_mult=3, interpret=True,
                          conic_cull=False)
    assert int(out["n_dropped"]) == total - W
    # interval binning wants fewer pairs (it culls zero-contribution
    # columns) but must still report a positive exact drop count vs its
    # own (smaller) want total
    out_c = rasterize_tiled(prep, means2d, jnp.zeros(3), size, size,
                            max_dup=0, work_mult=3, interpret=True)
    assert 0 < int(out_c["n_dropped"]) <= total - W


@pytest.mark.slow
def test_specialized_backward_matches_full(rng):
    """need_dist_grad/need_med_grad=False must give identical gradients to
    the full backward whenever the loss ignores dist/median channels."""
    cam, prep0, arrays = prep_scene(rng, n=40)
    xyz, scales, quats, opac, shs = arrays
    n = xyz.shape[0]

    def loss(need_flags, xyz, scales, opac, means2d):
        prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                        jnp.ones(n, bool), cam.params(),
                                        sh_degree=0)
        out = rasterize_tiled(prep, means2d, jnp.zeros(3), cam.width,
                              cam.height, interpret=True,
                              need_dist_grad=need_flags,
                              need_med_grad=need_flags)
        am = out["allmap"]
        # only color/alpha/expected-depth/normals: dist+median cts are zero
        return (jnp.sum(out["image"] ** 2) + 0.1 * jnp.sum(am[0])
                + 0.05 * jnp.sum(am[2:5]) + 0.01 * jnp.sum(am[1]))

    means2d = jnp.zeros((n, 2))
    gfull = jax.grad(lambda *a: loss(True, *a), argnums=(0, 1, 2, 3))(
        xyz, scales, opac, means2d)
    gspec = jax.grad(lambda *a: loss(False, *a), argnums=(0, 1, 2, 3))(
        xyz, scales, opac, means2d)
    for nm, gf, gs in zip(["xyz", "scales", "opac", "means2d"], gfull, gspec):
        # rtol 1e-5: the two programs compute the same math but the
        # statically-elided dist/med branches change instruction
        # scheduling, so results differ by float reassociation (~4e-6
        # relative observed after the round-5 straight-line backward)
        np.testing.assert_allclose(np.asarray(gs), np.asarray(gf),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"specialized bwd mismatch: {nm}")


@pytest.mark.slow
def test_truncation_stress_post_opacity_reset(rng):
    """VERDICT r1 task 5: the large-footprint regime right after an opacity
    reset (big world scales, opacity clamped to 0.01) must stay visually
    equal to the un-truncated dense oracle even when the duplicate budget
    actually drops entries."""
    size = 256
    cam = make_camera(width=size, height=size, fov=1.0)
    n = 48
    # big overlapping splats -> many tiles per splat, budget pressure
    xyz, scales, quats, opac, shs, _ = make_scene(
        n, rng, depth_range=(1.5, 4.0), spread=0.5, scale=1.0)
    from gaussmart_tpu.transforms import inverse_sigmoid
    opac = inverse_sigmoid(jnp.full(n, 0.01))      # post-reset value
    opac = jax.nn.sigmoid(opac)                    # raster takes activated
    prep = raster_common.preprocess(xyz, scales, quats, jnp.asarray(opac),
                                    shs, jnp.ones(n, bool), cam.params(),
                                    sh_degree=0)
    ref_out = rasterize_pixels(prep, jnp.zeros((n, 2)), jnp.zeros(3),
                               size, size)
    ref = np.asarray(ref_out["image"])

    def psnr_vs_oracle(out):
        mse = float(((np.asarray(out["image"]) - ref) ** 2).mean())
        return 10 * np.log10(1.0 / max(mse, 1e-12))

    # a deliberately tiny global budget overflows and the image departs
    # measurably from the oracle (drops are real)
    bare = rasterize_tiled(prep, jnp.zeros((n, 2)), jnp.zeros(3), size, size,
                           max_dup=0, work_mult=3, interpret=True)
    assert int(bare["n_dropped"]) > 0, "stress scene must exceed the budget"

    # grown budget (the trainer's adaptive escalation / inference default):
    # zero drops and oracle-exact — post-reset footprints never truncate
    grown = rasterize_tiled(prep, jnp.zeros((n, 2)), jnp.zeros(3), size, size,
                            max_dup=64, work_mult=12, interpret=True)
    assert int(grown["n_dropped"]) == 0
    assert psnr_vs_oracle(grown) > 55.0, psnr_vs_oracle(grown)
    assert psnr_vs_oracle(grown) > psnr_vs_oracle(bare)


@pytest.mark.slow
def test_init_state_segment_compositing_matches_full(rng):
    """Seeded (T, M1, M2) segment compositing through the tiled kernel:
    compositing the far half of the depth-sorted splats with the near
    half's final state must reproduce the full-set tiled composite exactly
    (same binning truncation on both sides) — the Gaussian-sharded
    building block."""
    cam, prep, _ = prep_scene(rng, n=40)
    n = prep.depth.shape[0]
    means2d = jnp.zeros((n, 2))
    bg = jnp.zeros(3)

    full = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                           interpret=True, return_raw=True)["raw"]

    order = np.argsort(np.where(np.asarray(prep.valid),
                                np.asarray(prep.depth), np.inf))
    near = np.zeros(n, bool)
    near[order[:n // 2]] = True

    def subset(mask):
        m = jnp.asarray(mask)
        return prep._replace(valid=prep.valid & m,
                             opacity=prep.opacity * m)

    p1 = rasterize_tiled(subset(near), means2d, bg, cam.width, cam.height,
                         interpret=True, return_raw=True)["raw"]
    p2 = rasterize_tiled(subset(~near), means2d, bg, cam.width, cam.height,
                         interpret=True, return_raw=True,
                         init_state={k: p1[k] for k in ("T", "M1", "M2")}
                         )["raw"]

    merged = {
        "color": p1["color"] + p2["color"],
        "normal": p1["normal"] + p2["normal"],
        "depth": p1["depth"] + p2["depth"],
        "alpha": p1["alpha"] + p2["alpha"],
        "dist": p1["dist"] + p2["dist"],
        "T": p2["T"],
        "median": np.where(np.asarray(p2["median"]) > 0,
                           np.asarray(p2["median"]),
                           np.asarray(p1["median"])),
    }
    for k, v in merged.items():
        np.testing.assert_allclose(np.asarray(v), np.asarray(full[k]),
                                   atol=1e-4, err_msg=k)


@pytest.mark.slow
def test_full_screen_giant_is_exact(rng):
    """A splat covering the whole frame (a near-camera background sheet)
    rasterizes with NO tile truncation — exact vs the dense oracle, zero
    drops — even at a tight budget, because the compacted binning has no
    per-splat cap (the CUDA reference never truncates)."""
    cam = make_camera(width=128, height=128, fov=1.0)
    # one whole-frame white sheet in front of a small textured scene
    xyz, scales, quats, opac, shs, _ = make_scene(12, rng,
                                                  depth_range=(3.0, 5.0))
    xyz = jnp.concatenate([jnp.array([[0.0, 0.0, 0.5]]), xyz])
    scales = jnp.concatenate([jnp.array([[2.0, 2.0]]), scales])
    quats = jnp.concatenate([jnp.array([[1.0, 0.0, 0.0, 0.0]]), quats])
    opac = jnp.concatenate([jnp.array([0.6]), opac])
    shs = jnp.concatenate([jnp.asarray(rgb2sh(np.ones((1, 1, 3), np.float32))),
                           shs])
    n = xyz.shape[0]
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                    jnp.ones(n, bool), cam.params(),
                                    sh_degree=0)
    means2d = jnp.zeros((n, 2))
    bg = jnp.array([0.1, 0.2, 0.3])
    ref = rasterize_pixels(prep, means2d, bg, 128, 128)
    out = rasterize_tiled(prep, means2d, bg, 128, 128,
                          max_dup=2, interpret=True)
    assert int(out["n_dropped"]) == 0
    np.testing.assert_allclose(np.asarray(out["image"]),
                               np.asarray(ref["image"]), atol=2e-5)
    np.testing.assert_allclose(np.asarray(out["allmap"][1]),
                               np.asarray(ref["allmap"][1]), atol=2e-5)


@pytest.mark.slow
def test_tight_footprint_is_exact(rng):
    """The opacity-aware per-axis footprint (prep.rx/ry) must produce
    BIT-IDENTICAL output to binning with the reference's isotropic 3-sigma
    square (rx = ry = radius): every (splat, tile) pair it culls has
    alpha < ALPHA_EPS at every pixel of the tile. Scene stresses the cull:
    translucent splats (strong radius shrink), near-eps opacities, sub-eps
    opacities (empty footprint), and eccentric anisotropic splats."""
    cam = make_camera(width=96, height=64)
    n = 48
    xyz, scales, quats, opac, shs, _ = make_scene(
        n, rng, spread=0.7, scale=0.35)
    # eccentric surfels + a wide opacity mix (all above ALPHA_EPS so the
    # binning-valid set — and with it the depth-quantization range — is
    # identical between the two runs; sub-eps culling is covered below)
    scales = scales.at[:, 0].mul(jnp.asarray(
        rng.uniform(0.05, 1.0, n), jnp.float32))
    opac = jnp.asarray(np.concatenate([
        rng.uniform(0.006, 0.02, n // 4),          # near eps
        rng.uniform(0.02, 0.2, n // 4),            # translucent
        rng.uniform(0.5, 0.99, n - 2 * (n // 4)),  # opaque
    ]).astype(np.float32))
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                    jnp.ones(n, bool), cam.params(),
                                    sh_degree=0)
    # tight extents never exceed the square, and shrink somewhere
    assert np.all(np.asarray(prep.rx) <= np.asarray(prep.radius))
    assert np.all(np.asarray(prep.ry) <= np.asarray(prep.radius))
    assert (np.asarray(prep.rx) < np.asarray(prep.radius)).any()

    means2d = jnp.zeros((n, 2))
    bg = jnp.array([0.3, 0.1, 0.6])
    out_tight = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                                interpret=True)
    square = prep._replace(rx=prep.radius, ry=prep.radius)
    out_square = rasterize_tiled(square, means2d, bg, cam.width, cam.height,
                                 interpret=True)
    np.testing.assert_array_equal(np.asarray(out_tight["image"]),
                                  np.asarray(out_square["image"]))
    # Every channel except distortion is BIT-identical. The culled pairs are
    # semantically exact no-ops (verified: contrib sequences per pixel are
    # identical in both runs), but their interleaved masked entries shift
    # the real entries to different slots of the kernel's 8x-unrolled walk,
    # where FMA contraction differs at 1-ulp level; `dist` is a tiny
    # (~1e-6) cancellation-built quantity, the one channel where that noise
    # clears bit-exactness (max observed 3.5e-8 abs / 2e-3 rel).
    np.testing.assert_array_equal(np.asarray(out_tight["allmap"][:6]),
                                  np.asarray(out_square["allmap"][:6]))
    np.testing.assert_allclose(np.asarray(out_tight["allmap"][6]),
                               np.asarray(out_square["allmap"][6]),
                               atol=1e-7, rtol=5e-3)

    # gradients are identical too (culled pairs contributed zero gradient)
    def loss_of(base, T, c2d, op, col):
        p = base._replace(T=T, center2d=c2d, opacity=op, color=col)
        o = rasterize_tiled(p, means2d, bg, cam.width, cam.height,
                            interpret=True)
        return jnp.sum(o["image"] ** 2) + jnp.sum(o["allmap"][:5])

    diff = (prep.T, prep.center2d, prep.opacity, prep.color)
    g_t = jax.grad(loss_of, argnums=(1, 2, 3, 4))(prep, *diff)
    g_s = jax.grad(loss_of, argnums=(1, 2, 3, 4))(square, *diff)
    for a, b in zip(g_t, g_s):
        # near-exact: same unroll-slot FMA noise as the forward (see above)
        a, b = np.asarray(a), np.asarray(b)
        np.testing.assert_allclose(a, b, rtol=1e-5,
                                   atol=1e-6 * (np.abs(b).max() + 1e-12))


@pytest.mark.slow
def test_sub_eps_opacity_splat_has_empty_footprint(rng):
    """A splat with opacity <= ALPHA_EPS gets rx = ry = 0 (alpha < eps at
    EVERY pixel, so it composites nowhere and receives no gradient) and
    rendering is bit-identical to deactivating it outright."""
    cam = make_camera(width=64, height=32)
    n = 10
    xyz, scales, quats, opac, shs, _ = make_scene(n, rng, scale=0.3)
    opac = opac.at[3].set(0.003).at[7].set(1.0 / 255.0)   # <= ALPHA_EPS
    active = jnp.ones(n, bool)
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs, active,
                                    cam.params(), sh_degree=0)
    assert float(prep.rx[3]) == 0.0 and float(prep.ry[7]) == 0.0
    prep_off = raster_common.preprocess(
        xyz, scales, quats, opac, shs,
        active.at[3].set(False).at[7].set(False), cam.params(), sh_degree=0)
    means2d = jnp.zeros((n, 2))
    bg = jnp.array([0.2, 0.2, 0.2])
    a = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                        interpret=True)
    b = rasterize_tiled(prep_off, means2d, bg, cam.width, cam.height,
                        interpret=True)
    np.testing.assert_array_equal(np.asarray(a["image"]),
                                  np.asarray(b["image"]))
    np.testing.assert_array_equal(np.asarray(a["allmap"]),
                                  np.asarray(b["allmap"]))


def _quadrant_scene(counts, width=32, height=32, depth=3.0, scale=0.05,
                    seed=0):
    """Tiny splats pinned inside specific 16x16 tiles of a 32x32 frame
    (one 4-stream group). `counts` = splats per tile (TL, TR, BL, BR)."""
    rng = np.random.default_rng(seed)
    centers = {0: (-0.6, -0.6), 1: (0.6, -0.6), 2: (-0.6, 0.6), 3: (0.6, 0.6)}
    pts = []
    for tile, cnt in enumerate(counts):
        cx, cy = centers[tile]
        for _ in range(cnt):
            pts.append([cx + rng.uniform(-0.1, 0.1),
                        cy + rng.uniform(-0.1, 0.1),
                        depth + rng.uniform(-0.5, 0.5)])
    n = len(pts)
    xyz = jnp.asarray(np.array(pts, np.float32))
    scales = jnp.asarray(np.full((n, 2), scale, np.float32)
                         * rng.uniform(0.6, 1.4, (n, 2)).astype(np.float32))
    quats = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
    opac = jnp.asarray(rng.uniform(0.5, 0.95, n).astype(np.float32))
    shs = jnp.asarray(rgb2sh(rng.random((n, 1, 3)).astype(np.float32)))
    cam = make_camera(width=width, height=height)
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                    jnp.ones(n, bool), cam.params(),
                                    sh_degree=0)
    return cam, prep, (xyz, scales, quats, opac, shs)


@pytest.mark.slow
@pytest.mark.parametrize("counts", [(3, 3, 1, 0), (70, 2, 1, 0)])
def test_empty_and_short_streams_regression(rng, counts):
    """VERDICT r2 weak #1 repro: a 4-stream group mixing non-empty streams
    with streams whose tile has FEWER chunks than the group max (incl.
    count=0, never DMA'd). The skipped streams' scratch slots were read
    uninitialized — NaN-filled under interpret, stale garbage on real TPU
    — and `0 * NaN` leaked NaN into the whole tile's color/normal
    accumulators. The kernel must zero skipped slots: output finite,
    empty tile == pure background, parity with the dense oracle.
    (70,2,1,0) additionally covers the PARTIAL case: stream 0 spans two
    K=64 chunks while streams 1-2 exhaust after chunk 0."""
    cam, prep, _ = _quadrant_scene(counts)
    n = prep.depth.shape[0]
    means2d = jnp.zeros((n, 2))
    bg = jnp.array([0.15, 0.25, 0.35])
    out = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                          interpret=True)
    img = np.asarray(out["image"])
    am = np.asarray(out["allmap"])
    assert np.isfinite(img).all(), "NaN/inf in image (uninit-VMEM read)"
    assert np.isfinite(am).all(), "NaN/inf in allmap (uninit-VMEM read)"
    # the empty bottom-right tile is exactly background
    np.testing.assert_array_equal(
        img[:, 16:, 16:], np.broadcast_to(
            np.asarray(bg)[:, None, None], (3, 16, 16)))
    ref = rasterize_pixels(prep, means2d, bg, cam.width, cam.height, chunk=8)
    _assert_close_modulo_binning(out, ref)


@pytest.mark.slow
def test_empty_and_short_streams_backward_regression(rng):
    """Backward companion of the uninit-VMEM regression: gradients through
    a group with empty + short + 2-chunk streams must be finite and match
    the dense oracle (the reverse walk starts at the group-max chunk, so
    short streams are read-before-written there too)."""
    cam, prep0, arrays = _quadrant_scene((70, 2, 1, 0))
    xyz, scales, quats, opac, shs = arrays
    n = xyz.shape[0]
    target = jnp.asarray(np.random.default_rng(3).random(
        (3, cam.height, cam.width)).astype(np.float32))
    bg = jnp.array([0.1, 0.1, 0.1])

    def loss(backend, xyz, scales, opac, means2d):
        prep = raster_common.preprocess(xyz, scales, quats, opac, shs,
                                        jnp.ones(n, bool), cam.params(),
                                        sh_degree=0)
        if backend == "pallas":
            out = rasterize_tiled(prep, means2d, bg, cam.width, cam.height,
                                  interpret=True)
        else:
            out = rasterize_pixels(prep, means2d, bg, cam.width, cam.height,
                                   chunk=8)
        am = out["allmap"]
        return (jnp.sum((out["image"] - target) ** 2)
                + 0.05 * jnp.sum(am[6]) + 0.01 * jnp.sum(am[0])
                + 0.01 * jnp.sum(am[2:5] ** 2) + 0.02 * jnp.sum(am[5])
                + 0.01 * jnp.sum(am[1]))

    means2d = jnp.zeros((n, 2))
    args = (xyz, scales, opac, means2d)
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2, 3))(*args)
    g_ref = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 2, 3))(*args)
    for nm, gr, gp in zip(["xyz", "scales", "opac", "means2d"], g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert np.isfinite(gp).all(), f"non-finite pallas grad: {nm}"
        sc = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gp, gr, atol=3e-3 * sc, rtol=2e-2,
                                   err_msg=f"grad mismatch: {nm}")
