"""Exactness tests for the per-(splat, tile) conic cull in _binning.

The cull's contract (raster_pallas._binning): a culled pair has
alpha < ALPHA_EPS at EVERY pixel of its tile, so removing it changes no
output and no gradient. Verified brute-force: every pair present in the
un-culled kernel lists but absent from the culled ones is re-evaluated
with the kernel's own per-pixel geometry (_geom) over all its tile's
pixels. Reference parity contract: CUDA bins the full isotropic square
(rasterize_points.cu); like the tight-rect footprint, the cull only
removes pairs the reference pays for but which composite to zero.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # brute-force per-pair cull verification — run via the full suite


from gaussmart_tpu.render import raster_common
from gaussmart_tpu.render.raster_common import ALPHA_EPS, NEAR_PLANE
from gaussmart_tpu.render.raster_pallas import (TILE, _binning, _geom,
                                                rasterize_tiled)
from gaussmart_tpu.render.raster_dense import rasterize_pixels
from gaussmart_tpu.ops.sh import rgb2sh
from test_raster import make_camera


def _adversarial_prep(n, cam, seed=0, behind_frac=0.1):
    """Splats stressing the cull: anisotropic scales over 3 decades, random
    orientations (incl. near-edge-on), opacities from sub-eps to opaque,
    some behind the camera / off screen."""
    rng = np.random.default_rng(seed)
    xyz = np.stack([rng.uniform(-1.5, 1.5, n), rng.uniform(-1.2, 1.2, n),
                    rng.uniform(0.8, 6.0, n)], 1).astype(np.float32)
    behind = rng.random(n) < behind_frac
    xyz[behind, 2] = -np.abs(xyz[behind, 2])
    scales = np.exp(rng.uniform(np.log(5e-3), np.log(1.2),
                                (n, 2))).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = np.concatenate([
        rng.uniform(0.001, 0.01, n // 4),     # sub/near ALPHA_EPS
        rng.uniform(0.01, 0.2, n // 4),
        rng.uniform(0.2, 0.99, n - 2 * (n // 4))]).astype(np.float32)
    rng.shuffle(opac)
    shs = rgb2sh(rng.random((n, 1, 3)).astype(np.float32))
    return raster_common.preprocess(
        jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
        jnp.asarray(opac), jnp.asarray(shs), jnp.ones(n, bool),
        cam.params(), sh_degree=0)


def _pair_sets(prep, tiles_x, tiles_y, budget, conic_cull):
    idx, starts, counts, order, nd, _ws = jax.jit(
        _binning, static_argnums=(1, 2, 3, 6),
        static_argnames=("conic_cull",))(
            prep, tiles_x, tiles_y, budget, conic_cull=conic_cull)
    assert int(nd) == 0, "test scene must fit the duplicate budget"
    idx, starts, counts = map(np.asarray, (idx, starts, counts))
    pairs = set()
    for t in range(tiles_x * tiles_y):
        for s in idx[starts[t]:starts[t] + counts[t]]:
            pairs.add((int(s), t))
    return pairs


def test_culled_pairs_composite_zero(rng):
    w = h = 128
    cam = make_camera(width=w, height=h)
    prep = _adversarial_prep(400, cam, seed=1)
    tiles_x = tiles_y = 2 * (-(-w // 32))
    full = _pair_sets(prep, tiles_x, tiles_y, 64, conic_cull=False)
    kept = _pair_sets(prep, tiles_x, tiles_y, 64, conic_cull=True)
    assert kept <= full, "cull must only remove pairs"
    culled = full - kept
    # the scene must actually exercise the cull
    assert len(culled) > 0.03 * len(full), (len(culled), len(full))

    T9 = np.asarray(prep.T).reshape(-1, 9)
    c2d = np.asarray(prep.center2d)
    op = np.asarray(prep.opacity)
    yy, xx = np.mgrid[0:TILE, 0:TILE]
    for s, t in sorted(culled):
        tx, ty = t % tiles_x, t // tiles_x
        px = jnp.asarray((tx * TILE + xx).astype(np.float32))
        py = jnp.asarray((ty * TILE + yy).astype(np.float32))
        scal = [jnp.float32(v) for v in T9[s]] + [
            jnp.float32(c2d[s, 0]), jnp.float32(c2d[s, 1]),
            jnp.float32(0.0), jnp.float32(0.0)]
        rho, depth = _geom(scal, px, py)
        alpha = np.array(op[s] * jnp.exp(-0.5 * rho))
        alpha[np.asarray(depth) < NEAR_PLANE] = 0.0
        assert alpha.max() < ALPHA_EPS, (
            f"culled pair (splat {s}, tile {t}) has max alpha "
            f"{alpha.max():.6f} >= ALPHA_EPS")


def test_cull_on_off_outputs_match(rng):
    w, h = 96, 64
    cam = make_camera(width=w, height=h)
    prep = _adversarial_prep(250, cam, seed=2, behind_frac=0.0)
    n = prep.depth.shape[0]
    means2d = jnp.zeros((n, 2))
    bg = jnp.array([0.2, 0.3, 0.4])
    on = rasterize_tiled(prep, means2d, bg, w, h, max_dup=64, interpret=True,
                         conic_cull=True)
    off = rasterize_tiled(prep, means2d, bg, w, h, max_dup=64, interpret=True,
                          conic_cull=False)
    assert int(on["n_dropped"]) == 0 and int(off["n_dropped"]) == 0
    # culled pairs are exact no-ops; only their slot shifts in the unrolled
    # walk can perturb FMA contraction, which shows up (barely) in the
    # cancellation-built dist channel alone (see test_tight_footprint)
    np.testing.assert_array_equal(np.asarray(on["image"]),
                                  np.asarray(off["image"]))
    np.testing.assert_array_equal(np.asarray(on["allmap"][:6]),
                                  np.asarray(off["allmap"][:6]))
    np.testing.assert_allclose(np.asarray(on["allmap"][6]),
                               np.asarray(off["allmap"][6]),
                               atol=1e-7, rtol=5e-3)


def test_cull_dense_oracle_parity_and_grads(rng):
    """End-to-end parity of the culled Pallas path vs the dense oracle,
    values and gradients, on the adversarial scene."""
    w, h = 96, 64
    cam = make_camera(width=w, height=h)
    rngn = np.random.default_rng(5)
    n = 200
    xyz = np.stack([rngn.uniform(-1, 1, n), rngn.uniform(-0.8, 0.8, n),
                    rngn.uniform(1.5, 5.0, n)], 1).astype(np.float32)
    scales = np.exp(rngn.uniform(np.log(0.01), np.log(0.3),
                                 (n, 2))).astype(np.float32)
    quats = rngn.normal(size=(n, 4)).astype(np.float32)
    opac = rngn.uniform(0.05, 0.95, n).astype(np.float32)
    shs = rgb2sh(rngn.random((n, 1, 3)).astype(np.float32))
    target = jnp.asarray(rngn.random((3, h, w)).astype(np.float32))
    bg = jnp.array([0.1, 0.2, 0.3])

    def loss(backend, xyz, scales, opac):
        prep = raster_common.preprocess(
            xyz, scales, jnp.asarray(quats), opac, jnp.asarray(shs),
            jnp.ones(n, bool), cam.params(), sh_degree=0)
        if backend == "pallas":
            out = rasterize_tiled(prep, jnp.zeros((n, 2)), bg, w, h,
                                  max_dup=64, interpret=True)
        else:
            out = rasterize_pixels(prep, jnp.zeros((n, 2)), bg, w, h, chunk=8)
        am = out["allmap"]
        return (jnp.sum((out["image"] - target) ** 2)
                + 0.03 * jnp.sum(am[6]) + 0.01 * jnp.sum(am[0])
                + 0.01 * jnp.sum(am[2:5] ** 2) + 0.02 * jnp.sum(am[5]))

    args = (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(opac))
    g_pal = jax.grad(lambda *a: loss("pallas", *a), argnums=(0, 1, 2))(*args)
    g_ref = jax.grad(lambda *a: loss("dense", *a), argnums=(0, 1, 2))(*args)
    for nm, gr, gp in zip(["xyz", "scales", "opac"], g_ref, g_pal):
        gr, gp = np.asarray(gr), np.asarray(gp)
        assert np.isfinite(gp).all()
        sc = np.abs(gr).max() + 1e-6
        np.testing.assert_allclose(gp, gr, atol=3e-3 * sc, rtol=2e-2,
                                   err_msg=f"grad mismatch: {nm}")
