"""Sorted segment-sum Pallas kernel vs the numpy oracle (interpret mode)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # interpret-mode segsum kernel (opt-in path) — run via the full suite


from gaussmart_tpu.render.segsum_pallas import (ID_LANE, OB,
                                                segment_sum_sorted)

F = 20  # lanes callers actually consume


def embed(rows, ids):
    rows = rows.copy()
    rows[:, ID_LANE] = ids.astype(np.float32)
    return rows


def oracle(rows, ids, n):
    out = np.zeros((n, rows.shape[1]), np.float32)
    for i, r in zip(ids, rows):
        if i < n:
            out[i] += r
    return out


@pytest.mark.parametrize("n_seg,counts", [
    (1, [5]),
    (130, None),          # crosses one block boundary
    (300, None),          # several blocks, ragged tail
])
def test_matches_oracle(rng, n_seg, counts):
    if counts is None:
        counts = rng.integers(0, 9, n_seg)
    ids = np.repeat(np.arange(n_seg, dtype=np.int32), counts)
    # trailing dummies with zero rows
    ids = np.concatenate([ids, np.full(37, n_seg, np.int32)])
    M = ids.size
    rows = rng.standard_normal((M, 128)).astype(np.float32)
    rows = embed(rows, ids)
    rows[ids >= n_seg] = 0.0
    out = segment_sum_sorted(jnp.asarray(rows), jnp.asarray(ids), n_seg,
                             interpret=True)
    assert out.shape[0] % OB == 0 and out.shape[0] >= n_seg
    np.testing.assert_allclose(np.asarray(out)[:n_seg, :F],
                               oracle(rows, ids, n_seg)[:, :F],
                               rtol=1e-5, atol=1e-5)
    # padding segments past n_seg stay zero
    assert np.all(np.asarray(out)[n_seg:, :F] == 0.0)


def test_empty_segments_and_stale_zero_rows(rng):
    # many empty segments interleaved, including whole empty blocks, plus
    # interspersed all-zero rows whose id lane is stale (0), like grad rows
    # the backward kernel never wrote
    ids = np.array([0, 0, 200, 200, 200, 515], np.int32)
    rows = rng.standard_normal((6, 128)).astype(np.float32)
    rows = embed(rows, ids)
    rows[3] = 0.0          # stale zero row: id lane now 0, seg_ids says 200
    out = segment_sum_sorted(jnp.asarray(rows), jnp.asarray(ids), 520,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out)[:520, :F],
                               oracle(rows, ids, 520)[:, :F],
                               rtol=1e-5, atol=1e-5)

    out0 = segment_sum_sorted(jnp.zeros((4, 128), jnp.float32),
                              jnp.full(4, 2 ** 30 - 1, jnp.int32), 64,
                              interpret=True)
    assert np.all(np.asarray(out0) == 0.0)


def test_single_giant_segment(rng):
    # one segment spanning many chunks exercises the fori_loop + DMA overlap
    ids = np.zeros(1200, np.int32)
    rows = embed(rng.standard_normal((1200, 128)).astype(np.float32), ids)
    out = segment_sum_sorted(jnp.asarray(rows), jnp.asarray(ids), 1,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(out)[0, :F], rows.sum(0)[:F],
                               rtol=1e-4, atol=1e-4)


def test_integrated_segsum_grads_match_scatter(tmp_path):
    """The full segsum gradient-reduction chain (inv sort + row gather +
    kernel) matches the scatter reduction through rasterize_tiled's custom
    VJP. Runs in a subprocess: GMT_GRAD_REDUCE is read at import time."""
    import subprocess, sys, os, textwrap
    prog = textwrap.dedent("""
        import os, sys
        sys.path.insert(0, os.getcwd())
        sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
        import numpy as np, jax, jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")
        from test_raster_pallas import prep_scene
        from gaussmart_tpu.render.raster_pallas import rasterize_tiled
        rng = np.random.default_rng(7)
        cam, prep, _ = prep_scene(rng, n=120, width=64, height=64)
        n = prep.depth.shape[0]
        bg = jnp.zeros(3)
        def loss(opac):
            p = prep._replace(opacity=opac)
            out = rasterize_tiled(p, jnp.zeros((n, 2)), bg, 64, 64,
                                  interpret=True)
            return jnp.sum(out["image"]) + jnp.sum(out["allmap"])
        g = jax.grad(loss)(prep.opacity)
        np.save(sys.argv[1], np.asarray(g))
    """)
    outs = {}
    for mode in ("scatter", "segsum"):
        env = dict(os.environ, GMT_GRAD_REDUCE=mode, JAX_PLATFORMS="cpu")
        f = tmp_path / f"g_{mode}.npy"
        subprocess.run([sys.executable, "-c", prog, str(f)], check=True,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
        outs[mode] = np.load(f)
    np.testing.assert_allclose(outs["segsum"], outs["scatter"],
                               rtol=1e-5, atol=1e-6)


def test_integrated_compact_grads_match_scatter(tmp_path):
    """The compact (walked-prefix) gradient reduction matches the full
    scatter through rasterize_tiled's custom VJP — both the fast path and
    the overflow lax.cond fallback (forced with a tiny GMT_COMPACT_CAP).
    Runs in subprocesses: GMT_GRAD_REDUCE is read at import time."""
    import subprocess, sys, os, textwrap
    prog = textwrap.dedent("""
        import os, sys
        sys.path.insert(0, os.getcwd())
        sys.path.insert(0, os.path.join(os.getcwd(), "tests"))
        import numpy as np, jax, jax.numpy as jnp
        jax.config.update("jax_platforms", "cpu")
        from test_raster_pallas import prep_scene
        from gaussmart_tpu.render.raster_pallas import rasterize_tiled
        rng = np.random.default_rng(7)
        cam, prep, _ = prep_scene(rng, n=120, width=64, height=64)
        n = prep.depth.shape[0]
        bg = jnp.zeros(3)
        def loss(opac, T):
            p = prep._replace(opacity=opac, T=T)
            out = rasterize_tiled(p, jnp.zeros((n, 2)), bg, 64, 64,
                                  interpret=True)
            w = jnp.cos(jnp.arange(3) + 1.0)[:, None, None]
            return jnp.sum(out["image"] * w) + jnp.sum(out["allmap"][:6])
        go, gT = jax.grad(loss, argnums=(0, 1))(prep.opacity, prep.T)
        np.savez(sys.argv[1], go=np.asarray(go), gT=np.asarray(gT))
    """)
    outs = {}
    runs = {"scatter": {}, "compact": {}, "compact_fb": {
        "GMT_COMPACT_CAP": "64"}}
    for name, extra in runs.items():
        env = dict(os.environ, GMT_GRAD_REDUCE=name.split("_")[0],
                   JAX_PLATFORMS="cpu", **extra)
        f = tmp_path / f"g_{name}.npz"
        subprocess.run([sys.executable, "-c", prog, str(f)], check=True,
                       env=env, cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
        outs[name] = np.load(f)
    for name in ("compact", "compact_fb"):
        for k in ("go", "gT"):
            np.testing.assert_allclose(outs[name][k], outs["scatter"][k],
                                       rtol=1e-4, atol=1e-4)
