import numpy as np
import jax.numpy as jnp

from gaussmart_tpu.ops.sh import eval_sh, rgb2sh, sh2rgb, SH_C0


def _ref_eval_sh_deg1(sh, d):
    """Independent hand-written degree-1 evaluation for cross-checking."""
    C1 = 0.4886025119029199
    return (SH_C0 * sh[..., 0] - C1 * d[1] * sh[..., 1]
            + C1 * d[2] * sh[..., 2] - C1 * d[0] * sh[..., 3])


def test_deg0_is_constant(rng):
    sh = rng.normal(size=(7, 3, 1)).astype(np.float32)
    dirs = rng.normal(size=(7, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    out = eval_sh(0, jnp.asarray(sh), jnp.asarray(dirs))
    np.testing.assert_allclose(out, SH_C0 * sh[..., 0], rtol=1e-6)


def test_deg1_matches_reference_formula(rng):
    sh = rng.normal(size=(5, 3, 4)).astype(np.float32)
    d = np.array([0.3, -0.5, 0.81], np.float32)
    d /= np.linalg.norm(d)
    dirs = np.tile(d, (5, 1))
    out = np.asarray(eval_sh(1, jnp.asarray(sh), jnp.asarray(dirs)))
    expected = _ref_eval_sh_deg1(sh, d)
    np.testing.assert_allclose(out, expected, rtol=1e-5)


def test_higher_degrees_extend_lower(rng):
    """Zeroing the high-order coeffs must reproduce the lower degree."""
    sh = rng.normal(size=(4, 3, 25)).astype(np.float32)
    dirs = rng.normal(size=(4, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
    for deg in (1, 2, 3, 4):
        sh_trunc = sh.copy()
        sh_trunc[..., (deg + 1) ** 2:] = 0
        lo = eval_sh(deg - 1, jnp.asarray(sh_trunc[..., :deg**2]), jnp.asarray(dirs))
        sh_lo_only = sh_trunc.copy()
        sh_lo_only[..., deg**2:] = 0
        hi = eval_sh(deg, jnp.asarray(sh_lo_only), jnp.asarray(dirs))
        np.testing.assert_allclose(np.asarray(hi), np.asarray(lo), rtol=2e-5, atol=1e-6)


def test_rgb_sh_roundtrip(rng):
    rgb = rng.random((10, 3)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(sh2rgb(rgb2sh(rgb))), rgb, atol=1e-6)
