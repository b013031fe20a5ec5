"""Manual geometry VJP vs jax.vjp of the same forward, field by field."""
import numpy as np
import jax
import jax.numpy as jnp

from gaussmart_tpu.render.raster_pallas import (_alpha_from, _geom_fwd_res,
                                                _geom_manual_bwd)


def test_manual_vjp_matches_autodiff(rng):
    px, py = jnp.meshgrid(jnp.arange(8.0), jnp.arange(16.0), indexing="ij")
    px = px.reshape(8, 16)
    py = py.reshape(8, 16)

    for trial in range(8):
        # random but geometrically sane T: small splat near the grid
        scal = rng.normal(0, 1.0, 13).astype(np.float32)
        scal[2] = rng.uniform(0.5, 2)     # Tw components keep depth positive
        scal[5] = rng.uniform(-0.5, 0.5)
        scal[8] = rng.uniform(2.0, 5.0)   # center depth
        scal[9] = rng.uniform(2, 12)      # cx
        scal[10] = rng.uniform(2, 12)     # cy
        scal[11:13] = rng.normal(0, 0.1, 2)
        opacity = np.float32(rng.uniform(0.3, 0.95))
        ca = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))
        cd = jnp.asarray(rng.normal(size=(8, 16)).astype(np.float32))

        def fwd(s, o):
            return _alpha_from(s, o, px, py)

        (alpha, depth), vjp = jax.vjp(fwd, jnp.asarray(scal), opacity)
        # zero cotangents where gated off (matches kernel masking)
        live = alpha > 0
        ca_m = jnp.where(live, ca, 0.0)
        cd_m = jnp.where(live, cd, 0.0)
        g_ref, gop_ref = vjp((ca_m, cd_m))

        res = _geom_fwd_res(jnp.asarray(scal), opacity, px, py)
        gfields, gop_f = _geom_manual_bwd(res, opacity, ca_m, cd_m)
        g_man = np.array([float(jnp.sum(f)) for f in gfields])
        gop_man = float(jnp.sum(gop_f))

        scale = np.abs(np.asarray(g_ref)).max() + 1e-3
        np.testing.assert_allclose(g_man, np.asarray(g_ref),
                                   atol=2e-3 * scale, rtol=1e-3,
                                   err_msg=f"trial {trial}")
        np.testing.assert_allclose(gop_man, float(gop_ref),
                                   atol=2e-3 * max(1.0, abs(float(gop_ref))))
