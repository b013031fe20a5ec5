"""Traced SH degree masking == static-degree compilation."""
import numpy as np
import jax.numpy as jnp

from gaussmart_tpu.render import raster_common
from test_raster import make_camera, make_scene


def test_masked_degree_matches_static(rng):
    cam = make_camera()
    n = 10
    xyz, scales, quats, opac, _, _ = make_scene(n, rng)
    shs = jnp.asarray(rng.normal(0, 0.3, (n, 16, 3)).astype(np.float32))
    for deg in range(4):
        static = raster_common.preprocess(
            xyz, scales, quats, opac, shs[:, :(deg + 1) ** 2], jnp.ones(n, bool),
            cam.params(), sh_degree=deg)
        masked = raster_common.preprocess(
            xyz, scales, quats, opac, shs, jnp.ones(n, bool),
            cam.params(), sh_degree=3,
            active_degree=jnp.asarray(deg, jnp.int32))
        np.testing.assert_allclose(np.asarray(masked.color),
                                   np.asarray(static.color), atol=1e-6,
                                   err_msg=f"degree {deg}")
