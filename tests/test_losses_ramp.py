"""lambda_dist ramp extension (OptimizationParams.lambda_dist_ramp)."""
import jax.numpy as jnp

from gaussmart_tpu.losses import regularization_losses

PKG = {"rend_dist": jnp.ones((16,)),
       "rend_normal": jnp.ones((3, 16)), "surf_normal": jnp.ones((3, 16))}


def dist_at(it, **kw):
    d, _ = regularization_losses(PKG, it, 1000.0, 0.0, **kw)
    return float(d)


def test_reference_step_gate_default():
    assert dist_at(3000) == 0.0
    assert dist_at(3001) == 1000.0


def test_linear_ramp():
    assert dist_at(3000, lambda_dist_ramp=7000) == 0.0
    assert abs(dist_at(6500, lambda_dist_ramp=7000) - 500.0) < 1e-3
    assert dist_at(10000, lambda_dist_ramp=7000) == 1000.0
    assert dist_at(30000, lambda_dist_ramp=7000) == 1000.0


def test_dist_clip():
    import numpy as np
    pkg = dict(PKG, rend_dist=jnp.full((16,), 0.02))
    d, _ = regularization_losses(pkg, 20000, 1000.0, 0.0,
                                 lambda_dist_clip=0.002)
    assert abs(float(d) - 2.0) < 1e-5          # 1000 * min(0.02, 0.002)
    d2, _ = regularization_losses(pkg, 20000, 1000.0, 0.0)
    assert abs(float(d2) - 20.0) < 1e-4        # unclipped reference path
    # clip leaves sub-threshold views untouched
    pkg3 = dict(PKG, rend_dist=jnp.full((16,), 1e-4))
    d3, _ = regularization_losses(pkg3, 20000, 1000.0, 0.0,
                                  lambda_dist_clip=0.002)
    assert abs(float(d3) - 0.1) < 1e-5
