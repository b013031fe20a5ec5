"""Full train-step parity: Pallas backend vs dense backend."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gaussmart_tpu.config import OptimizationParams
from gaussmart_tpu.models.gaussians import init_from_pcd, grow_capacity
from gaussmart_tpu.optim import init_adam
from gaussmart_tpu.train_lib import make_train_step

from test_train_smoke import make_cameras
import pytest

pytestmark = pytest.mark.slow  # whole-train-step interpret-mode parity — run via the full suite



def test_train_step_backend_parity(rng):
    n = 20
    pts = np.stack([rng.uniform(-0.6, 0.6, n), rng.uniform(-0.6, 0.6, n),
                    rng.uniform(2.5, 4.0, n)], axis=1).astype(np.float32)
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=1, spatial_lr_scale=1.0, capacity=64)
    state = state.replace(params=dataclasses.replace(
        state.params, scaling=state.params.scaling.at[:n].set(np.log(0.2))))
    cam = make_cameras(1, width=32, height=32)[0]
    gt = jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
    opt = OptimizationParams(lambda_dist=0.1)

    outs = {}
    for backend in ("dense", "pallas"):
        step = make_train_step(opt, sh_degree=1, white_background=False,
                               backend=backend, spatial_lr_scale=1.0,
                               donate=False)
        params, adam, aux, metrics, _ = step(
            state.params, init_adam(state.params), state.aux, cam.params(),
            gt, jnp.asarray(8000, jnp.int32))  # all reg terms active
        outs[backend] = (params, aux, metrics)

    p_d, a_d, m_d = outs["dense"]
    p_p, a_p, m_p = outs["pallas"]
    assert abs(float(m_d.total) - float(m_p.total)) < 2e-4
    np.testing.assert_allclose(np.asarray(p_p.xyz), np.asarray(p_d.xyz),
                               atol=2e-4)
    np.testing.assert_allclose(np.asarray(p_p.opacity),
                               np.asarray(p_d.opacity), atol=2e-4)
    # densification stats (screen-space grads) agree
    np.testing.assert_allclose(np.asarray(a_p.grad_accum),
                               np.asarray(a_d.grad_accum), atol=1e-4,
                               rtol=0.05)


def test_grow_capacity_preserves_and_extends(rng):
    n = 10
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=1, spatial_lr_scale=1.0, capacity=16)
    adam = init_adam(state.params)
    grown = grow_capacity(state, 64)
    assert grown.capacity == 64
    assert int(grown.n_active) == n
    np.testing.assert_allclose(np.asarray(grown.params.xyz[:16]),
                               np.asarray(state.params.xyz))
    assert not np.asarray(grown.aux.active[16:]).any()

    from gaussmart_tpu.train import _grow
    g2, adam2 = _grow(state, adam)
    assert g2.capacity == 32
    assert adam2.mu.xyz.shape[0] == 32
