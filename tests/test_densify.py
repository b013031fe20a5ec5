"""Fixed-capacity densify/prune behavior (reference gaussian_model.py:431-549)."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from gaussmart_tpu.models.gaussians import init_from_pcd
from gaussmart_tpu.models.densify import (add_densification_stats,
                                          densify_and_prune, reset_opacity)
from gaussmart_tpu.optim import init_adam
from gaussmart_tpu.transforms import inverse_sigmoid


def make_state(n=8, capacity=64, rng=None):
    rng = rng or np.random.default_rng(0)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    return init_from_pcd(pts, cols, None, max_sh_degree=1,
                         spatial_lr_scale=1.0, capacity=capacity)


def test_stats_accumulate():
    state = make_state()
    grads = jnp.ones((state.capacity, 2)) * 3.0
    radii = jnp.where(jnp.arange(state.capacity) < 4, 5.0, 0.0)
    aux = add_densification_stats(state.aux, grads, radii)
    g = np.asarray(aux.grad_accum)
    np.testing.assert_allclose(g[:4], np.sqrt(18.0), rtol=1e-6)
    assert (g[4:] == 0).all()
    assert np.asarray(aux.denom)[:4].sum() == 4
    assert np.asarray(aux.max_radii2d)[:4].max() == 5.0


def test_clone_small_splats():
    state = make_state(n=8)
    adam = init_adam(state.params)
    # small scales => clone path; set grads above threshold for first 3
    aux = state.aux
    aux = dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum.at[:3].set(10.0),
        denom=aux.denom.at[:8].set(1.0))
    state = state.replace(
        params=dataclasses.replace(state.params,
                                   scaling=state.params.scaling.at[:].set(-5.0)),
        aux=aux)
    n_before = int(state.n_active)
    state2, adam2, dropped = densify_and_prune(
        state, adam, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
        extent=1.0, percent_dense=0.01, use_size_prune=False)
    assert int(state2.n_active) == n_before + 3
    assert int(dropped) == 0
    # clones inherit source position
    xyz = np.asarray(state2.params.xyz)
    active = np.asarray(state2.aux.active)
    src = xyz[:3]
    new_rows = xyz[8:][active[8:]][:3]
    assert all(any(np.allclose(r, s) for s in src) for r in new_rows)


def test_split_large_splats():
    state = make_state(n=8)
    adam = init_adam(state.params)
    aux = dataclasses.replace(
        state.aux,
        grad_accum=state.aux.grad_accum.at[:2].set(10.0),
        denom=state.aux.denom.at[:8].set(1.0))
    # large scales => split path
    state = state.replace(
        params=dataclasses.replace(state.params,
                                   scaling=state.params.scaling.at[:].set(0.0)),
        aux=aux)
    n_before = int(state.n_active)
    state2, _, dropped = densify_and_prune(
        state, adam, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
        extent=1.0, percent_dense=0.01, use_size_prune=False)
    # 2 sources died, 4 children born
    assert int(state2.n_active) == n_before - 2 + 4
    assert int(dropped) == 0
    # children scales shrunk by 0.8*N
    s_child = np.exp(np.asarray(state2.params.scaling))
    active = np.asarray(state2.aux.active)
    children = s_child[8:][active[8:]]
    np.testing.assert_allclose(children, 1.0 / 1.6, rtol=1e-5)
    # sources inactive
    assert not active[0] and not active[1]


def test_prune_by_opacity():
    state = make_state(n=8)
    adam = init_adam(state.params)
    op = state.params.opacity.at[:4].set(inverse_sigmoid(jnp.asarray(0.001)))
    state = state.replace(params=dataclasses.replace(state.params, opacity=op),
                          aux=dataclasses.replace(state.aux,
                                                  denom=state.aux.denom.at[:8].set(1.0)))
    state2, _, _ = densify_and_prune(
        state, adam, jax.random.PRNGKey(0), max_grad=1e9, min_opacity=0.005,
        extent=1.0, percent_dense=0.01, use_size_prune=False)
    active = np.asarray(state2.aux.active)
    assert not active[:4].any()
    assert active[4:8].all()


def test_capacity_overflow_drops():
    state = make_state(n=8, capacity=9)   # only 1 free slot
    adam = init_adam(state.params)
    aux = dataclasses.replace(
        state.aux,
        grad_accum=state.aux.grad_accum.at[:4].set(10.0),
        denom=state.aux.denom.at[:8].set(1.0))
    state = state.replace(
        params=dataclasses.replace(state.params,
                                   scaling=state.params.scaling.at[:].set(-5.0)),
        aux=aux)
    state2, _, dropped = densify_and_prune(
        state, adam, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
        extent=1.0, percent_dense=0.01, use_size_prune=False)
    assert int(dropped) == 3          # wanted 4 clones, placed 1
    assert int(state2.n_active) == 9


def test_new_slots_get_zero_moments():
    state = make_state(n=8)
    adam = init_adam(state.params)
    adam = jax.tree.map(lambda a: a + 1.0 if a.ndim > 0 else a, adam)
    aux = dataclasses.replace(
        state.aux,
        grad_accum=state.aux.grad_accum.at[:1].set(10.0),
        denom=state.aux.denom.at[:8].set(1.0))
    state = state.replace(
        params=dataclasses.replace(state.params,
                                   scaling=state.params.scaling.at[:].set(-5.0)),
        aux=aux)
    state2, adam2, _ = densify_and_prune(
        state, adam, jax.random.PRNGKey(0), max_grad=1.0, min_opacity=0.005,
        extent=1.0, percent_dense=0.01, use_size_prune=False)
    new_slot = np.asarray(state2.aux.active)[8:].argmax() + 8
    assert np.asarray(adam2.mu.xyz)[new_slot].sum() == 0
    assert np.asarray(adam2.mu.xyz)[0].sum() != 0


def test_reset_opacity_clamps_and_zeroes_moments():
    state = make_state(n=8)
    adam = init_adam(state.params)
    adam = jax.tree.map(lambda a: a + 1.0 if a.ndim > 0 else a, adam)
    state2, adam2 = reset_opacity(state, adam)
    op = jax.nn.sigmoid(state2.params.opacity)
    assert float(op.max()) <= 0.0101
    assert float(jnp.abs(adam2.mu.opacity).sum()) == 0
    assert float(jnp.abs(adam2.mu.xyz).sum()) != 0
