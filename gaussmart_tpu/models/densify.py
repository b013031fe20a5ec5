"""Adaptive density control under static shapes.

Behavior parity with reference gaussian_model.py:431-553 (clone / split /
prune + Adam-state surgery + stat resets), re-designed for XLA: the
reference concatenates/slices tensors, which changes shapes; here splats
live in a fixed-capacity arena with an `active` mask. Densify allocates
free slots via a size-bounded `jnp.nonzero` and masked scatters (static
shapes, `mode="drop"` for overflow), prune clears mask bits. The whole
update is one jitted function — no recompiles across the training run.

Faithfully kept quirks (SURVEY.md §7):
 * split children sample a zero third axis (surfel), scales /(0.8*N);
 * `max_radii2d` is reset to zero before the size-prune reads it, so the
   view-space size prune never fires (inherited 3DGS behavior);
 * densification stats reset to zero after every densify call.
"""
from __future__ import annotations

import dataclasses
from typing import Tuple

import jax
import jax.numpy as jnp

from gaussmart_tpu.models.gaussians import GaussianAux, GaussianParams, GaussianState
from gaussmart_tpu.optim import AdamState, zero_moments_at
from gaussmart_tpu.transforms import quat_to_rotmat

SPLIT_N = 2  # reference N=2 (gaussian_model.py:492)


def add_densification_stats(aux: GaussianAux, means2d_grad: jnp.ndarray,
                            radii: jnp.ndarray) -> GaussianAux:
    """train.py:199-203: accumulate ||screen-grad|| and radii for visible
    splats (visibility = radii > 0)."""
    visible = radii > 0
    gnorm = jnp.linalg.norm(means2d_grad, axis=-1)
    return dataclasses.replace(
        aux,
        grad_accum=aux.grad_accum + jnp.where(visible, gnorm, 0.0),
        denom=aux.denom + visible.astype(jnp.float32),
        max_radii2d=jnp.where(visible, jnp.maximum(aux.max_radii2d, radii),
                              aux.max_radii2d),
    )


def _scatter_rows(params: GaussianParams, src_idx: jnp.ndarray,
                  dst_idx: jnp.ndarray, transform=None) -> GaussianParams:
    """Copy rows src->dst across all leaves; dst >= capacity rows drop."""
    C = params.xyz.shape[0]
    safe_src = jnp.clip(src_idx, 0, C - 1)

    def one(leaf, name):
        rows = leaf[safe_src]
        if transform is not None:
            rows = transform(name, rows)
        return leaf.at[dst_idx].set(rows, mode="drop")

    return GaussianParams(**{
        f.name: one(getattr(params, f.name), f.name)
        for f in dataclasses.fields(GaussianParams)})


def densify_and_prune(
    state: GaussianState,
    adam: AdamState,
    key: jax.Array,
    *,
    max_grad: float,
    min_opacity: float,
    extent: float,
    percent_dense: float,
    use_size_prune: bool,
) -> Tuple[GaussianState, AdamState, jnp.ndarray]:
    """One densify+prune pass. Returns (state, adam, n_dropped_for_capacity)."""
    params, aux = state.params, state.aux
    C = state.capacity

    grads = aux.grad_accum / jnp.maximum(aux.denom, 1.0)
    grads = jnp.nan_to_num(grads, nan=0.0)
    scaling = jnp.exp(params.scaling)
    max_scale = scaling.max(axis=-1)

    grad_ok = (grads >= max_grad) & aux.active
    clone_mask = grad_ok & (max_scale <= percent_dense * extent)
    split_mask = grad_ok & (max_scale > percent_dense * extent)

    free = jnp.nonzero(~aux.active, size=C, fill_value=C)[0]
    clone_src = jnp.nonzero(clone_mask, size=C, fill_value=C)[0]
    split_src = jnp.nonzero(split_mask, size=C, fill_value=C)[0]
    n_clone = clone_mask.sum()
    n_split = split_mask.sum()

    # --- clones: copy params verbatim into free slots --------------------
    idx = jnp.arange(C)
    clone_dst = jnp.where(clone_src < C, free, C)  # free[i] already C if none
    params = _scatter_rows(params, clone_src, clone_dst)

    # --- splits: N children, sampled in the splat's tangent frame --------
    # (gaussian_model.py:501-507): offsets ~ N(0, diag(s_u, s_v, 0)),
    # child scales = s / (0.8 * N); the source splat is pruned.
    safe_split = jnp.clip(split_src, 0, C - 1)
    child_dst = []
    for j in range(SPLIT_N):
        slot = n_clone + SPLIT_N * idx + j
        dst = jnp.where((split_src < C) & (slot < C),
                        free[jnp.clip(slot, 0, C - 1)], C)
        child_dst.append(dst)

    R = quat_to_rotmat(params.rotation[safe_split])        # [C,3,3]
    s = scaling[safe_split]                                # [C,2]
    keys = jax.random.split(key, SPLIT_N)
    for j in range(SPLIT_N):
        eps = jax.random.normal(keys[j], (C, 2), jnp.float32)
        local = jnp.concatenate([eps * s, jnp.zeros((C, 1), jnp.float32)], axis=1)
        offset = jnp.einsum("nij,nj->ni", R, local)

        def transform(name, rows, offset=offset):
            if name == "xyz":
                return rows + offset
            if name == "scaling":
                return jnp.log(jnp.exp(rows) / (0.8 * SPLIT_N))
            return rows

        params = _scatter_rows(params, split_src, child_dst[j], transform)

    # --- activity update --------------------------------------------------
    newly_alloc = jnp.zeros(C, bool)
    for dst in [clone_dst] + child_dst:
        newly_alloc = newly_alloc.at[dst].set(True, mode="drop")
    active = (aux.active | newly_alloc) & ~split_mask      # split sources die

    # segments propagate to children/clones
    segments = aux.segments
    for src, dst in [(clone_src, clone_dst)] + [(split_src, d) for d in child_dst]:
        segments = segments.at[dst].set(segments[jnp.clip(src, 0, C - 1)],
                                        mode="drop")

    # --- prune (opacity + optional size) on the post-densify population ---
    opacity = jax.nn.sigmoid(params.opacity[:, 0])
    prune = opacity < min_opacity
    if use_size_prune:
        # max_radii2d was just conceptually reset (postfix), so the
        # view-space branch is inert — kept for parity (SURVEY.md §7.5,14).
        big_ws = jnp.exp(params.scaling).max(axis=-1) > 0.1 * extent
        prune = prune | big_ws
    active = active & ~prune

    # --- bookkeeping: fresh moments for new slots, stats reset ------------
    adam = zero_moments_at(adam, newly_alloc)
    aux = GaussianAux(
        active=active,
        segments=segments,
        max_radii2d=jnp.zeros(C, jnp.float32),
        grad_accum=jnp.zeros(C, jnp.float32),
        denom=jnp.zeros(C, jnp.float32),
    )

    wanted = n_clone + SPLIT_N * n_split
    placed = newly_alloc.sum()
    n_dropped = wanted - placed
    return state.replace(params=params, aux=aux), adam, n_dropped


def reset_opacity(state: GaussianState, adam: AdamState) -> Tuple[GaussianState, AdamState]:
    """Clamp opacity to <= 0.01 and zero its Adam moments
    (gaussian_model.py:344-347 + replace_tensor_to_optimizer)."""
    from gaussmart_tpu.optim import zero_group_moments
    from gaussmart_tpu.transforms import inverse_sigmoid

    op = jax.nn.sigmoid(state.params.opacity)
    new_op = inverse_sigmoid(jnp.minimum(op, 0.01))
    params = dataclasses.replace(state.params, opacity=new_op)
    return state.replace(params=params), zero_group_moments(adam, "opacity")
