"""Sparse-aware Adam for the Gaussian parameter groups.

Mirrors the reference optimizer contract (gaussian_model.py:277-303,
398-468): per-group learning rates (xyz on the Plenoxels log-lerp schedule,
f_rest at feature_lr/20), Adam(beta=(0.9, 0.999), eps=1e-15), and explicit
moment "surgery" — zero moments for newly allocated splats, zeroed opacity
moments on opacity reset. Implemented as a pure function over a pytree so
the whole update lives inside the jitted train step; inactive capacity slots
are masked out of the update.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict

import jax
import jax.numpy as jnp

from gaussmart_tpu.models.gaussians import GaussianParams
from gaussmart_tpu.transforms import exponential_lr

BETA1 = 0.9
BETA2 = 0.999
EPS = 1e-15


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class AdamState:
    mu: GaussianParams
    nu: GaussianParams
    step: jnp.ndarray  # scalar int32 (groups always step together)


def init_adam(params: GaussianParams) -> AdamState:
    zeros = jax.tree.map(jnp.zeros_like, params)
    return AdamState(mu=zeros, nu=jax.tree.map(jnp.zeros_like, params),
                     step=jnp.zeros((), jnp.int32))


def group_lrs(opt_cfg, iteration, spatial_lr_scale: float) -> Dict[str, Any]:
    """Per-leaf learning rates; `iteration` may be traced
    (gaussian_model.py:282-295 group table + the xyz schedule)."""
    xyz_lr = exponential_lr(
        iteration,
        lr_init=opt_cfg.position_lr_init * spatial_lr_scale,
        lr_final=opt_cfg.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_cfg.position_lr_delay_mult,
        max_steps=opt_cfg.position_lr_max_steps,
    )
    return dict(
        xyz=xyz_lr,
        features_dc=opt_cfg.feature_lr,
        features_rest=opt_cfg.feature_lr / 20.0,
        opacity=opt_cfg.opacity_lr,
        scaling=opt_cfg.scaling_lr,
        rotation=opt_cfg.rotation_lr,
    )


def adam_step(params: GaussianParams, grads: GaussianParams, state: AdamState,
              lrs: Dict[str, Any], active: jnp.ndarray):
    """One masked Adam step. `active` is the [C] live-splat mask; inactive
    slots keep params and moments untouched."""
    step = state.step + 1
    t = step.astype(jnp.float32)
    bc1 = 1.0 - BETA1**t
    bc2 = 1.0 - BETA2**t

    def upd(name):
        p = getattr(params, name)
        g = getattr(grads, name)
        m = getattr(state.mu, name)
        v = getattr(state.nu, name)
        mask = active.reshape((-1,) + (1,) * (p.ndim - 1)).astype(p.dtype)
        m_new = BETA1 * m + (1 - BETA1) * g
        v_new = BETA2 * v + (1 - BETA2) * g * g
        update = lrs[name] * (m_new / bc1) / (jnp.sqrt(v_new / bc2) + EPS)
        return (p - mask * update,
                jnp.where(mask > 0, m_new, m),
                jnp.where(mask > 0, v_new, v))

    names = [f.name for f in dataclasses.fields(GaussianParams)]
    out = {n: upd(n) for n in names}
    new_params = GaussianParams(**{n: out[n][0] for n in names})
    new_mu = GaussianParams(**{n: out[n][1] for n in names})
    new_nu = GaussianParams(**{n: out[n][2] for n in names})
    return new_params, AdamState(mu=new_mu, nu=new_nu, step=step)


def zero_moments_at(state: AdamState, slot_mask: jnp.ndarray) -> AdamState:
    """Zero Adam moments at the given [C] slots (densify-alloc surgery,
    gaussian_model.py:456-457)."""
    def z(a):
        mask = slot_mask.reshape((-1,) + (1,) * (a.ndim - 1))
        return jnp.where(mask, 0.0, a)

    return AdamState(mu=jax.tree.map(z, state.mu),
                     nu=jax.tree.map(z, state.nu), step=state.step)


def zero_group_moments(state: AdamState, name: str) -> AdamState:
    """Zero the full moment tensors of one group (opacity-reset surgery,
    gaussian_model.py:398-411)."""
    mu = dataclasses.replace(state.mu, **{name: jnp.zeros_like(getattr(state.mu, name))})
    nu = dataclasses.replace(state.nu, **{name: jnp.zeros_like(getattr(state.nu, name))})
    return AdamState(mu=mu, nu=nu, step=state.step)
