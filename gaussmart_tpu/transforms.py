"""Quaternion / rotation helpers (reference utils/general_utils.py:78-110).

Quaternions are (w, x, y, z); build_rotation normalizes first.
"""
from __future__ import annotations

import jax.numpy as jnp


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w,x,y,z) -> [..., 3, 3], normalizing the quaternion."""
    ss = jnp.sum(q * q, axis=-1, keepdims=True)
    q = q / jnp.sqrt(jnp.where(ss > 1e-12, ss, 1.0))
    r, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    R = jnp.stack([
        1 - 2 * (y * y + z * z), 2 * (x * y - r * z), 2 * (x * z + r * y),
        2 * (x * y + r * z), 1 - 2 * (x * x + z * z), 2 * (y * z - r * x),
        2 * (x * z - r * y), 2 * (y * z + r * x), 1 - 2 * (x * x + y * y),
    ], axis=-1)
    return R.reshape(q.shape[:-1] + (3, 3))


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def safe_normalize(x: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """L2-normalize with NaN-free gradients at ||x|| == 0.

    `x / norm.clip(eps)` still produces NaN cotangents at zero vectors
    (d||x||/dx is 0/0 there); guard the squared sum *before* the sqrt.
    """
    ss = jnp.sum(x * x, axis=axis, keepdims=True)
    good = ss > eps
    norm = jnp.sqrt(jnp.where(good, ss, 1.0))
    return jnp.where(good, x / norm, 0.0)


def exponential_lr(step, lr_init, lr_final, lr_delay_steps=0,
                   lr_delay_mult=1.0, max_steps=1000000):
    """Plenoxels-style log-lerp LR schedule (general_utils.py:29-62).

    jnp-traceable so it can live inside the jitted train step.
    """
    if lr_init == 0.0 and lr_final == 0.0:
        return jnp.zeros_like(jnp.asarray(step, jnp.float32))
    step = jnp.asarray(step, jnp.float32)
    if lr_delay_steps > 0:
        delay_rate = lr_delay_mult + (1 - lr_delay_mult) * jnp.sin(
            0.5 * jnp.pi * jnp.clip(step / lr_delay_steps, 0, 1))
    else:
        delay_rate = 1.0
    t = jnp.clip(step / max_steps, 0, 1)
    log_lerp = jnp.exp(jnp.log(lr_init) * (1 - t) + jnp.log(lr_final) * t)
    lr = delay_rate * log_lerp
    return jnp.where(step < 0, 0.0, lr)
