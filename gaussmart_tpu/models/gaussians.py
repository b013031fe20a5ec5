"""Gaussian scene state as a fixed-capacity pytree.

Capability parity with reference scene/gaussian_model.py (param tensors,
activations, splat2world covariance, PLY layout, checkpoint capture) with a
TPU-first state design: the reference freely resizes tensors on
densify/prune (gaussian_model.py:470-517), which XLA cannot express under
jit. Here every array has a static ``capacity`` rows and an ``active``
mask; densify = masked scatter into free slots, prune = mask clear. Shapes
stay static across the whole 30k-iteration run (capacity growth is a rare
host-side re-pad).

Parameter layout (matches PLY channel contract, gaussian_model.py:305-342):
  xyz [C,3], features_dc [C,1,3], features_rest [C,K-1,3] (K=(deg+1)^2),
  scaling [C,2] (log, 2-axis surfel), rotation [C,4] (wxyz, unnormalized),
  opacity [C,1] (logit), segments [C] (int32, not optimized).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from gaussmart_tpu.ops.sh import rgb2sh
from gaussmart_tpu.transforms import inverse_sigmoid, quat_to_rotmat


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianParams:
    """Differentiable leaves (the Adam-optimized tensors)."""
    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    opacity: jnp.ndarray


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianAux:
    """Non-differentiable per-splat bookkeeping."""
    active: jnp.ndarray       # [C] bool
    segments: jnp.ndarray     # [C] int32
    max_radii2d: jnp.ndarray  # [C] f32
    grad_accum: jnp.ndarray   # [C] f32 — ||screen grad|| accumulator
    denom: jnp.ndarray        # [C] f32


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GaussianState:
    params: GaussianParams
    aux: GaussianAux
    max_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    active_sh_degree: int = dataclasses.field(metadata=dict(static=True))
    spatial_lr_scale: float = dataclasses.field(metadata=dict(static=True))

    @property
    def capacity(self) -> int:
        return self.params.xyz.shape[0]

    @property
    def n_active(self) -> jnp.ndarray:
        return self.aux.active.sum()

    # -- activations (gaussian_model.py:37-43) -------------------------------
    @property
    def get_scaling(self) -> jnp.ndarray:
        return jnp.exp(self.params.scaling)

    @property
    def get_rotation(self) -> jnp.ndarray:
        q = self.params.rotation
        return q / jnp.linalg.norm(q, axis=-1, keepdims=True).clip(1e-12)

    @property
    def get_opacity(self) -> jnp.ndarray:
        return jax.nn.sigmoid(self.params.opacity)

    @property
    def get_features(self) -> jnp.ndarray:
        return jnp.concatenate([self.params.features_dc,
                                self.params.features_rest], axis=1)

    def get_covariance(self, scaling_modifier: float = 1.0) -> jnp.ndarray:
        """splat->world 4x4 transforms, row-vector convention
        (gaussian_model.py:29-35)."""
        C = self.capacity
        R = quat_to_rotmat(self.params.rotation)
        s = self.get_scaling * scaling_modifier
        rows = jnp.stack([R[:, :, 0] * s[:, 0:1],
                          R[:, :, 1] * s[:, 1:2],
                          R[:, :, 2]], axis=1)                 # [C,3,3]
        trans = jnp.zeros((C, 4, 4), jnp.float32)
        trans = trans.at[:, :3, :3].set(rows)
        trans = trans.at[:, 3, :3].set(self.params.xyz)
        trans = trans.at[:, 3, 3].set(1.0)
        return trans

    def oneup_sh_degree(self) -> "GaussianState":
        if self.active_sh_degree < self.max_sh_degree:
            return dataclasses.replace(
                self, active_sh_degree=self.active_sh_degree + 1)
        return self

    def replace(self, **kw) -> "GaussianState":
        return dataclasses.replace(self, **kw)


def empty_params(capacity: int, max_sh_degree: int) -> GaussianParams:
    n_rest = (max_sh_degree + 1) ** 2 - 1
    return GaussianParams(
        xyz=jnp.zeros((capacity, 3), jnp.float32),
        features_dc=jnp.zeros((capacity, 1, 3), jnp.float32),
        features_rest=jnp.zeros((capacity, n_rest, 3), jnp.float32),
        scaling=jnp.full((capacity, 2), -10.0, jnp.float32),
        rotation=jnp.concatenate([jnp.ones((capacity, 1), jnp.float32),
                                  jnp.zeros((capacity, 3), jnp.float32)], axis=1),
        opacity=jnp.full((capacity, 1), -10.0, jnp.float32),
    )


def mean_sq_dist_to_3nn(points: np.ndarray) -> np.ndarray:
    """Per-point mean squared distance to the 3 nearest neighbors — the
    distCUDA2 scale-init contract (reference N2, gaussian_model.py:261-262).
    Host-side scipy cKDTree: init-time only, never in the train step."""
    from scipy.spatial import cKDTree

    tree = cKDTree(points)
    k = min(4, len(points))
    d, _ = tree.query(points, k=k)
    if k > 1:
        return (d[:, 1:] ** 2).mean(axis=1)
    return np.full(len(points), 1e-7)


def init_from_pcd(
    points: np.ndarray,
    colors: np.ndarray,
    segments: Optional[np.ndarray],
    max_sh_degree: int,
    spatial_lr_scale: float,
    capacity: Optional[int] = None,
    seed: int = 0,
) -> GaussianState:
    """create_from_pcd equivalent (gaussian_model.py:169-275), host-side.

    Scale init: log(sqrt(mean 3-NN sq dist)) on both surfel axes; random
    uniform quats; opacity logit(0.1); DC features from RGB2SH.
    """
    n = len(points)
    if capacity is None:
        capacity = max(1024, _next_multiple(int(n * 4), 256))
    capacity = max(capacity, n)

    rng = np.random.default_rng(seed)
    dist2 = np.maximum(mean_sq_dist_to_3nn(points), 1e-7)
    scales = np.log(np.sqrt(dist2))[:, None].repeat(2, axis=1)
    rots = rng.random((n, 4)).astype(np.float32)

    params = empty_params(capacity, max_sh_degree)
    fused_color = np.asarray(rgb2sh(colors.astype(np.float32)))
    params = dataclasses.replace(
        params,
        xyz=params.xyz.at[:n].set(points.astype(np.float32)),
        features_dc=params.features_dc.at[:n, 0].set(fused_color),
        scaling=params.scaling.at[:n].set(scales.astype(np.float32)),
        rotation=params.rotation.at[:n].set(rots),
        opacity=params.opacity.at[:n].set(
            np.asarray(inverse_sigmoid(0.1 * np.ones((n, 1), np.float32)))),
    )
    seg = np.zeros(capacity, np.int32)
    if segments is not None:
        seg[:n] = segments.astype(np.int32)
    aux = GaussianAux(
        active=jnp.arange(capacity) < n,
        segments=jnp.asarray(seg),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    return GaussianState(params=params, aux=aux, max_sh_degree=max_sh_degree,
                         active_sh_degree=0, spatial_lr_scale=spatial_lr_scale)


def _next_multiple(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def grow_capacity(state: GaussianState, new_capacity: int) -> GaussianState:
    """Host-side re-pad when occupancy gets high (rare recompile point)."""
    old = state.capacity
    assert new_capacity >= old
    pad_n = new_capacity - old
    if pad_n == 0:
        return state

    fresh = empty_params(pad_n, state.max_sh_degree)

    def cat(a, b):
        return jnp.concatenate([a, b], axis=0)

    params = jax.tree.map(cat, state.params, fresh)
    aux = GaussianAux(
        active=cat(state.aux.active, jnp.zeros(pad_n, bool)),
        segments=cat(state.aux.segments, jnp.zeros(pad_n, jnp.int32)),
        max_radii2d=cat(state.aux.max_radii2d, jnp.zeros(pad_n, jnp.float32)),
        grad_accum=cat(state.aux.grad_accum, jnp.zeros(pad_n, jnp.float32)),
        denom=cat(state.aux.denom, jnp.zeros(pad_n, jnp.float32)),
    )
    return state.replace(params=params, aux=aux)


def compact(state: GaussianState) -> GaussianState:
    """Pack active splats to the front (host-side; used before save/export)."""
    active = np.asarray(state.aux.active)
    order = np.argsort(~active, kind="stable")
    idx = jnp.asarray(order)
    params = jax.tree.map(lambda a: a[idx], state.params)
    aux = jax.tree.map(lambda a: a[idx], state.aux)
    return state.replace(params=params, aux=aux)
