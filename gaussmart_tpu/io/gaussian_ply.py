"""Gaussian model snapshot PLY (save/load).

Channel-exact with reference gaussian_model.py:305-396 so snapshots
interoperate both ways: x,y,z, nx,ny,nz, f_dc_0..2, f_rest_0..R*3-1,
opacity, scale_0..1, rot_0..3, segment — all float32. f_dc/f_rest are
flattened in (channel, coeff) order (the torch `.transpose(1,2).flatten(1)`
layout).
"""
from __future__ import annotations

import numpy as np

from gaussmart_tpu.io.ply import read_ply, write_ply
from gaussmart_tpu.models.gaussians import GaussianState, empty_params


def save_gaussian_ply(path: str, state: GaussianState):
    import jax

    active = np.asarray(state.aux.active)
    p = jax.tree.map(lambda a: np.asarray(a)[active], state.params)
    segments = np.asarray(state.aux.segments)[active]

    n = p.xyz.shape[0]
    cols = {}
    for i, k in enumerate("xyz"):
        cols[k] = p.xyz[:, i]
    for i, k in enumerate(("nx", "ny", "nz")):
        cols[k] = np.zeros(n, np.float32)
    # features_dc: [n,1,3] -> channel-major flatten
    f_dc = p.features_dc.transpose(0, 2, 1).reshape(n, 3 * p.features_dc.shape[1])
    for i in range(f_dc.shape[1]):
        cols[f"f_dc_{i}"] = f_dc[:, i]
    f_rest = p.features_rest.transpose(0, 2, 1).reshape(n, 3 * p.features_rest.shape[1])
    for i in range(f_rest.shape[1]):
        cols[f"f_rest_{i}"] = f_rest[:, i]
    cols["opacity"] = p.opacity[:, 0]
    for i in range(p.scaling.shape[1]):
        cols[f"scale_{i}"] = p.scaling[:, i]
    for i in range(p.rotation.shape[1]):
        cols[f"rot_{i}"] = p.rotation[:, i]
    cols["segment"] = segments.astype(np.float32)
    write_ply(path, {k: np.asarray(v, np.float32) for k, v in cols.items()})


def load_gaussian_ply(path: str, max_sh_degree: int,
                      spatial_lr_scale: float = 1.0,
                      capacity: int | None = None) -> GaussianState:
    import dataclasses
    import jax.numpy as jnp
    from gaussmart_tpu.models.gaussians import GaussianAux, GaussianState

    v = read_ply(path)
    n = len(v["x"])
    xyz = np.stack([v["x"], v["y"], v["z"]], axis=1).astype(np.float32)
    opacity = v["opacity"].astype(np.float32)[:, None]

    f_dc = np.stack([v[f"f_dc_{i}"] for i in range(3)], axis=1)  # [n,3]
    n_rest_total = 3 * ((max_sh_degree + 1) ** 2 - 1)
    rest_names = sorted((k for k in v if k.startswith("f_rest_")),
                        key=lambda s: int(s.split("_")[-1]))
    assert len(rest_names) == n_rest_total, (len(rest_names), n_rest_total)
    f_rest = np.stack([v[k] for k in rest_names], axis=1)  # [n, 3*(K-1)] channel-major
    f_rest = f_rest.reshape(n, 3, -1).transpose(0, 2, 1)   # [n, K-1, 3]

    scale_names = sorted((k for k in v if k.startswith("scale_")),
                         key=lambda s: int(s.split("_")[-1]))
    scaling = np.stack([v[k] for k in scale_names], axis=1).astype(np.float32)
    rot_names = sorted((k for k in v if k.startswith("rot_")),
                       key=lambda s: int(s.split("_")[-1]))
    rotation = np.stack([v[k] for k in rot_names], axis=1).astype(np.float32)
    segments = v.get("segment", np.zeros(n, np.float32)).astype(np.int32)

    if capacity is None:
        capacity = max(1024, ((int(n * 2) + 255) // 256) * 256)
    capacity = max(capacity, n)

    params = empty_params(capacity, max_sh_degree)
    params = dataclasses.replace(
        params,
        xyz=params.xyz.at[:n].set(xyz),
        features_dc=params.features_dc.at[:n].set(f_dc[:, None, :]),
        features_rest=params.features_rest.at[:n].set(f_rest.astype(np.float32)),
        scaling=params.scaling.at[:n].set(scaling),
        rotation=params.rotation.at[:n].set(rotation),
        opacity=params.opacity.at[:n].set(opacity),
    )
    seg = np.zeros(capacity, np.int32)
    seg[:n] = segments
    aux = GaussianAux(
        active=jnp.arange(capacity) < n,
        segments=jnp.asarray(seg),
        max_radii2d=jnp.zeros(capacity, jnp.float32),
        grad_accum=jnp.zeros(capacity, jnp.float32),
        denom=jnp.zeros(capacity, jnp.float32),
    )
    # load_ply restores at full SH degree (gaussian_model.py:396)
    return GaussianState(params=params, aux=aux, max_sh_degree=max_sh_degree,
                         active_sh_degree=max_sh_degree,
                         spatial_lr_scale=spatial_lr_scale)
