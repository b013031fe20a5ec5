"""Training checkpoints: full optimizer + densification state + iteration.

Equivalent of the reference `torch.save((gaussians.capture(), iter))`
contract (train.py:219-221, gaussian_model.py:66-101) as a single .npz of
numpy arrays plus a JSON sidecar of static metadata — portable, no pickle.
"""
from __future__ import annotations

import dataclasses
import json
import os
from typing import Tuple

import jax.numpy as jnp
import numpy as np

from gaussmart_tpu.models.gaussians import GaussianAux, GaussianParams, GaussianState
from gaussmart_tpu.optim import AdamState


def save_checkpoint(path: str, state: GaussianState, adam: AdamState,
                    iteration: int):
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    for f in dataclasses.fields(GaussianParams):
        arrays[f"params.{f.name}"] = np.asarray(getattr(state.params, f.name))
        arrays[f"mu.{f.name}"] = np.asarray(getattr(adam.mu, f.name))
        arrays[f"nu.{f.name}"] = np.asarray(getattr(adam.nu, f.name))
    for f in dataclasses.fields(GaussianAux):
        arrays[f"aux.{f.name}"] = np.asarray(getattr(state.aux, f.name))
    arrays["adam.step"] = np.asarray(adam.step)
    np.savez(path, **arrays)
    meta = dict(iteration=iteration,
                max_sh_degree=state.max_sh_degree,
                active_sh_degree=state.active_sh_degree,
                spatial_lr_scale=state.spatial_lr_scale)
    with open(path + ".json", "w") as f:
        json.dump(meta, f)


def load_checkpoint(path: str) -> Tuple[GaussianState, AdamState, int]:
    with np.load(path if path.endswith(".npz") else path + ".npz") as z:
        arrays = {k: z[k] for k in z.files}
    meta_path = (path if path.endswith(".npz") else path + ".npz") + ".json"
    if not os.path.exists(meta_path):
        meta_path = path + ".json"
    with open(meta_path) as f:
        meta = json.load(f)

    def group(prefix, cls):
        return cls(**{f.name: jnp.asarray(arrays[f"{prefix}.{f.name}"])
                      for f in dataclasses.fields(cls)})

    params = group("params", GaussianParams)
    aux = group("aux", GaussianAux)
    adam = AdamState(mu=group("mu", GaussianParams),
                     nu=group("nu", GaussianParams),
                     step=jnp.asarray(arrays["adam.step"]))
    state = GaussianState(params=params, aux=aux,
                          max_sh_degree=meta["max_sh_degree"],
                          active_sh_degree=meta["active_sh_degree"],
                          spatial_lr_scale=meta["spatial_lr_scale"])
    return state, adam, meta["iteration"]
