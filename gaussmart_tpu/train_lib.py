"""Jitted training step + host-side training driver pieces.

The reference hot loop (train.py:90-242) interleaves render, loss, backward,
densify stats and the Adam step as separate CUDA launches. Here the whole
iteration is one XLA program: forward render, all losses, reverse-mode
grads (including the screen-space means2d side channel), densification-stat
update, and the masked Adam step, fused and compiled once. Densify/prune is
a second jitted program invoked every `densification_interval` iterations.
"""
from __future__ import annotations

import functools
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from gaussmart_tpu.cameras import CameraParams
from gaussmart_tpu.config import OptimizationParams
from gaussmart_tpu.losses import photometric_loss, regularization_losses
from gaussmart_tpu.models.densify import (add_densification_stats,
                                          densify_and_prune, reset_opacity)
from gaussmart_tpu.models.gaussians import GaussianParams, GaussianState
from gaussmart_tpu.optim import AdamState, adam_step, group_lrs
from gaussmart_tpu.render.api import render_arrays


class StepMetrics(NamedTuple):
    total: jnp.ndarray
    l1: jnp.ndarray
    dist: jnp.ndarray
    normal: jnp.ndarray
    dino: jnp.ndarray
    psnr: jnp.ndarray
    n_active: jnp.ndarray
    n_dropped: jnp.ndarray


def _loss_and_aux(params: GaussianParams, means2d, aux_state, cam, gt_image,
                  iteration, opt: OptimizationParams, bg, sh_degree: int,
                  depth_ratio: float, backend: str,
                  dino_fn: Optional[Callable] = None,
                  raster_budget: Optional[tuple] = None,
                  mesh=None):
    scaling = jnp.exp(params.scaling)
    opacity = jax.nn.sigmoid(params.opacity[:, 0])
    features = jnp.concatenate([params.features_dc, params.features_rest], axis=1)

    # SH degree schedule is TRACED (every-1000-iters bump, train.py:96-97)
    # so a single compiled step serves all degrees
    active_degree = jnp.clip(iteration // 1000, 0, sh_degree)
    pkg = render_arrays(
        cam,
        xyz=params.xyz,
        scaling=scaling,
        rotation=params.rotation,
        opacity=opacity,
        features=features,
        active=aux_state.active,
        sh_degree=sh_degree,
        bg_color=bg,
        means2d=means2d,
        depth_ratio=depth_ratio,
        backend=backend,
        active_degree=active_degree,
        need_dist_grad=(opt.lambda_dist != 0.0),
        raster_budget=raster_budget,
        mesh=mesh,
    )
    image = pkg["render"]
    loss, ll1 = photometric_loss(image, gt_image, opt.lambda_dssim)
    dist_loss, normal_loss = regularization_losses(
        pkg, iteration, opt.lambda_dist, opt.lambda_normal,
        lambda_dist_ramp=getattr(opt, "lambda_dist_ramp", 0),
        lambda_dist_clip=getattr(opt, "lambda_dist_clip", 0.0))
    dino = jnp.zeros((), jnp.float32)
    if dino_fn is not None:
        dino = dino_fn(image, gt_image, iteration)
    total = loss + dist_loss + normal_loss + dino

    mse = jnp.mean((jnp.clip(image, 0, 1) - jnp.clip(gt_image, 0, 1)) ** 2)
    psnr = 20.0 * jnp.log10(1.0 / jnp.sqrt(jnp.maximum(mse, 1e-12)))
    extras = dict(radii=pkg["radii"], l1=ll1, dist=dist_loss,
                  normal=normal_loss, dino=dino, psnr=psnr,
                  n_dropped=pkg["n_dropped"])
    return total, extras


def make_train_step(opt: OptimizationParams, *, sh_degree: int,
                    white_background: bool, depth_ratio: float = 0.0,
                    backend: str = "auto",
                    dino_fn: Optional[Callable] = None,
                    spatial_lr_scale: float = 1.0,
                    donate: bool = True,
                    adam_on_densify: str = "drop",
                    raster_budget: Optional[tuple] = None):
    """Build the jitted single-iteration update for a given static config.

    adam_on_densify: "drop" (default; reference parity — the CUDA stack's
    optimizer-state surgery replaces the param tensors before
    optimizer.step(), so `.grad` is None and the update is silently skipped
    on densify iterations, scene/gaussian_model.py:398-468,
    train.py:205-216) or "apply" (use the gradient instead of discarding
    it). A 10k-iter A/B on the synthetic validation scene found the two
    identical at 5k iters but "drop" markedly more stable in the
    over-parameterized late phase (BASELINE.md).
    """
    assert adam_on_densify in ("apply", "drop"), adam_on_densify
    bg = jnp.asarray([1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0],
                     jnp.float32)

    def step(params: GaussianParams, adam: AdamState, aux_state,
             cam: CameraParams, gt_image: jnp.ndarray,
             iteration: jnp.ndarray):
        means2d = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)
        grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1), has_aux=True)
        (total, extras), (gparams, gmeans2d) = grad_fn(
            params, means2d, aux_state, cam, gt_image, iteration, opt, bg,
            sh_degree, depth_ratio, backend, dino_fn, raster_budget)

        # densification statistics (train.py:198-203)
        in_window = iteration < opt.densify_until_iter
        new_stats = add_densification_stats(aux_state, gmeans2d, extras["radii"])
        aux_state = jax.tree.map(
            lambda new, old: jnp.where(in_window, new, old), new_stats, aux_state)

        lrs = group_lrs(opt, iteration, spatial_lr_scale)
        new_params, new_adam = adam_step(params, gparams, adam, lrs,
                                         aux_state.active)
        if adam_on_densify == "drop":
            is_densify = (in_window
                          & (iteration > opt.densify_from_iter)
                          & (iteration % opt.densification_interval == 0))
            keep = lambda new, old: jnp.where(is_densify, old, new)
            params = jax.tree.map(keep, new_params, params)
            adam = jax.tree.map(keep, new_adam, adam)
        else:
            params, adam = new_params, new_adam

        metrics = StepMetrics(
            total=total, l1=extras["l1"], dist=extras["dist"],
            normal=extras["normal"], dino=extras["dino"],
            psnr=extras["psnr"], n_active=aux_state.active.sum(),
            n_dropped=extras["n_dropped"])
        # device-side counter: callers thread it back in, avoiding a
        # host->device scalar upload every iteration
        return params, adam, aux_state, metrics, iteration + 1

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_densify_step(opt: OptimizationParams, *, extent: float):
    """Jitted densify+prune (+ optional size prune flag is static)."""

    @functools.partial(jax.jit, static_argnames=("use_size_prune",),
                       donate_argnums=(0, 1))
    def densify(state: GaussianState, adam: AdamState, key,
                use_size_prune: bool):
        return densify_and_prune(
            state, adam, key,
            max_grad=opt.densify_grad_threshold,
            min_opacity=opt.opacity_cull,
            extent=extent,
            percent_dense=opt.percent_dense,
            use_size_prune=use_size_prune)

    return densify


reset_opacity_jit = jax.jit(reset_opacity, donate_argnums=(0, 1))
