"""Training losses.

Parity with reference train.py:113-143 + utils/loss_utils.py: photometric
L1 + D-SSIM mix, depth-distortion and normal-consistency regularizers with
their 3000/7000 iteration gates, and the DINO embedding term. Gates are
traced (`jnp.where` on the iteration) so one compiled step serves the whole
schedule.

DINO parity note (SURVEY.md §7.1): the reference computes both embeddings
under `torch.inference_mode()` and *adds* +lambda*cos_sim, so no gradient
flows and the "loss" reduces alignment in logs only. We implement both: the
faithful mode (stop_gradient, +cos) and a corrected differentiable mode
(lambda * (1 - cos)) selected by `dino_mode`.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

from gaussmart_tpu.ops.image import l1_loss
from gaussmart_tpu.ops.ssim import ssim


def photometric_loss(image: jnp.ndarray, gt: jnp.ndarray, lambda_dssim: float):
    ll1 = l1_loss(image, gt)
    loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (1.0 - ssim(image, gt))
    return loss, ll1


def regularization_losses(render_pkg: Dict[str, jnp.ndarray], iteration,
                          lambda_dist: float, lambda_normal: float,
                          lambda_dist_ramp: int = 0,
                          lambda_dist_clip: float = 0.0):
    """train.py:131-140: dist gated > 3000, normal gated > 7000.
    `lambda_dist_ramp` > 0 replaces the dist gate's step with a linear
    ramp of that many iterations; `lambda_dist_clip` > 0 caps the RAW
    per-view mean distortion entering the loss (gradients vanish above
    the cap, bounding the per-step injection of grazing views whose
    distortion runs ~170x the healthy-view scale — BASELINE.md "DTU-mesh
    recipe instability"). Both are framework extensions; reference
    defaults are step gate + no clip."""
    it = jnp.asarray(iteration, jnp.float32)
    # static-zero lambdas skip the term entirely so no cotangent reaches the
    # corresponding rasterizer channel (enables the specialized backward)
    if lambda_normal == 0.0:
        normal_loss = jnp.zeros((), jnp.float32)
    else:
        lam_n = jnp.where(it > 7000, lambda_normal, 0.0)
        rend_normal = render_pkg["rend_normal"]
        surf_normal = render_pkg["surf_normal"]
        normal_error = 1.0 - (rend_normal * surf_normal).sum(axis=0)
        normal_loss = lam_n * normal_error.mean()
    if lambda_dist == 0.0:
        dist_loss = jnp.zeros((), jnp.float32)
    else:
        if lambda_dist_ramp > 0:
            lam_d = lambda_dist * jnp.clip((it - 3000.0) / lambda_dist_ramp,
                                           0.0, 1.0)
        else:
            lam_d = jnp.where(it > 3000, lambda_dist, 0.0)
        raw = render_pkg["rend_dist"].mean()
        if lambda_dist_clip > 0.0:
            raw = jnp.minimum(raw, lambda_dist_clip)
        dist_loss = lam_d * raw
    return dist_loss, normal_loss


def dino_term(image: jnp.ndarray, gt: jnp.ndarray,
              encoder: Callable[[jnp.ndarray], jnp.ndarray],
              lambda_dino: float, mode: str = "fixed") -> jnp.ndarray:
    """DINO embedding alignment term.

    mode="parity": +lambda*cos_sim with stop_gradient on both embeddings
      (byte-faithful to loss_utils.py:77-97 — affects logs only).
    mode="fixed": lambda*(1-cos_sim), gradient flows into the render.
    """
    if mode == "parity":
        e1 = jax.lax.stop_gradient(encoder(image))
        e2 = jax.lax.stop_gradient(encoder(gt))
        cos = _cosine(e1, e2)
        return lambda_dino * cos
    e1 = encoder(image)
    e2 = jax.lax.stop_gradient(encoder(gt))
    return lambda_dino * (1.0 - _cosine(e1, e2))


def smooth_loss(disp: jnp.ndarray, img: jnp.ndarray) -> jnp.ndarray:
    """Edge-aware disparity smoothness (loss_utils.py:64-74; unused by the
    reference training loop but part of the loss surface)."""
    gdx = jnp.abs(disp[:, 1:-1, :-2] + disp[:, 1:-1, 2:]
                  - 2 * disp[:, 1:-1, 1:-1])
    gdy = jnp.abs(disp[:, :-2, 1:-1] + disp[:, 2:, 1:-1]
                  - 2 * disp[:, 1:-1, 1:-1])
    gix = jnp.mean(jnp.abs(img[:, 1:-1, :-2] - img[:, 1:-1, 2:]), 0,
                   keepdims=True) * 0.5
    giy = jnp.mean(jnp.abs(img[:, :-2, 1:-1] - img[:, 2:, 1:-1]), 0,
                   keepdims=True) * 0.5
    return (gdx * jnp.exp(-gix)).mean() + (gdy * jnp.exp(-giy)).mean()


def _cosine(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    a = a.reshape(-1)
    b = b.reshape(-1)
    denom = jnp.linalg.norm(a) * jnp.linalg.norm(b)
    return jnp.dot(a, b) / jnp.maximum(denom, 1e-8)
