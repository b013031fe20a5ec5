"""Windowed SSIM on TPU.

Behavior parity with reference utils/loss_utils.py:22-62 (11x11 Gaussian
window, sigma 1.5, C1=0.01^2, C2=0.03^2, reflect-free zero padding via SAME
conv). TPU-first design differences: the window is built once at trace time
(the reference rebuilds it per call — SURVEY.md §7.10), and the 2D Gaussian
blur is expressed as two separable 1D convolutions so XLA lowers it to cheap
small convs instead of an 11x11 dense filter.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    xs = np.arange(window_size)
    g = np.exp(-((xs - window_size // 2) ** 2) / (2.0 * sigma**2))
    return (g / g.sum()).astype(np.float32)


def _blur(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """Separable Gaussian blur over [N, C, H, W] with zero 'SAME' padding.

    Written as k static shifted adds per axis instead of conv ops: TPU's
    default conv precision truncates operands to bf16 (fatal for the
    E[x^2] moments this feeds), while a HIGHEST-precision conv lowers to a
    multi-pass MXU path that measurably slows the whole train step.
    Shifted adds stay full fp32 on the VPU and fuse into one cheap kernel."""
    k = window.shape[0]
    pad = k // 2
    w_list = [window[i] for i in range(k)]

    def blur_axis(x, axis):
        size = x.shape[axis]
        cfg = [(0, 0)] * x.ndim
        cfg[axis] = (pad, pad)
        xp = jnp.pad(x, cfg)
        out = None
        for i, wi in enumerate(w_list):
            sl = [slice(None)] * x.ndim
            sl[axis] = slice(i, i + size)
            term = wi * xp[tuple(sl)]
            out = term if out is None else out + term
        return out

    return blur_axis(blur_axis(img, 2), 3)


def ssim(img1: jnp.ndarray, img2: jnp.ndarray, window_size: int = 11,
         sigma: float = 1.5, size_average: bool = True) -> jnp.ndarray:
    """SSIM between [C,H,W] or [N,C,H,W] images in [0,1]."""
    if img1.ndim == 3:
        img1 = img1[None]
        img2 = img2[None]
    window = jnp.asarray(_gaussian_window(window_size, sigma))

    mu1 = _blur(img1, window)
    mu2 = _blur(img2, window)
    mu1_sq = mu1 * mu1
    mu2_sq = mu2 * mu2
    mu1_mu2 = mu1 * mu2
    # Variance via E[x^2]-mu^2 cancels catastrophically in fp32 when the
    # (unclamped, mid-training) render holds large values: the estimate goes
    # negative, the denominator shrinks/flips, and SSIM leaves [-1, 1] —
    # observed as transient SSIM>1 spikes that turn the training loss
    # negative. Clamp the variances at 0 and Cauchy-Schwarz-bound the
    # covariance so ssim_map <= 1 holds for any input; exact values are
    # unchanged wherever the moments are numerically consistent.
    sigma1_sq = jnp.maximum(_blur(img1 * img1, window) - mu1_sq, 0.0)
    sigma2_sq = jnp.maximum(_blur(img2 * img2, window) - mu2_sq, 0.0)
    sigma12 = _blur(img1 * img2, window) - mu1_mu2
    # stop_gradient: the bound only binds where the moments are already
    # inconsistent, and sqrt'(0)=inf would poison the backward pass.
    bound = jax.lax.stop_gradient(jnp.sqrt(sigma1_sq * sigma2_sq))
    sigma12 = jnp.clip(sigma12, -bound, bound)

    c1 = 0.01**2
    c2 = 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2))
    if size_average:
        return ssim_map.mean()
    return ssim_map.mean(axis=(1, 2, 3))
