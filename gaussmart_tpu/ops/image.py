"""Image metrics & basic losses (reference utils/image_utils.py:16-32,
utils/loss_utils.py:16-20)."""
from __future__ import annotations

import jax.numpy as jnp


def l1_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(a - b).mean()


def l2_loss(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return ((a - b) ** 2).mean()


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """Per-image MSE over [N, ...] -> [N, 1]."""
    d = (img1 - img2) ** 2
    return d.reshape(d.shape[0], -1).mean(axis=1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    """PSNR per image, assuming range [0, 1] (image_utils.py:19-21).
    MSE is floored at 1e-10 (100 dB cap) so identical views don't poison
    averaged reports with inf."""
    m = jnp.maximum(mse(img1, img2), 1e-10)
    return 20.0 * jnp.log10(1.0 / jnp.sqrt(m))


def gradient_map(image: jnp.ndarray) -> jnp.ndarray:
    """Sobel gradient magnitude of a [C,H,W] image (image_utils.py:23-32)."""
    import jax

    sobel_x = jnp.array([[-1, 0, 1], [-2, 0, 2], [-1, 0, 1]], jnp.float32) / 4.0
    sobel_y = sobel_x.T
    c, h, w = image.shape
    x = image.reshape(c, 1, h, w)
    dn = jax.lax.conv_dimension_numbers(x.shape, (1, 1, 3, 3), ("NCHW", "OIHW", "NCHW"))
    gx = jax.lax.conv_general_dilated(x, sobel_x.reshape(1, 1, 3, 3), (1, 1),
                                      [(1, 1), (1, 1)], dimension_numbers=dn)
    gy = jax.lax.conv_general_dilated(x, sobel_y.reshape(1, 1, 3, 3), (1, 1),
                                      [(1, 1), (1, 1)], dimension_numbers=dn)
    mag = jnp.sqrt(gx**2 + gy**2)
    return jnp.linalg.norm(mag[:, 0], axis=0, keepdims=True)
