"""DINO attention/similarity heatmap visualization CLI.

Capability parity with reference identification/visualize_maps.py (CLS->
patch cosine-similarity heatmap overlaid on the image), minus its quirks:
no inference at import time and no hardcoded dataset path (SURVEY.md §7.12)
— this is a proper CLI: `python -m gaussmart_tpu.semantics.visualize -i
<image> -o <out.png>`.
"""
from __future__ import annotations

import os
from argparse import ArgumentParser

import numpy as np


def cls_patch_heatmap(encoder, image: np.ndarray) -> np.ndarray:
    """CLS-token vs patch-token cosine similarity map in [0,1].

    encoder: DinoEncoder; image: [3,H,W] float in [0,1].
    Returns [g,g] heatmap (g = image_size/patch).
    """
    import jax.numpy as jnp

    # one forward-pass definition: the same encoder.tokens the loss uses
    x = encoder.tokens(jnp.asarray(image))
    g = encoder.image_size // encoder.patch
    cls_t = x[0] / jnp.linalg.norm(x[0])
    # patch tokens start after the prefix (CLS [+ DINOv3 register tokens])
    pats = x[encoder.n_prefix:]
    patches = pats / jnp.linalg.norm(pats, axis=-1, keepdims=True)
    sim = patches @ cls_t
    sim = (sim - sim.min()) / jnp.maximum(sim.max() - sim.min(), 1e-9)
    return np.asarray(sim.reshape(g, g))


def overlay_heatmap(image: np.ndarray, heat: np.ndarray,
                    alpha: float = 0.5) -> np.ndarray:
    """Blend a turbo-colored heatmap over an [H,W,3] image in [0,1]."""
    import cv2

    h, w = image.shape[:2]
    heat_img = cv2.resize((heat * 255).astype(np.uint8), (w, h),
                          interpolation=cv2.INTER_LINEAR)
    heat_rgb = cv2.applyColorMap(heat_img, cv2.COLORMAP_TURBO)[..., ::-1] / 255.0
    return (1 - alpha) * image + alpha * heat_rgb


def main(argv=None):
    from gaussmart_tpu.runtime import setup as _runtime_setup
    _runtime_setup()
    parser = ArgumentParser(description="DINO heatmap visualization")
    parser.add_argument("-i", "--image", required=True)
    parser.add_argument("-o", "--output", required=True)
    parser.add_argument("--alpha", type=float, default=0.5)
    parser.add_argument("--random_encoder", action="store_true",
                        help="use a random-weight encoder (no checkpoint)")
    args = parser.parse_args(argv)

    from PIL import Image
    from gaussmart_tpu.semantics.dino import DinoEncoder

    if args.random_encoder:
        enc = DinoEncoder.random(depth=2, dim=192, image_size=224)
    else:
        enc = DinoEncoder.create()

    with Image.open(args.image) as im:
        rgb = np.asarray(im.convert("RGB"), np.float32) / 255.0
    heat = cls_patch_heatmap(enc, rgb.transpose(2, 0, 1))
    out = overlay_heatmap(rgb, heat, args.alpha)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    Image.fromarray(np.clip(out * 255, 0, 255).astype(np.uint8)).save(
        args.output)
    print(f"saved {args.output}")


if __name__ == "__main__":
    main()
