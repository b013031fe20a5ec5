"""DINO image encoder in JAX (ViT-B/16) for the embedding-alignment loss.

Capability parity with reference identification/feature_extraction.py
(DINOv3 ViT-B/16 via HF transformers, ImageNet-normalized input, pooled
embedding) re-built as a pure-jnp ViT so the loss differentiates through
the render on TPU — unlike the reference, whose torch encoder runs under
inference_mode and contributes no gradient (SURVEY.md §7.1).

Weights: converted from a local HF checkpoint when present (no egress in
this image). `DinoEncoder.create()` raises otherwise and training cleanly
disables the term. `DinoEncoder.random(...)` builds a random-weight encoder
for tests and ablations.
"""
from __future__ import annotations

import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)

WEIGHT_ENV = "GAUSSMART_DINO_WEIGHTS"
DEFAULT_PATHS = [
    os.path.join(os.path.dirname(__file__), "weights", "dino_vitb16.npz"),
    os.path.expanduser("~/.cache/gaussmart_tpu/dino_vitb16.npz"),
]


def _layer_norm(x, g, b, eps=1e-12):
    # eps matches HF ViT/DINO layer_norm_eps (golden test: test_converters)
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _attention(x, p, prefix, n_heads):
    N, D = x.shape
    hd = D // n_heads
    qkv = x @ p[f"{prefix}.qkv_w"] + p[f"{prefix}.qkv_b"]        # [N, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(N, n_heads, hd).transpose(1, 0, 2)

    q, k, v = heads(q), heads(k), heads(v)
    att = jax.nn.softmax(
        jnp.einsum("hnd,hmd->hnm", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd), axis=-1)
    out = jnp.einsum("hnm,hmd->hnd", att, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(1, 0, 2).reshape(N, D)
    return out @ p[f"{prefix}.proj_w"] + p[f"{prefix}.proj_b"]


def _block(x, p, i, n_heads):
    pre = f"blocks.{i}"
    h = _layer_norm(x, p[f"{pre}.norm1_g"], p[f"{pre}.norm1_b"])
    x = x + _attention(h, p, f"{pre}.attn", n_heads)
    h = _layer_norm(x, p[f"{pre}.norm2_g"], p[f"{pre}.norm2_b"])
    # exact (erf) GELU — HF "gelu"; jax defaults to the tanh approximation
    h = jax.nn.gelu(h @ p[f"{pre}.fc1_w"] + p[f"{pre}.fc1_b"],
                    approximate=False)
    return x + (h @ p[f"{pre}.fc2_w"] + p[f"{pre}.fc2_b"])


class DinoEncoder:
    """ViT encoder: image [3,H,W] in [0,1] -> pooled embedding [D]."""

    def __init__(self, params: Dict[str, np.ndarray], patch: int = 16,
                 n_heads: int = 12, image_size: int = 224):
        self.patch = patch
        self.n_heads = n_heads
        self.image_size = image_size
        self.params = {k: jnp.asarray(v) for k, v in params.items()}

    def tokens(self, image: jnp.ndarray) -> jnp.ndarray:
        """Full forward -> all final-norm tokens [1+(S/p)^2, D] (CLS first).
        The single forward-pass definition — the loss (__call__) and the
        CLS-patch heatmap visualization both ride it."""
        p = self.params
        S = self.image_size
        x = jax.image.resize(image, (3, S, S), method="bilinear")
        mean = jnp.asarray(IMAGENET_MEAN).reshape(3, 1, 1)
        std = jnp.asarray(IMAGENET_STD).reshape(3, 1, 1)
        x = (x - mean) / std

        # patch embed as a big matmul (MXU): [(S/p)^2, 3*p*p] @ W
        g = S // self.patch
        x = x.reshape(3, g, self.patch, g, self.patch)
        x = x.transpose(1, 3, 0, 2, 4).reshape(g * g, -1)
        x = x @ p["patch_w"] + p["patch_b"]                      # [N, D]

        cls = p["cls_token"].reshape(1, -1)
        x = jnp.concatenate([cls, x], axis=0) + p["pos_embed"]
        for i in range(self.n_layers):
            x = _block(x, p, i, self.n_heads)
        return _layer_norm(x, p["norm_g"], p["norm_b"])

    def __call__(self, image: jnp.ndarray) -> jnp.ndarray:
        return self.tokens(image)[0]                             # CLS pooled

    @property
    def n_layers(self) -> int:
        i = 0
        while f"blocks.{i}.norm1_g" in self.params:
            i += 1
        return i

    # -- constructors -------------------------------------------------------
    @staticmethod
    def create() -> "DinoEncoder":
        path = os.environ.get(WEIGHT_ENV)
        if path == "random":
            # Testing escape hatch: a small random-weight encoder so the
            # full training loop can exercise the differentiable DINO path
            # (compute + VJP inside the jitted step) without real weights.
            return DinoEncoder.random()
        cands = ([path] if path else []) + DEFAULT_PATHS
        for c in cands:
            if c and os.path.exists(c):
                with np.load(c) as z:
                    return DinoEncoder({k: z[k] for k in z.files})
        raise FileNotFoundError(
            f"No DINO weights found (set ${WEIGHT_ENV} or place "
            f"{DEFAULT_PATHS[0]})")

    @staticmethod
    def random(depth: int = 2, dim: int = 192, n_heads: int = 3,
               image_size: int = 64, patch: int = 16, seed: int = 0
               ) -> "DinoEncoder":
        rng = np.random.default_rng(seed)
        D = dim
        n_tok = (image_size // patch) ** 2 + 1
        p = {
            "patch_w": rng.normal(0, 0.02, (3 * patch * patch, D)).astype(np.float32),
            "patch_b": np.zeros(D, np.float32),
            "cls_token": rng.normal(0, 0.02, (D,)).astype(np.float32),
            "pos_embed": rng.normal(0, 0.02, (n_tok, D)).astype(np.float32),
            "norm_g": np.ones(D, np.float32),
            "norm_b": np.zeros(D, np.float32),
        }
        for i in range(depth):
            pre = f"blocks.{i}"
            p[f"{pre}.norm1_g"] = np.ones(D, np.float32)
            p[f"{pre}.norm1_b"] = np.zeros(D, np.float32)
            p[f"{pre}.norm2_g"] = np.ones(D, np.float32)
            p[f"{pre}.norm2_b"] = np.zeros(D, np.float32)
            p[f"{pre}.attn.qkv_w"] = rng.normal(0, 0.02, (D, 3 * D)).astype(np.float32)
            p[f"{pre}.attn.qkv_b"] = np.zeros(3 * D, np.float32)
            p[f"{pre}.attn.proj_w"] = rng.normal(0, 0.02, (D, D)).astype(np.float32)
            p[f"{pre}.attn.proj_b"] = np.zeros(D, np.float32)
            p[f"{pre}.fc1_w"] = rng.normal(0, 0.02, (D, 4 * D)).astype(np.float32)
            p[f"{pre}.fc1_b"] = np.zeros(4 * D, np.float32)
            p[f"{pre}.fc2_w"] = rng.normal(0, 0.02, (4 * D, D)).astype(np.float32)
            p[f"{pre}.fc2_b"] = np.zeros(D, np.float32)
        return DinoEncoder(p, patch=patch, n_heads=n_heads,
                           image_size=image_size)


def convert_hf_dino(model_name_or_path: str, out_path: str) -> str:
    """Convert a locally cached HF DINO/DINOv2/DINOv3 ViT checkpoint."""
    import torch
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    def find(*names):
        for n in names:
            if n in sd:
                return sd[n]
        raise KeyError(names)

    D = find("embeddings.cls_token").reshape(-1).shape[0]
    out = {
        "patch_w": find("embeddings.patch_embeddings.projection.weight")
        .reshape(D, -1).T,
        "patch_b": find("embeddings.patch_embeddings.projection.bias"),
        "cls_token": find("embeddings.cls_token").reshape(-1),
        "pos_embed": find("embeddings.position_embeddings").reshape(-1, D),
        "norm_g": find("layernorm.weight"),
        "norm_b": find("layernorm.bias"),
    }
    i = 0
    while f"encoder.layer.{i}.attention.attention.query.weight" in sd:
        pre = f"encoder.layer.{i}"
        q = sd[f"{pre}.attention.attention.query.weight"]
        k = sd[f"{pre}.attention.attention.key.weight"]
        v = sd[f"{pre}.attention.attention.value.weight"]
        out[f"blocks.{i}.attn.qkv_w"] = np.concatenate([q, k, v], 0).T
        out[f"blocks.{i}.attn.qkv_b"] = np.concatenate([
            sd[f"{pre}.attention.attention.query.bias"],
            sd[f"{pre}.attention.attention.key.bias"],
            sd[f"{pre}.attention.attention.value.bias"]])
        out[f"blocks.{i}.attn.proj_w"] = sd[f"{pre}.attention.output.dense.weight"].T
        out[f"blocks.{i}.attn.proj_b"] = sd[f"{pre}.attention.output.dense.bias"]
        out[f"blocks.{i}.norm1_g"] = sd[f"{pre}.layernorm_before.weight"]
        out[f"blocks.{i}.norm1_b"] = sd[f"{pre}.layernorm_before.bias"]
        out[f"blocks.{i}.norm2_g"] = sd[f"{pre}.layernorm_after.weight"]
        out[f"blocks.{i}.norm2_b"] = sd[f"{pre}.layernorm_after.bias"]
        out[f"blocks.{i}.fc1_w"] = sd[f"{pre}.intermediate.dense.weight"].T
        out[f"blocks.{i}.fc1_b"] = sd[f"{pre}.intermediate.dense.bias"]
        out[f"blocks.{i}.fc2_w"] = sd[f"{pre}.output.dense.weight"].T
        out[f"blocks.{i}.fc2_b"] = sd[f"{pre}.output.dense.bias"]
        i += 1
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path
