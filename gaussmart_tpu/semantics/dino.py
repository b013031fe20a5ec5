"""DINO image encoder in JAX for the embedding-alignment loss.

Capability parity with reference identification/feature_extraction.py:14-43
(`facebook/dinov3-vitb16-pretrain-lvd1689m` via HF transformers,
processor-normalized input, `pooler_output` embedding) re-built as a
pure-jnp tower so the loss differentiates through the render on TPU —
unlike the reference, whose torch encoder runs under inference_mode and
contributes no gradient (SURVEY.md §7.1).

Two architectures share the forward skeleton, selected by the weight dict:

* **DINOv3** (the flagship target; `transformers.DINOv3ViTModel`
  semantics, verified against transformers 4.57): RoPE over patch-center
  coordinates in [-1,1] (theta=rope_theta, per-axis frequency bands,
  rotate-half convention, prefix tokens un-rotated), `num_register_tokens`
  register tokens between CLS and patches, per-branch LayerScale, no
  learned position embedding, LN eps 1e-5, separate q/k/v biases with
  key_bias=False. Detected by `rope_theta` in the params.
* **plain ViT** (legacy npz compat; HF `ViTModel` semantics): learned
  absolute pos-embed added to [CLS, patches], no LayerScale, LN eps 1e-12.

Both pool as final-LN CLS (= HF pooler_output for DINOv3, which has no
pooler head; reference encode_tensor reads `outputs.pooler_output`).

The reference feeds the raw render resolution straight to the model (no
processor resize — feature_extraction.py:36-43); this tower resizes to a
fixed `image_size` instead so the jitted training step keeps one static
token count. RoPE coordinates are computed from the actual patch grid, so
any (divisible) size works.

Weights: converted from a locally cached HF checkpoint
(`convert_hf_dino`, exercised by scripts/fetch_and_convert_weights.py —
no egress in this image). `DinoEncoder.create()` raises when absent and
training cleanly disables the term. `DinoEncoder.random(...)` builds a
random-weight DINOv3-architecture encoder for tests and ablations.
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


def _layer_norm(x, g, b, eps):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * g + b


def _rope_cos_sin(gh: int, gw: int, head_dim: int, theta: float):
    """DINOv3 rotary tables for a gh x gw patch grid -> ([gh*gw, head_dim],
    [gh*gw, head_dim]) float32 cos/sin.

    Mirrors DINOv3ViTRopePositionEmbedding (eval mode, no coordinate
    augmentation): patch-center coords normalized to [-1,1] per axis,
    inv_freq = theta^-arange(0,1,4/head_dim), angles = 2*pi*coord*freq
    flattened (y then x bands) and tiled x2 for the rotate-half halves."""
    cy = ((np.arange(gh, dtype=np.float32) + 0.5) / gh) * 2.0 - 1.0
    cx = ((np.arange(gw, dtype=np.float32) + 0.5) / gw) * 2.0 - 1.0
    yy, xx = np.meshgrid(cy, cx, indexing="ij")
    coords = np.stack([yy.reshape(-1), xx.reshape(-1)], axis=1)  # (N, 2) y,x
    inv_freq = 1.0 / theta ** np.arange(0, 1, 4.0 / head_dim,
                                        dtype=np.float32)        # (hd/4,)
    angles = 2.0 * np.pi * coords[:, :, None] * inv_freq[None, None, :]
    angles = angles.reshape(gh * gw, -1)                          # (N, hd/2)
    angles = np.tile(angles, (1, 2))                              # (N, hd)
    return jnp.asarray(np.cos(angles)), jnp.asarray(np.sin(angles))


def _rotate_half(x):
    h = x.shape[-1] // 2
    return jnp.concatenate([-x[..., h:], x[..., :h]], axis=-1)


def _attention(x, p, prefix, n_heads, rope=None):
    N, D = x.shape
    hd = D // n_heads
    qkv = x @ p[f"{prefix}.qkv_w"] + p[f"{prefix}.qkv_b"]        # [N, 3D]
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(t):
        return t.reshape(N, n_heads, hd).transpose(1, 0, 2)

    q, k, v = heads(q), heads(k), heads(v)
    if rope is not None:
        cos, sin, n_pre = rope

        def rot(t):
            pre, pat = t[:, :n_pre], t[:, n_pre:]
            pat = pat * cos + _rotate_half(pat) * sin
            return jnp.concatenate([pre, pat], axis=1)

        q, k = rot(q), rot(k)
    att = jax.nn.softmax(
        jnp.einsum("hnd,hmd->hnm", q, k,
                   preferred_element_type=jnp.float32) / np.sqrt(hd), axis=-1)
    out = jnp.einsum("hnm,hmd->hnd", att, v,
                     preferred_element_type=jnp.float32)
    out = out.transpose(1, 0, 2).reshape(N, D)
    return out @ p[f"{prefix}.proj_w"] + p[f"{prefix}.proj_b"]


def _block(x, p, i, n_heads, eps, rope=None):
    pre = f"blocks.{i}"
    h = _layer_norm(x, p[f"{pre}.norm1_g"], p[f"{pre}.norm1_b"], eps)
    h = _attention(h, p, f"{pre}.attn", n_heads, rope=rope)
    if f"{pre}.ls1" in p:
        h = h * p[f"{pre}.ls1"]
    x = x + h
    h = _layer_norm(x, p[f"{pre}.norm2_g"], p[f"{pre}.norm2_b"], eps)
    # exact (erf) GELU — HF "gelu"; jax defaults to the tanh approximation
    h = jax.nn.gelu(h @ p[f"{pre}.fc1_w"] + p[f"{pre}.fc1_b"],
                    approximate=False)
    h = h @ p[f"{pre}.fc2_w"] + p[f"{pre}.fc2_b"]
    if f"{pre}.ls2" in p:
        h = h * p[f"{pre}.ls2"]
    return x + h


class DinoEncoder:
    """DINO(v3) encoder: image [3,H,W] in [0,1] -> pooled embedding [D]."""

    def __init__(self, params: Dict[str, np.ndarray], patch: int = 16,
                 n_heads: int = 12, image_size: int = 224):
        self.patch = patch
        self.n_heads = n_heads
        self.image_size = image_size
        # meta_* entries are python-scalar config, not weights
        self.rope_theta = float(params["meta_rope_theta"]) \
            if "meta_rope_theta" in params else None
        self.ln_eps = float(params["meta_ln_eps"]) \
            if "meta_ln_eps" in params else (
                1e-5 if self.rope_theta is not None else 1e-12)
        self.params = {k: jnp.asarray(v) for k, v in params.items()
                       if not k.startswith("meta_")}

    @property
    def is_v3(self) -> bool:
        return self.rope_theta is not None

    @property
    def n_prefix(self) -> int:
        """Tokens before the patch tokens (CLS [+ registers])."""
        if self.is_v3 and "register_tokens" in self.params:
            return 1 + self.params["register_tokens"].shape[0]
        return 1

    def tokens(self, image: jnp.ndarray) -> jnp.ndarray:
        """Full forward -> all final-norm tokens [n_prefix+(S/p)^2, D]
        (CLS first, then registers for v3, then patches). The single
        forward-pass definition — the loss (__call__) and the CLS-patch
        heatmap visualization both ride it."""
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
        if self.is_v3:
            pre = [cls]
            if "register_tokens" in p:
                pre.append(p["register_tokens"])
            x = jnp.concatenate(pre + [x], axis=0)
            D = cls.shape[1]
            cos, sin = _rope_cos_sin(g, g, D // self.n_heads,
                                     self.rope_theta)
            rope = (cos, sin, self.n_prefix)
        else:
            x = jnp.concatenate([cls, x], axis=0) + p["pos_embed"]
            rope = None
        for i in range(self.n_layers):
            x = _block(x, p, i, self.n_heads, self.ln_eps, rope=rope)
        return _layer_norm(x, p["norm_g"], p["norm_b"], self.ln_eps)

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
                    params = {k: z[k] for k in z.files}
                meta = {k: params[k] for k in params if k.startswith("meta_")}
                return DinoEncoder(
                    params,
                    patch=int(meta.get("meta_patch", 16)),
                    n_heads=int(meta.get("meta_n_heads", 12)),
                    image_size=int(meta.get("meta_image_size", 224)))
        raise FileNotFoundError(
            f"No DINO weights found (set ${WEIGHT_ENV} or place "
            f"{DEFAULT_PATHS[0]})")

    @staticmethod
    def random(depth: int = 2, dim: int = 192, n_heads: int = 3,
               image_size: int = 64, patch: int = 16, seed: int = 0,
               n_registers: int = 4) -> "DinoEncoder":
        """Random-weight DINOv3-architecture tower (RoPE + registers +
        LayerScale) — matches the flagship path the real checkpoint uses."""
        rng = np.random.default_rng(seed)
        D = dim
        p = {
            "patch_w": rng.normal(0, 0.02, (3 * patch * patch, D)).astype(np.float32),
            "patch_b": np.zeros(D, np.float32),
            "cls_token": rng.normal(0, 0.02, (D,)).astype(np.float32),
            "register_tokens": rng.normal(0, 0.02, (n_registers, D)).astype(np.float32),
            "norm_g": np.ones(D, np.float32),
            "norm_b": np.zeros(D, np.float32),
            "meta_rope_theta": np.float32(100.0),
            "meta_ln_eps": np.float32(1e-5),
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
            p[f"{pre}.ls1"] = np.full(D, 1.0, np.float32)
            p[f"{pre}.ls2"] = np.full(D, 1.0, np.float32)
            p[f"{pre}.fc1_w"] = rng.normal(0, 0.02, (D, 4 * D)).astype(np.float32)
            p[f"{pre}.fc1_b"] = np.zeros(4 * D, np.float32)
            p[f"{pre}.fc2_w"] = rng.normal(0, 0.02, (4 * D, D)).astype(np.float32)
            p[f"{pre}.fc2_b"] = np.zeros(D, np.float32)
        return DinoEncoder(p, patch=patch, n_heads=n_heads,
                           image_size=image_size)


def _convert_dinov3(sd: Dict[str, np.ndarray], cfg) -> Dict[str, np.ndarray]:
    """`DINOv3ViTModel` state dict -> DinoEncoder params.

    Layout (transformers 4.57, modeling_dinov3_vit.py): embeddings.{cls_token,
    register_tokens, patch_embeddings.{weight,bias}}, layer.{i}.{norm1, norm2,
    attention.{q,k,v,o}_proj, layer_scale{1,2}.lambda1, mlp.{up,down}_proj},
    norm.{weight,bias}. key_bias=False -> zero k bias in the packed qkv_b."""
    D = int(cfg.hidden_size)
    out = {
        "patch_w": sd["embeddings.patch_embeddings.weight"].reshape(D, -1).T,
        "patch_b": sd["embeddings.patch_embeddings.bias"],
        "cls_token": sd["embeddings.cls_token"].reshape(-1),
        "norm_g": sd["norm.weight"],
        "norm_b": sd["norm.bias"],
        "meta_rope_theta": np.float32(cfg.rope_theta),
        "meta_ln_eps": np.float32(cfg.layer_norm_eps),
        "meta_patch": np.int32(cfg.patch_size),
        "meta_n_heads": np.int32(cfg.num_attention_heads),
        "meta_image_size": np.int32(cfg.image_size),
    }
    if int(getattr(cfg, "num_register_tokens", 0) or 0) > 0:
        out["register_tokens"] = sd["embeddings.register_tokens"].reshape(-1, D)
    if getattr(cfg, "use_gated_mlp", False):
        raise NotImplementedError(
            "gated-MLP DINOv3 variants (7B) are not supported; the "
            "reference uses vitb16 (plain MLP)")
    i = 0
    while f"layer.{i}.attention.q_proj.weight" in sd:
        pre = f"layer.{i}"
        q = sd[f"{pre}.attention.q_proj.weight"]
        k = sd[f"{pre}.attention.k_proj.weight"]
        v = sd[f"{pre}.attention.v_proj.weight"]
        out[f"blocks.{i}.attn.qkv_w"] = np.concatenate([q, k, v], 0).T

        def bias(name, key_pre=pre):
            full = f"{key_pre}.attention.{name}"
            return sd[full] if full in sd else np.zeros(D, np.float32)

        out[f"blocks.{i}.attn.qkv_b"] = np.concatenate(
            [bias("q_proj.bias"), bias("k_proj.bias"), bias("v_proj.bias")])
        out[f"blocks.{i}.attn.proj_w"] = sd[f"{pre}.attention.o_proj.weight"].T
        out[f"blocks.{i}.attn.proj_b"] = sd[f"{pre}.attention.o_proj.bias"]
        out[f"blocks.{i}.norm1_g"] = sd[f"{pre}.norm1.weight"]
        out[f"blocks.{i}.norm1_b"] = sd[f"{pre}.norm1.bias"]
        out[f"blocks.{i}.norm2_g"] = sd[f"{pre}.norm2.weight"]
        out[f"blocks.{i}.norm2_b"] = sd[f"{pre}.norm2.bias"]
        out[f"blocks.{i}.ls1"] = sd[f"{pre}.layer_scale1.lambda1"]
        out[f"blocks.{i}.ls2"] = sd[f"{pre}.layer_scale2.lambda1"]
        out[f"blocks.{i}.fc1_w"] = sd[f"{pre}.mlp.up_proj.weight"].T
        out[f"blocks.{i}.fc1_b"] = sd[f"{pre}.mlp.up_proj.bias"]
        out[f"blocks.{i}.fc2_w"] = sd[f"{pre}.mlp.down_proj.weight"].T
        out[f"blocks.{i}.fc2_b"] = sd[f"{pre}.mlp.down_proj.bias"]
        i += 1
    return out


def _convert_vit(sd: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
    """HF `ViTModel`/DINO(v1)/DINOv2-style state dict -> DinoEncoder params."""
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
    return out


def convert_hf_dino(model_name_or_path: str, out_path: str) -> str:
    """Convert a locally cached HF DINOv3 / plain-ViT checkpoint to the
    DinoEncoder npz layout. DINOv3 (`DINOv3ViTModel`, the reference's
    feature_extraction.py:20 flagship) is detected by its
    `layer.N.attention.q_proj` state-dict keys; the generic `ViTModel`
    layout remains supported for legacy conversions."""
    from transformers import AutoModel

    model = AutoModel.from_pretrained(model_name_or_path)
    sd = {k: v.detach().cpu().numpy() for k, v in model.state_dict().items()}

    if "layer.0.attention.q_proj.weight" in sd:
        out = _convert_dinov3(sd, model.config)
    else:
        out = _convert_vit(sd)
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **out)
    return out_path
