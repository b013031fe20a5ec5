"""One-command weight conversion + golden verification (weights contingency).

This image has no network egress, so the pretrained towers the paper's
flagship terms need (DINOv3 ViT-B/16, LPIPS vgg/alex, SAM) cannot be
downloaded here. The JAX architectures and converters are already
activation-level golden-tested against the torch originals with random
weights (tests/test_converters.py); THIS script is the missing last mile:
the moment real checkpoints are reachable (HF cache mounted, weights
copied in, or egress enabled), one command converts everything, re-runs
the activation-level golden check against the torch source model with the
REAL weights, and installs the .npz files where the framework looks for
them — so the differentiable DINO loss (train.py --lambda_dino,
reference train.py:119-129), LPIPS metrics (reference metrics.py:73,
lpipsPyTorch/), and real SAM segmentation (reference
identification/sam.py:16-63) all run the same hour.

Usage (any subset; each source may be an HF id resolvable from the local
cache, an HF snapshot dir, or a .pth/.bin file):

  python scripts/fetch_and_convert_weights.py \
      --dino facebook/dinov3-vitb16-pretrain-lvd1689m \
      --lpips-vgg /path/vgg16-397923af.pth --lpips-vgg-lin /path/vgg_lin.pth \
      --lpips-alex /path/alexnet-owt.pth --lpips-alex-lin /path/alex_lin.pth \
      --sam /path/sam_vit_h_4b8939.pth

  # or let torchvision/transformers resolve from their default caches:
  python scripts/fetch_and_convert_weights.py --dino ... --lpips-vgg auto

Outputs land in ~/.cache/gaussmart_tpu/ (a default search path for
gaussmart_tpu.semantics.dino.DinoEncoder.create and
gaussmart_tpu.eval.lpips_jax.load_lpips). Every conversion is verified by
running BOTH towers on the same random image and asserting atol 2e-4
agreement — the exact bar tests/test_converters.py sets.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = os.path.expanduser("~/.cache/gaussmart_tpu")


def _ok(msg):
    print(f"  [ok] {msg}")


def convert_dino(src: str) -> str:
    import torch
    from transformers import AutoModel

    from gaussmart_tpu.semantics.dino import (IMAGENET_MEAN, IMAGENET_STD,
                                              DinoEncoder, convert_hf_dino)

    out_path = os.path.join(CACHE, "dino_vitb16.npz")
    print(f"[dino] converting {src} -> {out_path}")
    npz = convert_hf_dino(src, out_path)

    # Golden check with the REAL weights: JAX CLS embedding vs torch
    # last_hidden_state[0, 0] on the same normalized image.
    model = AutoModel.from_pretrained(src).eval()
    cfg = model.config
    with np.load(npz) as z:
        params = {k: z[k] for k in z.files}
    enc = DinoEncoder(params, patch=cfg.patch_size,
                      n_heads=cfg.num_attention_heads,
                      image_size=cfg.image_size)
    rng = np.random.default_rng(0)
    img = rng.random((3, cfg.image_size, cfg.image_size)).astype(np.float32)
    ours = np.asarray(enc(img))
    x = (img - IMAGENET_MEAN[:, None, None]) / IMAGENET_STD[:, None, None]
    with torch.no_grad():
        theirs = model(pixel_values=torch.from_numpy(x[None])
                       ).last_hidden_state[0, 0].numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
    _ok(f"DINO activation parity atol 2e-4 ({ours.shape[0]}-d embedding); "
        f"training picks it up automatically (or set "
        f"GAUSSMART_DINO_WEIGHTS={npz})")
    return npz


def _load_torch_sd(path_or_auto: str, tv_builder):
    """State dict from a .pth file, or from torchvision's cache ('auto')."""
    import torch
    if path_or_auto != "auto":
        sd = torch.load(path_or_auto, map_location="cpu", weights_only=True)
        return sd.state_dict() if hasattr(sd, "state_dict") else sd
    return tv_builder(weights="DEFAULT").state_dict()


def _build_features(net: str):
    """Hand-built torch feature stacks with torchvision-matching state-dict
    keys (this image has no torchvision; 'auto' sources still use it when
    importable). Returns (nn.Sequential, 0-based tap indices)."""
    import torch
    import torch.nn as nn

    if net == "vgg":
        layers, cin = [], 3
        for v in [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
                  512, 512, 512, "M", 512, 512, 512, "M"]:
            if v == "M":
                layers.append(nn.MaxPool2d(2, 2))
            else:
                layers += [nn.Conv2d(cin, v, 3, 1, 1), nn.ReLU()]
                cin = v
        return nn.Sequential(*layers), [3, 8, 15, 22, 29]
    if net == "alex":
        return nn.Sequential(
            nn.Conv2d(3, 64, 11, 4, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
            nn.Conv2d(64, 192, 5, 1, 2), nn.ReLU(), nn.MaxPool2d(3, 2),
            nn.Conv2d(192, 384, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(384, 256, 3, 1, 1), nn.ReLU(),
            nn.Conv2d(256, 256, 3, 1, 1), nn.ReLU(),
            nn.MaxPool2d(3, 2)), [1, 4, 7, 9, 11]

    class Fire(nn.Module):
        def __init__(self, cin, sq, ex):
            super().__init__()
            self.squeeze = nn.Conv2d(cin, sq, 1)
            self.expand1x1 = nn.Conv2d(sq, ex, 1)
            self.expand3x3 = nn.Conv2d(sq, ex, 3, padding=1)

        def forward(self, x):
            s = torch.relu(self.squeeze(x))
            return torch.cat([torch.relu(self.expand1x1(s)),
                              torch.relu(self.expand3x3(s))], 1)

    return nn.Sequential(
        nn.Conv2d(3, 64, 3, stride=2), nn.ReLU(),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(64, 16, 64), Fire(128, 16, 64),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(128, 32, 128), Fire(256, 32, 128),
        nn.MaxPool2d(3, 2, ceil_mode=True),
        Fire(256, 48, 192), Fire(384, 48, 192),
        Fire(384, 64, 256), Fire(512, 64, 256)), [1, 4, 7, 9, 10, 11, 12]


def convert_lpips(net: str, backbone_src: str, lin_src: str) -> str:
    import torch

    from gaussmart_tpu.eval import lpips_jax

    out_path = os.path.join(CACHE, f"lpips_{net}.npz")
    print(f"[lpips-{net}] converting backbone={backbone_src} "
          f"lin={lin_src} -> {out_path}")

    def builder(weights=None):
        import torchvision  # only needed for 'auto' cache resolution
        return {"vgg": torchvision.models.vgg16,
                "alex": torchvision.models.alexnet,
                "squeeze": torchvision.models.squeezenet1_1}[net](
                    weights=weights)

    backbone_sd = _load_torch_sd(backbone_src, builder)
    lin_sd = torch.load(lin_src, map_location="cpu", weights_only=True)
    if hasattr(lin_sd, "state_dict"):
        lin_sd = lin_sd.state_dict()
    # richzhang checkpoints key as lin0.model.1.weight / lins.0.model.1.weight
    npz = lpips_jax.convert_torch_lpips(
        {k: np.asarray(v) for k, v in backbone_sd.items()},
        {k: np.asarray(v) for k, v in lin_sd.items()}, net, out_path)

    # Golden check: JAX LPIPS vs a reference-faithful torch evaluation
    # (lpipsPyTorch/modules semantics) with the same real weights.
    with np.load(npz) as z:
        params = {k: z[k] for k in z.files}
    jl = lpips_jax.LPIPS(params, net)
    feats, taps = _build_features(net)
    feats.load_state_dict({k[len("features."):]: torch.as_tensor(np.asarray(v))
                           for k, v in backbone_sd.items()
                           if k.startswith("features.")})
    feats = feats.eval()
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def norm(t, eps=1e-10):
        return t / (t.pow(2).sum(1, keepdim=True).sqrt() + eps)

    def lin_w(i):
        for cand in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if cand in lin_sd:
                return torch.as_tensor(np.asarray(lin_sd[cand]))
        raise KeyError(f"lin{i}")

    rng = np.random.default_rng(1)
    a = rng.random((3, 64, 64)).astype(np.float32)
    b = rng.random((3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        fx = (torch.from_numpy(a[None]) * 2 - 1 - shift) / scale
        fy = (torch.from_numpy(b[None]) * 2 - 1 - shift) / scale
        total = 0.0
        for i, m in enumerate(feats):
            fx, fy = m(fx), m(fy)
            if i in taps:
                j = taps.index(i)
                d = (norm(fx) - norm(fy)).pow(2)
                total = total + (d * lin_w(j)).sum(1, keepdim=True).mean(
                    [2, 3])
        theirs = float(total.sum())
    ours = float(np.asarray(jl(a, b))[0])
    np.testing.assert_allclose(ours, theirs, atol=2e-4, rtol=1e-3)
    _ok(f"LPIPS-{net} score parity atol 2e-4 (ours={ours:.6f}); metrics "
        f"CLI picks it up automatically (or set GAUSSMART_LPIPS_WEIGHTS)")
    return npz


def check_sam(ckpt: str):
    """SAM runs through its own package (no conversion — the segmentation
    pipeline calls it offline, reference identification/sam.py); just
    validate the checkpoint is loadable and print the invocation."""
    if not os.path.exists(ckpt):
        raise FileNotFoundError(ckpt)
    print(f"[sam] checkpoint found: {ckpt}")
    try:
        from segment_anything import sam_model_registry  # noqa: F401
        _ok("segment_anything importable — pass "
            f"--sam_checkpoint {ckpt} to the identification pipeline")
    except ImportError:
        print("  [warn] segment_anything package not installed; the "
              "pipeline will keep the classical fallback until it is")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--dino", help="HF id / snapshot dir for DINO ViT")
    ap.add_argument("--lpips-vgg", help="'auto' (torchvision cache) or .pth")
    ap.add_argument("--lpips-vgg-lin", help="richzhang vgg lin .pth")
    ap.add_argument("--lpips-alex", help="'auto' or .pth")
    ap.add_argument("--lpips-alex-lin", help="richzhang alex lin .pth")
    ap.add_argument("--lpips-squeeze", help="'auto' or squeezenet1_1 .pth")
    ap.add_argument("--lpips-squeeze-lin", help="richzhang squeeze lin .pth")
    ap.add_argument("--sam", help="SAM vit_h / SAM2 checkpoint path")
    args = ap.parse_args()

    os.makedirs(CACHE, exist_ok=True)
    did = []
    if args.dino:
        did.append(convert_dino(args.dino))
    if args.lpips_vgg:
        if not args.lpips_vgg_lin:
            ap.error("--lpips-vgg needs --lpips-vgg-lin (richzhang weights)")
        did.append(convert_lpips("vgg", args.lpips_vgg, args.lpips_vgg_lin))
    if args.lpips_alex:
        if not args.lpips_alex_lin:
            ap.error("--lpips-alex needs --lpips-alex-lin")
        did.append(convert_lpips("alex", args.lpips_alex,
                                 args.lpips_alex_lin))
    if args.lpips_squeeze:
        if not args.lpips_squeeze_lin:
            ap.error("--lpips-squeeze needs --lpips-squeeze-lin")
        did.append(convert_lpips("squeeze", args.lpips_squeeze,
                                 args.lpips_squeeze_lin))
    if args.sam:
        check_sam(args.sam)
    if not (args.dino or args.lpips_vgg or args.lpips_alex
            or args.lpips_squeeze or args.sam):
        ap.error("nothing to do — pass at least one of "
                 "--dino/--lpips-vgg/--lpips-alex/--sam")
    if did:
        print("\nConverted + verified:")
        for p in did:
            print(f"  {p}")


if __name__ == "__main__":
    main()
