"""Metrics CLI — `python -m gaussmart_tpu.eval.metrics_cli -m <models...>`.

Output parity with reference metrics.py:36-92: reads
`<model>/test/ours_N/{renders,gt}`, computes per-view SSIM/PSNR/LPIPS(vgg),
writes `results.json` + `per_view.json` with the same schema. LPIPS is
skipped (null) when no local weights exist (no-egress environment); the
LPIPS net is built once, not per image (fixes SURVEY.md §7.10).
"""
from __future__ import annotations

import json
import os
from argparse import ArgumentParser
from pathlib import Path

import numpy as np


def read_images(renders_dir: Path, gt_dir: Path):
    from PIL import Image

    renders, gts, names = [], [], []
    for fname in sorted(os.listdir(renders_dir)):
        with Image.open(renders_dir / fname) as r:
            renders.append(np.asarray(r, np.float32)[..., :3].transpose(2, 0, 1) / 255.0)
        with Image.open(gt_dir / fname) as g:
            gts.append(np.asarray(g, np.float32)[..., :3].transpose(2, 0, 1) / 255.0)
        names.append(fname)
    return renders, gts, names


def evaluate(model_paths, use_lpips: bool = True):
    import jax.numpy as jnp
    from gaussmart_tpu.ops.image import psnr as psnr_fn
    from gaussmart_tpu.ops.ssim import ssim as ssim_fn
    from gaussmart_tpu.eval import lpips_jax

    lpips = lpips_jax.load_lpips("vgg") if use_lpips else None
    if use_lpips and lpips is None:
        print("[metrics] LPIPS weights not found "
              f"(set ${lpips_jax.WEIGHT_ENV}); reporting LPIPS as null")

    full = {}
    per_view = {}
    for scene_dir in model_paths:
        try:
            print("Scene:", scene_dir)
            full[scene_dir] = {}
            per_view[scene_dir] = {}
            test_dir = Path(scene_dir) / "test"
            for method in os.listdir(test_dir):
                print("Method:", method)
                mdir = test_dir / method
                renders, gts, names = read_images(mdir / "renders", mdir / "gt")
                ssims, psnrs, lpipss = [], [], []
                for r, g in zip(renders, gts):
                    r = jnp.asarray(r)
                    g = jnp.asarray(g)
                    ssims.append(float(ssim_fn(r, g)))
                    psnrs.append(float(psnr_fn(r[None], g[None])[0, 0]))
                    if lpips is not None:
                        lpipss.append(float(lpips(r, g)[0]))
                print(f"  SSIM : {np.mean(ssims):>12.7f}")
                print(f"  PSNR : {np.mean(psnrs):>12.7f}")
                if lpipss:
                    print(f"  LPIPS: {np.mean(lpipss):>12.7f}")
                full[scene_dir][method] = {
                    "SSIM": float(np.mean(ssims)),
                    "PSNR": float(np.mean(psnrs)),
                    "LPIPS": float(np.mean(lpipss)) if lpipss else None,
                }
                per_view[scene_dir][method] = {
                    "SSIM": dict(zip(names, map(float, ssims))),
                    "PSNR": dict(zip(names, map(float, psnrs))),
                    "LPIPS": (dict(zip(names, map(float, lpipss)))
                              if lpipss else {}),
                }
            with open(os.path.join(scene_dir, "results.json"), "w") as fp:
                json.dump(full[scene_dir], fp, indent=True)
            with open(os.path.join(scene_dir, "per_view.json"), "w") as fp:
                json.dump(per_view[scene_dir], fp, indent=True)
        except Exception as e:
            print(f"Unable to compute metrics for model {scene_dir}: {e}")
    return full


def main(argv=None):
    from gaussmart_tpu.runtime import setup as _runtime_setup
    _runtime_setup()
    parser = ArgumentParser(description="metric evaluation")
    parser.add_argument("--model_paths", "-m", required=True, nargs="+")
    parser.add_argument("--no_lpips", action="store_true")
    args = parser.parse_args(argv)
    evaluate(args.model_paths, use_lpips=not args.no_lpips)


if __name__ == "__main__":
    main()
