#!/usr/bin/env python3
"""NeRF-synthetic benchmark driver (8 scenes, white background).

Pipeline parity with reference scripts/nerf_eval.py:10-40; the reference's
GPUtil multi-GPU job dispatcher maps to GAUSSMART_PARALLEL_JOBS workers
(scenes are independent single-chip jobs)."""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from scripts.driver_common import run_jobs, sh  # noqa: E402

NERF_SCENES = ["chair", "drums", "ficus", "hotdog", "lego", "materials",
               "mic", "ship"]

parser = ArgumentParser(description="Full NeRF-synthetic evaluation")
parser.add_argument("--skip_training", action="store_true")
parser.add_argument("--skip_rendering", action="store_true")
parser.add_argument("--skip_metrics", action="store_true")
parser.add_argument("--output_path", default="./eval/nerf")
parser.add_argument("--nerf", type=str, default=None)
args = parser.parse_args()

if not args.skip_training:
    assert args.nerf
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.train -s {args.nerf}/{s} "
        f"-m {args.output_path}/{s} --eval --white_background "
        f"--lambda_normal 0.0 --quiet"
        for s in NERF_SCENES])

if not args.skip_rendering:
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.render_cli "
        f"-m {args.output_path}/{s} --skip_train --skip_mesh --quiet"
        for s in NERF_SCENES])

if not args.skip_metrics:
    sh(f"{sys.executable} -m gaussmart_tpu.eval.metrics_cli -m "
       + " ".join(f"{args.output_path}/{s}" for s in NERF_SCENES))
