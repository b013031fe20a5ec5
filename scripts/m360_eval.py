#!/usr/bin/env python3
"""Mip-NeRF 360 benchmark driver (5 outdoor -r4 + 4 indoor -r2 scenes),
pipeline parity with reference scripts/m360_eval.py."""
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from scripts.driver_common import run_jobs, sh  # noqa: E402

OUTDOOR = ["bicycle", "flowers", "garden", "stump", "treehill"]
INDOOR = ["room", "counter", "kitchen", "bonsai"]

parser = ArgumentParser(description="Full Mip-NeRF360 evaluation")
parser.add_argument("--skip_training", action="store_true")
parser.add_argument("--skip_rendering", action="store_true")
parser.add_argument("--skip_metrics", action="store_true")
parser.add_argument("--output_path", default="./eval/m360")
parser.add_argument("--m360", "-m360", type=str, default=None)
args = parser.parse_args()

scene_res = [(s, 4) for s in OUTDOOR] + [(s, 2) for s in INDOOR]

if not args.skip_training:
    assert args.m360
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.train -s {args.m360}/{s} "
        f"-m {args.output_path}/{s} --quiet --eval -r {r} --depth_ratio 0.0"
        for s, r in scene_res])

if not args.skip_rendering:
    assert args.m360
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.render_cli --iteration 30000 "
        f"-s {args.m360}/{s} -m {args.output_path}/{s} --quiet --skip_mesh"
        for s, _ in scene_res])

if not args.skip_metrics:
    sh(f"{sys.executable} -m gaussmart_tpu.eval.metrics_cli -m "
       + " ".join(f"{args.output_path}/{s}" for s, _ in scene_res))
