#!/usr/bin/env python3
"""DTU photometric benchmark driver (15 scans): train -> render -> metrics.

Pipeline parity with reference scripts/dtu_eval.py:44-69 (segmentation
preprocessing enabled, normal/dist/segment lambdas zeroed), rebuilt on the
gaussmart_tpu CLIs. Scenes are independent; on a multi-chip host set
GAUSSMART_PARALLEL_JOBS to run several scans concurrently (the TPU analog
of the reference's per-GPU job dispatch).
"""
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from scripts.driver_common import run_jobs, sh  # noqa: E402

DTU_SCENES = ["scan24", "scan37", "scan40", "scan55", "scan63", "scan65",
              "scan69", "scan83", "scan97", "scan105", "scan106", "scan110",
              "scan114", "scan118", "scan122"]

parser = ArgumentParser(description="Full DTU evaluation (photometric)")
parser.add_argument("--skip_training", action="store_true")
parser.add_argument("--skip_rendering", action="store_true")
parser.add_argument("--skip_metrics", action="store_true")
parser.add_argument("--output_path", default="eval/dtu")
parser.add_argument("--clean_pc", action="store_true")
parser.add_argument("--dtu", "-dtu", type=str, default=None)
args = parser.parse_args()

if not args.skip_training:
    assert args.dtu, "--dtu dataset root required for training"
    seg = ("--dataset_type dtu --run_segmentation --lambda_normal 0.0 "
           "--lambda_dist 0.0 --lambda_segment 0.0")
    if args.clean_pc:
        seg += " --clean"
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.train -s {args.dtu}/{s} "
        f"-m {args.output_path}/{s} --quiet --eval {seg}"
        for s in DTU_SCENES])

if not args.skip_rendering:
    assert args.dtu, "--dtu dataset root required for rendering"
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.render_cli --iteration 30000 "
        f"-s {args.dtu}/{s} -m {args.output_path}/{s} --quiet --skip_mesh"
        for s in DTU_SCENES])

if not args.skip_metrics:
    sh(f"{sys.executable} -m gaussmart_tpu.eval.metrics_cli -m "
       + " ".join(f"{args.output_path}/{s}" for s in DTU_SCENES))
