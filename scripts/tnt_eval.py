#!/usr/bin/env python3
"""Tanks & Temples benchmark driver: train (with DINO passthrough) ->
unbounded/bounded mesh -> F-score vs official GT.

Pipeline parity with reference scripts/tnt_eval.py:22-73 (incl. the
--dino_start_iter/--lambda_dino passthrough unique to this driver)."""
import os
import sys
from argparse import ArgumentParser
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
from scripts.driver_common import run_jobs, sh  # noqa: E402

TNT_SCENES = ["Barn", "Caterpillar", "Ignatius", "Truck"]
TNT_LARGE = ["Meetingroom", "Courthouse"]

parser = ArgumentParser(description="Full TnT evaluation")
parser.add_argument("--skip_training", action="store_true")
parser.add_argument("--skip_rendering", action="store_true")
parser.add_argument("--skip_metrics", action="store_true")
parser.add_argument("--output_path", default="./eval/tnt")
parser.add_argument("--TNT_data", type=str, default=None)
parser.add_argument("--TNT_GT", type=str, default=None)
parser.add_argument("--dino_start_iter", type=int, default=3000)
parser.add_argument("--lambda_dino", type=float, default=0.05)
args = parser.parse_args()

ALL = TNT_SCENES + TNT_LARGE

if not args.skip_training:
    assert args.TNT_data
    common = (f"--quiet --eval --depth_ratio 1.0 -r 2 "
              f"--dino_start_iter {args.dino_start_iter} "
              f"--lambda_dino {args.lambda_dino}")
    cmds = []
    for s in TNT_SCENES:
        cmds.append(f"{sys.executable} -m gaussmart_tpu.train "
                    f"-s {args.TNT_data}/{s} -m {args.output_path}/{s} "
                    f"{common} --lambda_dist 100")
    for s in TNT_LARGE:
        cmds.append(f"{sys.executable} -m gaussmart_tpu.train "
                    f"-s {args.TNT_data}/{s} -m {args.output_path}/{s} "
                    f"{common} --lambda_dist 10")
    run_jobs(cmds)

if not args.skip_rendering:
    assert args.TNT_data
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.render_cli --iteration 30000 "
        f"-s {args.TNT_data}/{s} -m {args.output_path}/{s} --quiet "
        f"--depth_ratio 1.0 --num_cluster 1 --unbounded --mesh_res 1024"
        for s in ALL])

if not args.skip_metrics:
    assert args.TNT_GT
    for s in ALL:
        sh(f"{sys.executable} -m gaussmart_tpu.eval.tnt_fscore "
           f"--dataset-dir {args.TNT_GT}/{s} "
           f"--traj-path {args.TNT_GT}/{s}/{s}_COLMAP_SfM.log "
           f"--ply-path {args.output_path}/{s}/train/ours_30000/fuse_unbounded_post.ply "
           f"--out-dir {args.output_path}/{s}")
