#!/usr/bin/env python3
"""DTU geometry benchmark driver: train (mesh recipe) -> TSDF mesh ->
Chamfer vs official STL ground truth.

Recipe parity with reference scripts/dtu_eval_mesh.py:22-50:
`--depth_ratio 1.0 -r 2 --lambda_dist 1000`, TSDF voxel .004 sdf_trunc
.016 depth_trunc 3.0, then Chamfer with ObsMask filtering.
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

parser = ArgumentParser(description="Full DTU evaluation (mesh/Chamfer)")
parser.add_argument("--skip_training", action="store_true")
parser.add_argument("--skip_rendering", action="store_true")
parser.add_argument("--skip_metrics", action="store_true")
parser.add_argument("--output_path", default="./eval/dtu")
parser.add_argument("--dtu", "-dtu", type=str, default=None)
parser.add_argument("--DTU_Official", "-DTU", type=str, default=None)
args = parser.parse_args()

if not args.skip_training:
    assert args.dtu
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.train -s {args.dtu}/{s} "
        f"-m {args.output_path}/{s} --quiet --depth_ratio 1.0 -r 2 "
        f"--lambda_dist 1000"
        for s in DTU_SCENES])

if not args.skip_rendering:
    assert args.dtu
    run_jobs([
        f"{sys.executable} -m gaussmart_tpu.render_cli --iteration 30000 "
        f"-s {args.dtu}/{s} -m {args.output_path}/{s} --quiet --skip_train "
        f"--depth_ratio 1.0 --num_cluster 1 --voxel_size 0.004 "
        f"--sdf_trunc 0.016 --depth_trunc 3.0"
        for s in DTU_SCENES])

if not args.skip_metrics:
    assert args.DTU_Official
    script_dir = os.path.dirname(os.path.abspath(__file__))
    for s in DTU_SCENES:
        scan_id = s[4:]
        sh(f"{sys.executable} -m gaussmart_tpu.eval.cull "
           f"--input_mesh {args.output_path}/{s}/train/ours_30000/fuse_post.ply "
           f"--scan_id {scan_id} --output_dir {script_dir}/tmp/scan{scan_id} "
           f"--mask_dir {args.dtu} --DTU {args.DTU_Official}")
