"""Measure the rasterizer duplicate workload of a saved model snapshot.

For each training camera of a scene, computes the total wanted
(splat, 16x16-tile) pairs — the untruncated CUDA-parity duplicate count
(rasterize_points.cu duplicates into every touched tile) — and reports
wants/active-splat statistics. Used to calibrate bench.py's synthetic
scene against REAL mid-training footprint distributions (the bench's
vs_baseline is only meaningful if its duplicate workload matches what a
real training iteration rasterizes).

Usage: python scripts/measure_wants.py -m /tmp/calib_run -s /tmp/scene_r2b \
           [-r 1] [--iteration -1]
"""
from __future__ import annotations

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("-r", "--resolution", type=int, default=1)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--sh_degree", type=int, default=3)
    args = ap.parse_args()

    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    import jax
    import jax.numpy as jnp

    from gaussmart_tpu.config import ModelParams
    from gaussmart_tpu.io.gaussian_ply import load_gaussian_ply
    from gaussmart_tpu.scene import Scene
    from gaussmart_tpu.render.raster_common import preprocess
    from gaussmart_tpu.render.raster_pallas import TILE

    snaps = sorted(glob.glob(os.path.join(
        args.model_path, "point_cloud", "iteration_*")),
        key=lambda p: int(p.rsplit("_", 1)[1]))
    if args.iteration >= 0:
        snaps = [s for s in snaps
                 if int(s.rsplit("_", 1)[1]) == args.iteration]
    mp = ModelParams()
    mp.source_path = args.source_path
    mp.model_path = args.model_path
    mp.resolution = args.resolution
    mp.sh_degree = args.sh_degree
    scene = Scene(mp, load_iteration=int(
        snaps[-1].rsplit("_", 1)[1]), shuffle=False)
    cams = scene.get_train_cameras()

    for snap in snaps:
        it = int(snap.rsplit("_", 1)[1])
        state = load_gaussian_ply(os.path.join(snap, "point_cloud.ply"),
                                  args.sh_degree)
        p = state.params
        active = np.asarray(state.aux.active)
        n_active = int(active.sum())
        ratios, totals = [], []
        for cam in cams:
            cp = cam.params()
            prep = preprocess(
                jnp.asarray(p.xyz), jnp.exp(jnp.asarray(p.scaling)),
                jnp.asarray(p.rotation),
                jax.nn.sigmoid(jnp.asarray(p.opacity[:, 0])),
                jnp.concatenate([jnp.asarray(p.features_dc),
                                 jnp.asarray(p.features_rest)], axis=1),
                jnp.asarray(state.aux.active), cp, args.sh_degree)
            tiles_x = (cp.width + TILE - 1) // TILE
            tiles_y = (cp.height + TILE - 1) // TILE
            rx = np.asarray(prep.rx)
            ry = np.asarray(prep.ry)
            cx, cy = np.asarray(prep.center2d).T
            val = np.asarray(prep.valid) & (rx > 0) & (ry > 0)
            tx0 = np.clip(np.floor((cx - rx) / TILE), 0, tiles_x)
            tx1 = np.clip(np.floor((cx + rx) / TILE) + 1, 0, tiles_x)
            ty0 = np.clip(np.floor((cy - ry) / TILE), 0, tiles_y)
            ty1 = np.clip(np.floor((cy + ry) / TILE) + 1, 0, tiles_y)
            want = np.where(val, (tx1 - tx0) * (ty1 - ty0), 0)
            totals.append(want.sum())
            ratios.append(want.sum() / max(n_active, 1))
        print(f"iter {it:6d}: active {n_active:8d}  "
              f"wants/active mean {np.mean(ratios):6.2f} "
              f"min {np.min(ratios):6.2f} max {np.max(ratios):6.2f}  "
              f"(total mean {np.mean(totals)/1e6:.3f}M over {len(cams)} cams)")


if __name__ == "__main__":
    main()
