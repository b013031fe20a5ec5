"""Profile the north-star train step on the real TPU and print an op-level
time breakdown parsed from the captured trace.

Usage: python scripts/profile_step.py [--mode train|render] [--steps 12]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(mode: str):
    import jax
    import jax.numpy as jnp

    from gaussmart_tpu.runtime import setup
    setup()
    from gaussmart_tpu.cameras import Camera
    from gaussmart_tpu.config import OptimizationParams
    from gaussmart_tpu.models.gaussians import init_from_pcd
    from gaussmart_tpu.optim import init_adam
    from gaussmart_tpu.train_lib import make_train_step

    n = int(os.environ.get("BENCH_SPLATS", 100_000))
    width = int(os.environ.get("BENCH_W", 776))
    height = int(os.environ.get("BENCH_H", 584))
    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(2.0, 5.0, n)], axis=1).astype(np.float32)
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=3, spatial_lr_scale=1.0,
                          capacity=((n + 255) // 256) * 256)
    import dataclasses as dc
    from gaussmart_tpu.transforms import inverse_sigmoid
    op = np.where(rng.random(n) < 0.6, rng.uniform(0.7, 0.99, n),
                  rng.uniform(0.05, 0.3, n)).astype(np.float32)
    state = state.replace(params=dc.replace(
        state.params,
        opacity=state.params.opacity.at[:n, 0].set(
            np.asarray(inverse_sigmoid(op)))))
    cams = []
    for i in range(4):
        ang = 0.1 * i
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"c{i}", R=R,
                           T=np.array([0.1 * i, 0.0, 0.0]), fovx=1.2,
                           fovy=0.9, width=width, height=height).params())
    gts = [jnp.asarray(rng.random((3, height, width)), jnp.float32)
           for _ in cams]
    opt = OptimizationParams()
    budget = tuple(int(x) for x in
                   os.environ.get("BENCH_BUDGET", "16,4").split(","))
    # donate=True matches bench.py's train-step program exactly, so the
    # profiler reuses the persistent-cache entry the bench already paid for
    # (a fresh full-step compile through the axon tunnel can take 10-25 min)
    step = make_train_step(opt, sh_degree=3, white_background=False,
                           backend="auto", spatial_lr_scale=1.0, donate=True,
                           raster_budget=budget)
    return step, state, cams, gts


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--mode", choices=["train", "render"], default="train")
    ap.add_argument("--steps", type=int, default=12)
    ap.add_argument("--outdir", default="/tmp/gs_profile")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    step, state, cams, gts = build("train")
    from gaussmart_tpu.optim import init_adam
    params, adam, aux = state.params, init_adam(state.params), state.aux
    it = jnp.asarray(1, jnp.int32)

    if args.mode == "render":
        # forward-only: chain a cheap frame statistic into the next call's
        # bg so dispatches can't pipeline/elide over the tunnel
        from gaussmart_tpu.render.api import render

        @jax.jit
        def frame(state, cam, bg):
            out = render(cam, state, bg, backend="auto")
            return out["render"], out["render"].mean() * 1e-30

        state0 = state
        bgv = jnp.zeros(3)
        img, leak = frame(state0, cams[0], bgv)
        jax.block_until_ready(img)

        def run(n):
            lk = leak
            for i in range(n):
                img, lk = frame(state0, cams[i % 4], bgv + lk)
            jax.block_until_ready(img)
    else:
        params, adam, aux, m, it = step(params, adam, aux, cams[0], gts[0],
                                        it)
        jax.block_until_ready(params.xyz)

        def run(n):
            nonlocal params, adam, aux, it
            for i in range(n):
                params, adam, aux, m, it = step(params, adam, aux,
                                                cams[i % 4], gts[i % 4], it)
            jax.block_until_ready(params.xyz)

    os.system(f"rm -rf {args.outdir}")
    with jax.profiler.trace(args.outdir):
        t0 = time.perf_counter()
        run(args.steps)
        dt = time.perf_counter() - t0
    print(f"steps={args.steps} wall={dt:.3f}s  it/s={args.steps/dt:.2f}")

    traces = glob.glob(f"{args.outdir}/**/*.trace.json.gz", recursive=True)
    if not traces:
        print("no trace found under", args.outdir)
        return
    with gzip.open(sorted(traces)[-1], "rt") as f:
        trace = json.load(f)
    events = trace.get("traceEvents", [])
    # find device-side complete events; bucket by op name
    buckets = defaultdict(float)
    counts = defaultdict(int)
    total = 0.0
    pid_names = {e.get("pid"): e.get("args", {}).get("name", "")
                 for e in events if e.get("ph") == "M"
                 and e.get("name") == "process_name"}
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        pname = pid_names.get(pid, "")
        if "TPU" not in pname and "/device" not in pname.lower():
            continue
        name = e.get("name", "")
        dur = e.get("dur", 0) / 1e3  # ms
        # collapse xla op name: strip .NNN suffixes and fusion ids
        base = name if os.environ.get("PROFILE_FULL") else name.split(".")[0]
        buckets[base] += dur
        counts[base] += 1
        total += dur
    rows = sorted(buckets.items(), key=lambda kv: -kv[1])
    print(f"\ndevice total {total:.1f} ms over {args.steps} steps "
          f"({total/args.steps:.2f} ms/step)")
    for name, ms in rows[:28]:
        print(f"  {ms/args.steps:8.3f} ms/step  x{counts[name]//args.steps:<4d} {name}")


if __name__ == "__main__":
    main()
