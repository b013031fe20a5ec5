"""Benchmark: training iterations/second on a synthetic DTU-scale scene.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Scene shape mirrors the DTU scan24 half-res recipe (BASELINE.md): ~100k
splats at 777x582 would be the full target; the benchmark scales within the
available chip. `vs_baseline` is measured against the north-star rate of
30k iterations in 30 minutes (16.67 it/s, BASELINE.md "Rebuild targets").

Env overrides: BENCH_SPLATS, BENCH_W, BENCH_H, BENCH_ITERS, BENCH_BACKEND,
BENCH_MODE=train|render (render reports forward FPS vs a 30 FPS baseline).
"""
from __future__ import annotations

import json
import os
import time

import numpy as np

NORTH_STAR_ITERS_PER_SEC = 30_000 / (30 * 60)


def main():
    import jax
    import jax.numpy as jnp

    from gaussmart_tpu.runtime import setup as _runtime_setup
    _runtime_setup()

    from gaussmart_tpu.cameras import Camera
    from gaussmart_tpu.config import OptimizationParams
    from gaussmart_tpu.models.gaussians import init_from_pcd
    from gaussmart_tpu.optim import init_adam
    from gaussmart_tpu.train_lib import make_train_step

    n = int(os.environ.get("BENCH_SPLATS", 100_000))
    width = int(os.environ.get("BENCH_W", 776))
    height = int(os.environ.get("BENCH_H", 584))
    iters = int(os.environ.get("BENCH_ITERS", 30))
    backend = os.environ.get("BENCH_BACKEND", "auto")
    # Zero-drop duplicate budget for this scene (measured): the bench is an
    # UNTRUNCATED CUDA-parity workload — every (splat, tile) pair that can
    # contribute is composited, like the reference kernel. Interval binning
    # culls the rect wants (1.252M pairs) to the 741-787k pairs whose tile
    # actually meets the c_cut level conic or filter disc (the rest
    # composite exactly zero; the CUDA kernel pays for them, we don't).
    # (16,4) = W=8N work slots is where the trainer's +1N adaptive
    # escalation lands from (16,3) on this scene: 7N drops ~3%, 8N reaches
    # zero drops on all 4 bench cameras (measured 2026-08-20; the round-3
    # ~1.3x policy overshot to (20,4)=9N, which benched 13.85 vs 14.28 it/s
    # at 8N — same tree, same chip).
    budget = tuple(int(x) for x in
                   os.environ.get("BENCH_BUDGET", "16,4").split(","))

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(-1, 1, n), rng.uniform(-1, 1, n),
                    rng.uniform(2.0, 5.0, n)], axis=1).astype(np.float32)
    state = init_from_pcd(pts, rng.random((n, 3)).astype(np.float32), None,
                          max_sh_degree=3, spatial_lr_scale=1.0,
                          capacity=((n + 255) // 256) * 256)
    # mid-training opacity distribution (bimodal: mostly near-opaque surfel
    # cores + a translucent tail), matching the workload the north-star
    # metric describes; uniform init-opacity would make every pixel
    # composite hundreds of splats, which no real training iteration does.
    import dataclasses as _dc
    from gaussmart_tpu.transforms import inverse_sigmoid as _is
    op = np.where(rng.random(n) < 0.6, rng.uniform(0.7, 0.99, n),
                  rng.uniform(0.05, 0.3, n)).astype(np.float32)
    state = state.replace(params=_dc.replace(
        state.params,
        opacity=state.params.opacity.at[:n, 0].set(np.asarray(_is(op)))))
    cams = []
    for i in range(4):
        ang = 0.1 * i
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"c{i}", R=R,
                           T=np.array([0.1 * i, 0.0, 0.0]), fovx=1.2,
                           fovy=0.9, width=width, height=height))
    cam_params = [c.params() for c in cams]
    gts = [jnp.asarray(rng.random((3, height, width)), jnp.float32)
           for _ in cams]

    if os.environ.get("BENCH_MODE", "train") == "render":
        _bench_render(state, cam_params, width, height, iters, backend,
                      budget)
        return

    opt = OptimizationParams()
    step = make_train_step(opt, sh_degree=3, white_background=False,
                           backend=backend, spatial_lr_scale=1.0,
                           donate=True, raster_budget=budget)

    params, adam, aux = state.params, init_adam(state.params), state.aux
    # warmup / compile
    it_dev = jnp.asarray(1, jnp.int32)
    params, adam, aux, m, it_dev = step(params, adam, aux, cam_params[0],
                                        gts[0], it_dev)
    jax.block_until_ready(params.xyz)

    t0 = time.perf_counter()
    for it in range(2, iters + 2):
        params, adam, aux, m, it_dev = step(params, adam, aux,
                                            cam_params[it % 4], gts[it % 4],
                                            it_dev)
    jax.block_until_ready(params.xyz)
    dt = time.perf_counter() - t0
    ips = iters / dt

    print(json.dumps({
        "metric": f"train_iters_per_sec_{n//1000}k_splats_{width}x{height}",
        "value": round(ips, 3),
        "unit": "iters/s",
        "vs_baseline": round(ips / NORTH_STAR_ITERS_PER_SEC, 4),
    }))


def _bench_render(state, cam_params, width, height, iters, backend, budget):
    """Forward-render FPS (novel-view serving), vs a 30 FPS baseline.
    Untruncated (zero-drop budget): every wanted (splat, tile) pair is
    composited, matching the CUDA reference workload."""
    import jax
    import jax.numpy as jnp
    from gaussmart_tpu.render.api import render

    import dataclasses as _dc

    def frame(cam, prev):
        # data dependency on the previous frame lives INSIDE the jit so no
        # eager ops round-trip the device per frame and no call is elided
        sc = state.params.scaling + prev[0, 0, 0] * 0.0
        st = state.replace(params=_dc.replace(state.params, scaling=sc))
        return render(cam, st, jnp.zeros(3), backend=backend,
                      raster_budget=budget)["render"]

    fn = jax.jit(frame)
    img = fn(cam_params[0], jnp.zeros((3, height, width)))
    jax.block_until_ready(img)
    t0 = time.perf_counter()
    for i in range(iters):
        img = fn(cam_params[i % 4], img)
    jax.block_until_ready(img)
    fps = iters / (time.perf_counter() - t0)
    n = state.capacity
    print(json.dumps({
        "metric": f"render_fps_{n//1000}k_splats_{width}x{height}",
        "value": round(fps, 2),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 4),
    }))


if __name__ == "__main__":
    main()
