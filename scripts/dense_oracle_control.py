"""Dense-oracle control for the late-training PSNR decline (VERDICT r3
task 5 / r4 missing #2), redesigned for feasibility.

The original design — a full 30k dense-backend training arm — costs ~29 h
on one chip (measured: 0.283 it/s at 60k splats even at r=4), so the
control instead answers the underlying question directly: *do the Pallas
kernel's gradients/outputs drift from the dense oracle's at the actual
training states where the decline happens?* For every saved snapshot of a
(pallas-trained) run it compares, at full scale, per-parameter-leaf
training gradients and test-view renders between the two backends:

  * grad control: value_and_grad of the SAME loss (train_lib._loss_and_aux)
    with backend=pallas vs backend=dense on the same states/views —
    per-leaf cosine similarity + relative L2 error;
  * forward control: test-view PSNR under both backends + cross-backend
    render PSNR.

If both stay tight across 1k..30k while test PSNR declines, the decline is
an optimization/overfitting property (sparse-view ring), not a kernel bug.
Reference behavior under control: train.py:268-344 (training_report eval).

Usage:
  python scripts/dense_oracle_control.py -m /tmp/ctl_pallas -s /tmp/scene_r5 \
      -r 4 [--grad_views 3] [--out /tmp/ctl_pallas/oracle_control.json]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-m", "--model_path", required=True)
    ap.add_argument("-s", "--source_path", required=True)
    ap.add_argument("-r", "--resolution", type=int, default=4)
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--grad_views", type=int, default=3)
    ap.add_argument("--test_views", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from gaussmart_tpu.runtime import setup
    setup()
    import jax
    import jax.numpy as jnp

    from gaussmart_tpu.config import ModelParams, OptimizationParams
    from gaussmart_tpu.scene import Scene
    from gaussmart_tpu.train_lib import _loss_and_aux
    from gaussmart_tpu.render.api import render
    from gaussmart_tpu.ops.image import psnr

    mp = ModelParams(source_path=args.source_path,
                     model_path=args.model_path,
                     resolution=args.resolution, sh_degree=args.sh_degree,
                     eval=True)
    snaps = sorted(
        (int(p.rsplit("_", 1)[1]) for p in glob.glob(os.path.join(
            args.model_path, "point_cloud", "iteration_*"))))
    if not snaps:
        raise SystemExit("no snapshots found")
    print(f"snapshots: {snaps}")

    opt = OptimizationParams()
    results = []
    for it in snaps:
        scene = Scene(mp, load_iteration=it, shuffle=False)
        state = scene.gaussians
        train_cams = scene.get_train_cameras()
        test_cams = scene.get_test_cameras()
        bg = jnp.zeros(3, jnp.float32)
        n_act = int(np.asarray(state.aux.active).sum())

        # ---- gradient control on a few train views --------------------
        def make_grad(backend):
            budget = (64, 12) if backend == "pallas" else None

            @jax.jit
            def g(params, cam, gt):
                means2d = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)
                gfn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1),
                                         has_aux=True)
                (total, _), (gp, gm) = gfn(
                    params, means2d, state.aux, cam, gt,
                    jnp.asarray(it, jnp.int32), opt, bg,
                    args.sh_degree, 0.0, backend, None, budget)
                return total, gp
            return g

        gp_fn, gd_fn = make_grad("pallas"), make_grad("dense")
        leaf_cos, leaf_rel = {}, {}
        for cam in train_cams[:args.grad_views]:
            gt = jnp.asarray(cam.image, jnp.float32)
            cp = cam.params()
            _, gp = gp_fn(state.params, cp, gt)
            _, gd = gd_fn(state.params, cp, gt)
            for name in gp.__dataclass_fields__:
                a = np.asarray(getattr(gp, name), np.float64).ravel()
                b = np.asarray(getattr(gd, name), np.float64).ravel()
                na, nb = np.linalg.norm(a), np.linalg.norm(b)
                cos = float(a @ b / max(na * nb, 1e-30))
                rel = float(np.linalg.norm(a - b) / max(nb, 1e-30))
                leaf_cos.setdefault(name, []).append(cos)
                leaf_rel.setdefault(name, []).append(rel)

        # ---- forward control on test views ----------------------------
        pal_ps, den_ps, cross_ps = [], [], []
        for cam in test_cams[:args.test_views]:
            gt = jnp.asarray(cam.image, jnp.float32)
            rp = jnp.clip(render(cam.params(), state, bg, backend="pallas",
                                 raster_budget=(64, 12))["render"], 0, 1)
            rd = jnp.clip(render(cam.params(), state, bg,
                                 backend="dense")["render"], 0, 1)
            # ops.image.psnr is per-image over [N, ...]: add the batch dim
            pal_ps.append(float(psnr(rp[None], gt[None])[0, 0]))
            den_ps.append(float(psnr(rd[None], gt[None])[0, 0]))
            cross_ps.append(float(psnr(rp[None], rd[None])[0, 0]))

        row = {
            "iteration": it, "n_active": n_act,
            "grad_cos_min": {k: min(v) for k, v in leaf_cos.items()},
            "grad_rel_max": {k: max(v) for k, v in leaf_rel.items()},
            "test_psnr_pallas": float(np.mean(pal_ps)),
            "test_psnr_dense": float(np.mean(den_ps)),
            "cross_backend_psnr": float(np.mean(cross_ps)),
        }
        results.append(row)
        wc = min(min(v) for v in leaf_cos.values())
        print(f"[{it:>6}] pts={n_act:>7} worst grad cos={wc:.6f} "
              f"test PSNR p/d={row['test_psnr_pallas']:.2f}/"
              f"{row['test_psnr_dense']:.2f} cross={row['cross_backend_psnr']:.1f}")

    out = args.out or os.path.join(args.model_path, "oracle_control.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=1)
    print(f"saved {out}")


if __name__ == "__main__":
    main()
