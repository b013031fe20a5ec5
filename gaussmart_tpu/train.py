"""Training CLI — `python -m gaussmart_tpu.train -s <scene> -m <out> ...`.

Flag surface and schedule parity with reference train.py:347-429 /
train.py:45-242: 30k iterations, densify every 100 in [500, 15000),
opacity reset every 3000 (+ at densify_from_iter on white bg), SH degree
bump every 1000, test/save at {7000, 30000}, checkpointing, optional
segmentation preprocessing subprocess, CSV loss log.

TPU-first deltas: the iteration is one jitted XLA program (see train_lib);
cameras are pre-staged device-side; densify runs as a second jitted program
with fixed-capacity scatters (auto-growing capacity on overflow, a rare
recompile); checkpoints are .npz (no pickle).
"""
from __future__ import annotations

import csv
import functools
import json
import os
import subprocess
import sys
import time
from argparse import ArgumentParser
from random import Random
from typing import List, Optional

import jax
import jax.numpy as jnp

from gaussmart_tpu.config import (ModelParams, OptimizationParams,
                                  PipelineParams, add_group_args,
                                  extract_group, save_cfg)
from gaussmart_tpu.models.gaussians import grow_capacity
from gaussmart_tpu.optim import init_adam
from gaussmart_tpu.render.api import render
from gaussmart_tpu.scene import Scene
from gaussmart_tpu.train_lib import (make_densify_step, make_train_step,
                                     reset_opacity_jit)
from gaussmart_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from gaussmart_tpu.logging_utils import TensorBoardLogger, profile_trace


def training(dataset: ModelParams, opt: OptimizationParams,
             pipe: PipelineParams, testing_iterations: List[int],
             saving_iterations: List[int], checkpoint_iterations: List[int],
             start_checkpoint: Optional[str] = None,
             use_dino_loss: bool = True, lambda_dino: float = 0.05,
             dino_start_iter: int = 3000, dino_mode: str = "fixed",
             seed: int = 0, quiet: bool = False,
             capacity: Optional[int] = None,
             log_every: int = 10, profile_dir: Optional[str] = None,
             tensorboard: bool = True, gui=None, n_devices: int = 1,
             adam_on_densify: str = "drop", parallel_mode: str = "dp"):
    """`n_devices > 1` trains over a JAX device mesh (no reference
    counterpart, SURVEY.md §2.3 capability mapping):

    parallel_mode="dp": camera-data-parallel — each step consumes
    n_devices views, grads/densification stats psum'd over ICI
    (equivalent to grad accumulation over the batch).
    parallel_mode="mp": Gaussian-sharded (model-parallel) — one view per
    step (the reference schedule), splat params + Adam moments + stats
    sharded over the arena axis so each chip holds 1/D of the scene."""
    assert parallel_mode in ("dp", "mp"), parallel_mode
    os.makedirs(dataset.model_path, exist_ok=True)
    tb = TensorBoardLogger(dataset.model_path) if tensorboard else None
    scene = Scene(dataset, capacity=capacity, seed=seed)
    state = scene.gaussians
    adam = init_adam(state.params)
    first_iter = 0

    if start_checkpoint:
        state, adam, first_iter = load_checkpoint(start_checkpoint)
        print(f"Resumed from {start_checkpoint} at iteration {first_iter}")

    dino_fn = None
    if use_dino_loss:
        dino_fn = _build_dino_fn(lambda_dino, dino_start_iter, dino_mode)

    loss_log_path = os.path.join(dataset.model_path, "dino_loss_log.csv")
    log_fields = ["iteration", "dino_loss", "total_loss", "l1_loss",
                  "dist_loss", "normal_loss"]
    with open(loss_log_path, "w", newline="") as f:
        csv.DictWriter(f, fieldnames=log_fields).writeheader()
    stat_log_path = os.path.join(dataset.model_path, "train_stats.csv")
    stat_fields = ["iteration", "n_points", "n_dropped", "view", "dist_loss"]
    with open(stat_log_path, "w", newline="") as f:
        csv.DictWriter(f, fieldnames=stat_fields).writeheader()
    stat_rows: List[dict] = []

    mesh = None
    if n_devices > 1:
        from gaussmart_tpu.parallel.sharding import (make_dp_train_step,
                                                     make_mesh,
                                                     make_mp_train_step,
                                                     replicate, shard_state)
        mesh = make_mesh(n_devices)

        def place(params, adam, aux):
            if parallel_mode == "mp":
                return shard_state(params, adam, aux, mesh)
            p, a, x = replicate((params, adam, aux), mesh)
            return p, a, x

    step_cache = {}
    # Pallas duplicate budget: grown (recompile) when the kernel reports a
    # sustained duplicate-drop rate — late-training splats legitimately
    # cover many tiles and truncated renders corrupt both the loss and the
    # in-loop eval (the CUDA reference never truncates).
    raster_budget = [16, 3]
    initial_w_mult = raster_budget[0] // 4 + raster_budget[1]
    drop_strikes = [0]

    def get_step(st):
        # the SH degree schedule is traced inside the step; capacity and
        # duplicate-budget changes force a recompile
        key = (st.capacity, tuple(raster_budget))
        if key not in step_cache:
            if mesh is not None and parallel_mode == "mp":
                # per-stratum compositing backend mirrors the single-chip
                # "auto" policy (shared with eval/GUI): production Pallas
                # kernel on TPU (its seeded core is differentiable), dense
                # compositor elsewhere (interpret mode would crawl on CPU)
                mp_backend = _sharded_render_backend(pipe.backend)
                use_pal = mp_backend.endswith("_pallas")
                step_cache[key] = make_mp_train_step(
                    opt, mesh, sh_degree=st.max_sh_degree,
                    white_background=dataset.white_background,
                    depth_ratio=pipe.depth_ratio, dino_fn=dino_fn,
                    spatial_lr_scale=st.spatial_lr_scale,
                    adam_on_densify=adam_on_densify,
                    backend=mp_backend,
                    raster_budget=tuple(raster_budget) if use_pal else None)
            elif mesh is not None:
                step_cache[key] = make_dp_train_step(
                    opt, mesh, sh_degree=st.max_sh_degree,
                    white_background=dataset.white_background,
                    depth_ratio=pipe.depth_ratio, backend=pipe.backend,
                    dino_fn=dino_fn, spatial_lr_scale=st.spatial_lr_scale,
                    donate=True, adam_on_densify=adam_on_densify,
                    raster_budget=tuple(raster_budget))
            else:
                step_cache[key] = make_train_step(
                    opt, sh_degree=st.max_sh_degree,
                    white_background=dataset.white_background,
                    depth_ratio=pipe.depth_ratio, backend=pipe.backend,
                    dino_fn=dino_fn, spatial_lr_scale=st.spatial_lr_scale,
                    adam_on_densify=adam_on_densify,
                    raster_budget=tuple(raster_budget))
        return step_cache[key]

    def maybe_grow_budget(n_dropped: int, n_active: int, capacity: int):
        """Grow the work buffer by +1N (work_mult += 1) after 3 consecutive
        logged steps dropping >1% of active splats' duplicates; capped so
        capacity * W_mult stays <= 48M sort keys (and work_mult <= 24).

        +1N granularity (round 4; was ~1.3x): every downstream cost — key
        sort, pblob gather, and the [M, F] gradient scatter — scales with
        W = N*(max_dup//4 + work_mult), and interval binning keeps the
        zero-drop point close to true post-cull wants, so the finest step
        lands ON it instead of overshooting. Measured on the bench scene:
        zero-drop is W=8N; the old policy escalated (16,3)->(20,4)=9N and
        paid ~11% extra scatter/sort/gather for the rest of training."""
        w_mult = raster_budget[0] // 4 + raster_budget[1]
        # Cap growth so capacity * W stays <= 48M sort keys, but never
        # below the CONFIGURED initial budget (the floor used to hard-code
        # work_mult=3, which silently disabled escalation under a
        # non-default start and could admit W past the 48M bound when
        # 48M//capacity < start). The 48M bound is best-effort when the
        # initial budget already exceeds it.
        w_cap = max(initial_w_mult, 48_000_000 // max(capacity, 1))
        if w_mult >= w_cap or raster_budget[1] >= 24:
            return
        if n_dropped > max(512, n_active // 100):
            drop_strikes[0] += 1
        else:
            drop_strikes[0] = 0
        if drop_strikes[0] >= 3:
            raster_budget[1] += 1
            drop_strikes[0] = 0
            print(f"[raster] duplicate budget grown to max_dup="
                  f"{raster_budget[0]}, work_mult={raster_budget[1]} "
                  f"(W={raster_budget[0] // 4 + raster_budget[1]}N, "
                  f"dropped {n_dropped})", flush=True)

    densify_step = make_densify_step(opt, extent=scene.cameras_extent)

    train_cams = scene.get_train_cameras()
    cam_params = [c.params() for c in train_cams]
    gt_images = [jnp.asarray(c.image) for c in train_cams]

    rnd = Random(seed)
    viewpoint_stack: List[int] = []

    def pop_view():
        nonlocal viewpoint_stack
        if not viewpoint_stack:
            viewpoint_stack = list(range(len(train_cams)))
        return viewpoint_stack.pop(rnd.randint(0, len(viewpoint_stack) - 1))

    key = jax.random.PRNGKey(seed)
    params, aux = state.params, state.aux
    if mesh is not None:
        params, adam, aux = place(params, adam, aux)
    it_dev = jnp.asarray(first_iter + 1, jnp.int32)
    ema = {"loss": 0.0, "dist": 0.0, "normal": 0.0, "dino": 0.0}
    t_start = time.time()
    log_rows = []

    for iteration in range(first_iter + 1, opt.iterations + 1):
        if iteration % 1000 == 0 and state.active_sh_degree < state.max_sh_degree:
            state = state.oneup_sh_degree()

        step = get_step(state)
        if mesh is None or parallel_mode == "mp":
            idx = pop_view()
            params, adam, aux, metrics, it_dev = step(
                params, adam, aux, cam_params[idx], gt_images[idx], it_dev)
        else:
            from gaussmart_tpu.parallel.sharding import (BatchedCameras,
                                                         shard_batch)
            idxs = [pop_view() for _ in range(n_devices)]
            batched = BatchedCameras.stack([cam_params[i] for i in idxs])
            gts = jnp.stack([gt_images[i] for i in idxs])
            batched, gts = shard_batch((batched, gts), mesh)
            params, adam, aux, metrics, it_dev = step(
                params, adam, aux, batched, gts, it_dev)

        # ---- host-side schedule (cheap; all heavy work stays on device) ---
        if iteration % log_every == 0 or iteration == opt.iterations:
            m = jax.device_get(metrics)
            ema["loss"] = 0.4 * float(m.total) + 0.6 * ema["loss"]
            ema["dist"] = 0.4 * float(m.dist) + 0.6 * ema["dist"]
            ema["normal"] = 0.4 * float(m.normal) + 0.6 * ema["normal"]
            ema["dino"] = 0.4 * float(m.dino) + 0.6 * ema["dino"]
            if not quiet:
                ips = iteration / max(time.time() - t_start, 1e-9)
                print(f"[{iteration}/{opt.iterations}] loss {ema['loss']:.5f} "
                      f"dist {ema['dist']:.5f} normal {ema['normal']:.5f} "
                      f"dino {ema['dino']:.5f} pts {int(m.n_active)} "
                      f"({ips:.1f} it/s)", flush=True)
            log_rows.append({
                "iteration": iteration, "dino_loss": float(m.dino),
                "total_loss": float(m.total), "l1_loss": float(m.l1),
                "dist_loss": float(m.dist), "normal_loss": float(m.normal)})
            # framework diagnostics in a separate file: the reference's
            # dino_loss_log.csv schema (train.py:63-67) stays exact
            # per-view dist attribution (DTU-mesh recipe diagnostics —
            # lambda_dist=1000 view spikes, ROUND4.md task 4)
            stat_rows.append({
                "iteration": iteration, "n_points": int(m.n_active),
                "n_dropped": int(m.n_dropped),
                # in DP mode m.dist is the pmean across the n_devices views
                # of this step — attributing it to one view would mislead
                # the spike analyzer, so log view=-1 (analyzer skips it)
                "view": idx if (mesh is None or parallel_mode == "mp")
                        else -1,
                "dist_loss": float(m.dist)})
            maybe_grow_budget(int(m.n_dropped), int(m.n_active),
                              state.capacity)
            if tb is not None:
                tb.scalar("train_loss_patches/total_loss", float(m.total), iteration)
                tb.scalar("train_loss_patches/reg_loss", float(m.l1), iteration)
                tb.scalar("train_loss_patches/dist_loss", ema["dist"], iteration)
                tb.scalar("train_loss_patches/normal_loss", ema["normal"], iteration)
                tb.scalar("train_loss_patches/dino_loss", ema["dino"], iteration)
                tb.scalar("total_points", int(m.n_active), iteration)
                tb.scalar("raster/dropped_duplicates", int(m.n_dropped),
                          iteration)
                tb.scalar("iter_time",
                          (time.time() - t_start) / iteration, iteration)
            if len(log_rows) >= 50:
                _flush_log(loss_log_path, log_fields, log_rows)
                _flush_log(stat_log_path, stat_fields, stat_rows)

        if iteration in testing_iterations:
            state = state.replace(params=params, aux=aux)
            report_eval(scene, state, pipe, dataset, iteration, tb=tb,
                        mesh=mesh if parallel_mode == "mp" else None,
                        train_budget=tuple(raster_budget))
            params, aux = state.params, state.aux

        if iteration in saving_iterations:
            print(f"\n[ITER {iteration}] Saving Gaussians")
            scene.save(iteration, state.replace(params=params, aux=aux))

        # densification (train.py:198-211 schedule)
        if iteration < opt.densify_until_iter:
            if (iteration > opt.densify_from_iter
                    and iteration % opt.densification_interval == 0):
                state = state.replace(params=params, aux=aux)
                key, sub = jax.random.split(key)
                use_size = iteration > opt.opacity_reset_interval
                state, adam, dropped = densify_step(state, adam, sub, use_size)
                n_drop = int(jax.device_get(dropped))
                grew = n_drop > 0
                if grew:
                    state, adam = _grow(state, adam, n_drop)
                    step_cache.clear()
                if mesh is not None and (grew or parallel_mode == "mp"):
                    # mp: densify's scatters leave XLA-chosen placements;
                    # re-pin the arena sharding before the next step
                    sp, adam, sa = place(state.params, adam, state.aux)
                    state = state.replace(params=sp, aux=sa)
                params, aux = state.params, state.aux
            if (iteration % opt.opacity_reset_interval == 0
                    or (dataset.white_background
                        and iteration == opt.densify_from_iter)):
                state = state.replace(params=params, aux=aux)
                state, adam = reset_opacity_jit(state, adam)
                params, aux = state.params, state.aux

        # live viewer polling (train.py:223-242)
        if gui is not None:
            _serve_gui(gui, state.replace(params=params, aux=aux), pipe,
                       dataset, ema, iteration, opt.iterations,
                       mesh=mesh if parallel_mode == "mp" else None,
                       raster_budget=tuple(raster_budget))

        if iteration in checkpoint_iterations:
            print(f"\n[ITER {iteration}] Saving Checkpoint")
            state = state.replace(params=params, aux=aux)
            save_checkpoint(os.path.join(dataset.model_path,
                                         f"chkpnt{iteration}.npz"),
                            state, adam, iteration)

    _flush_log(loss_log_path, log_fields, log_rows)
    _flush_log(stat_log_path, stat_fields, stat_rows)
    if tb is not None:
        tb.close()
    return state.replace(params=params, aux=aux), adam


_GUI_RENDER_CACHE = {}


def _gui_render_fn(depth_ratio: float, backend: str, mesh=None,
                   raster_budget=None):
    """Jitted viewer render, cached per pipeline config. Eager dispatch of
    render_arrays costs ~1.4 s/frame over the remote TPU tunnel (measured);
    one compiled program per (resolution, capacity) serves frames at
    device-render speed. jit's own cache handles shape changes. `mesh` set
    = mp mode (arena-sharded state -> gaussian-sharded composite).
    `raster_budget` follows the training loop's adaptive budget so the live
    preview shows what training sees (recompiles only when it escalates)."""
    key = (depth_ratio, backend, mesh, raster_budget)
    fn = _GUI_RENDER_CACHE.get(key)
    if fn is None:
        if mesh is not None:
            backend = _sharded_render_backend(backend)
        fn = jax.jit(lambda c, s, b, m: render(
            c, s, b, scaling_modifier=m, depth_ratio=depth_ratio,
            backend=backend, mesh=mesh, raster_budget=raster_budget))
        _GUI_RENDER_CACHE[key] = fn
    return fn


def _serve_gui(gui, state, pipe, dataset, ema, iteration, max_iters,
               mesh=None, raster_budget=None):
    """One GUI poll/serve round (reference train.py:223-242 semantics)."""
    import jax.numpy as jnp
    from gaussmart_tpu.viewer.protocol import image_to_bytes, render_net_image

    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background
                     else [0.0, 0.0, 0.0])
    if gui.conn is None:
        gui.try_connect(dataset.render_items)
    while gui.conn is not None:
        try:
            net_image_bytes = None
            cam, do_training, keep_alive, smod, mode = gui.receive()
            if cam is not None:
                pkg = _gui_render_fn(pipe.depth_ratio, pipe.backend, mesh,
                                     raster_budget)(
                    cam.params(), state, bg, jnp.float32(smod))
                net_image = render_net_image(pkg, dataset.render_items, mode,
                                             cam)
                net_image_bytes = image_to_bytes(net_image)
            gui.send(net_image_bytes, dataset.source_path,
                     {"#": int(state.n_active), "loss": ema["loss"]})
            if do_training and (iteration < max_iters or not keep_alive):
                break
        except Exception:
            gui.close()


def _flush_log(path, fields, rows):
    if rows:
        with open(path, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=fields)
            for r in rows:
                w.writerow(r)
        rows.clear()


def _grow(state, adam, dropped: int = 0):
    """Grow the arena when densify overflowed (recompile boundary).

    1.25x buckets, not doubling: binning/sort cost scales with arena
    CAPACITY, not active count (BASELINE.md), so a tight arena keeps the
    post-growth step markedly faster than a 2x jump at DTU scale (a 152k
    run in a 164k arena vs a 262k one). Each distinct capacity costs one
    XLA compile, amortized by the persistent compilation cache. The
    `dropped` floor covers this pass's rejected candidates so one growth
    always suffices."""
    cap = state.capacity
    gran = max(cap // 8, 16)
    need = int(state.n_active) + int(dropped) + gran
    new_cap = max(int(cap * 1.25), cap + gran, need)
    new_cap = -(-new_cap // gran) * gran
    print(f"[capacity] growing {cap} -> {new_cap}")
    grown = grow_capacity(state, new_cap)
    pad = new_cap - adam.mu.xyz.shape[0]

    def pad_leaf(a):
        return jnp.concatenate(
            [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)], axis=0)

    adam = adam.__class__(mu=jax.tree.map(pad_leaf, adam.mu),
                          nu=jax.tree.map(pad_leaf, adam.nu), step=adam.step)
    return grown, adam


def _build_dino_fn(lambda_dino: float, start_iter: int, mode: str):
    """Differentiable DINO embedding loss, gated after start_iter.

    Falls back to None (term = 0) when no encoder weights are available
    locally — the environment has no network egress."""
    try:
        from gaussmart_tpu.semantics.dino import DinoEncoder
        enc = DinoEncoder.create()
    except Exception as e:  # no weights / transformers model unavailable
        print(f"[dino] encoder unavailable ({e}); DINO loss disabled")
        return None
    from gaussmart_tpu.losses import dino_term

    def fn(image, gt, iteration):
        term = dino_term(image, gt, enc, lambda_dino, mode=mode)
        return jnp.where(iteration > start_iter, term, 0.0)

    return fn


def _sharded_render_backend(backend: str) -> str:
    """Render backend for ARENA-SHARDED state (mp mode): the single-device
    paths (plain Pallas/dense) cannot partition over a sharded splat arena
    — pallas_call has no GSPMD rule — so route through the gaussian-sharded
    composite, production kernel on TPU (mirrors the mp train-step
    selection)."""
    use_pal = (backend == "pallas"
               or (backend == "auto" and jax.default_backend() == "tpu"))
    return "gaussian_sharded_pallas" if use_pal else "gaussian_sharded"


@functools.lru_cache(maxsize=None)
def _make_eval_view(depth_ratio: float, backend: str, white_bg: bool,
                    mesh=None, raster_budget=(64, 12)):
    """Jitted per-view eval, cached at module scope so repeated report_eval
    calls reuse ONE compiled program per (config, state-capacity) — the
    closure-over-state version recompiled on every test iteration (minutes
    on remote TPU backends). `mesh` set = mp mode: state stays
    arena-sharded through eval (memory-scaling contract)."""
    from gaussmart_tpu.ops.image import psnr as psnr_fn, l1_loss
    from gaussmart_tpu.ops.ssim import ssim as ssim_fn

    bg = jnp.asarray([1.0, 1.0, 1.0] if white_bg else [0.0, 0.0, 0.0])
    if mesh is not None:
        backend = _sharded_render_backend(backend)

    # jit the whole per-view eval: eager dispatch per op is prohibitively
    # slow through remote-TPU backends
    @jax.jit
    def _eval_view(state, cam_params, gt_image):
        # generous duplicate budget: eval must measure the model, not the
        # training-time truncation (the CUDA reference never truncates).
        # Never BELOW the training budget — scenes whose adaptive budget
        # escalated past the default would otherwise eval with tighter
        # truncation than they trained with.
        pkg = render(cam_params, state, bg, depth_ratio=depth_ratio,
                     backend=backend, raster_budget=raster_budget, mesh=mesh)
        img = jnp.clip(pkg["render"], 0, 1)
        gt = jnp.clip(gt_image, 0, 1)
        return (img, l1_loss(img, gt), psnr_fn(img[None], gt[None])[0, 0],
                ssim_fn(img, gt), pkg["surf_depth"], pkg["rend_normal"],
                pkg["rend_alpha"])

    return _eval_view


def eval_budget(train_budget):
    """Duplicate budget for in-loop eval: the generous default (64, 12),
    floored elementwise at the training loop's current adaptive
    (max_dup, work_mult) — a scene whose budget escalated past the default
    must never eval with tighter truncation than it trained with."""
    budget = (64, 12)
    if train_budget is not None:
        budget = (max(budget[0], train_budget[0]),
                  max(budget[1], train_budget[1]))
    return budget


def report_eval(scene: Scene, state, pipe, dataset, iteration, tb=None,
                mesh=None, train_budget=None):
    """In-loop test/train eval (train.py:268-344); LPIPS(alex) included when
    local weights exist (train.py:70). Pass `mesh` when state is
    arena-sharded (mp mode); `train_budget` = the loop's current adaptive
    (max_dup, work_mult) so eval never truncates harder than training."""
    from gaussmart_tpu.eval import lpips_jax

    lpips = lpips_jax.load_lpips("alex")

    configs = [("test", scene.get_test_cameras())]
    train_cams = scene.get_train_cameras()
    if train_cams:
        configs.append(("train", [train_cams[i % len(train_cams)]
                                  for i in range(5, 30, 5)]))

    budget = eval_budget(train_budget)
    _eval_view = _make_eval_view(pipe.depth_ratio, pipe.backend,
                                 dataset.white_background, mesh, budget)

    results = {}
    for name, cams in configs:
        if not cams:
            continue
        tot = {"l1": 0.0, "psnr": 0.0, "ssim": 0.0}
        if lpips is not None:
            tot["lpips"] = 0.0
        for vi, cam in enumerate(cams):
            gt = jnp.clip(jnp.asarray(cam.image), 0, 1)
            img, l1v, psnrv, ssimv, surf_depth, rend_normal, rend_alpha = \
                _eval_view(state, cam.params(), jnp.asarray(cam.image))
            if tb is not None and vi < 5:
                import numpy as _np
                tb.image(f"{name}_view_{cam.image_name}/render",
                         _np.asarray(img), iteration)
                d = surf_depth / jnp.maximum(surf_depth.max(), 1e-9)
                tb.image(f"{name}_view_{cam.image_name}/depth",
                         _np.asarray(jnp.concatenate([d] * 3, 0)), iteration)
                tb.image(f"{name}_view_{cam.image_name}/rend_normal",
                         _np.asarray(rend_normal * 0.5 + 0.5), iteration)
                tb.image(f"{name}_view_{cam.image_name}/rend_alpha",
                         _np.asarray(jnp.concatenate([rend_alpha] * 3, 0)),
                         iteration)
            tot["l1"] += float(l1v)
            tot["psnr"] += float(psnrv)
            tot["ssim"] += float(ssimv)
            if lpips is not None:
                tot["lpips"] += float(lpips(img, gt)[0])
        n = len(cams)
        results[name] = {k: v / n for k, v in tot.items()}
        if tb is not None:
            for k, v in results[name].items():
                tb.scalar(f"{name}/loss_viewpoint - {k}", v, iteration)
        print(f"\n[ITER {iteration}] Evaluating {name}: "
              f"L1 {results[name]['l1']:.5f} PSNR {results[name]['psnr']:.3f} "
              f"SSIM {results[name]['ssim']:.4f}")
    out = os.path.join(dataset.model_path, f"eval_{iteration}.json")
    with open(out, "w") as f:
        json.dump(results, f, indent=2)
    return results


def build_parser() -> ArgumentParser:
    parser = ArgumentParser(description="gaussmart_tpu training")
    add_group_args(parser, ModelParams)
    add_group_args(parser, OptimizationParams)
    add_group_args(parser, PipelineParams)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--detect_anomaly", action="store_true")
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[7000, 30000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--run_segmentation", action="store_true")
    parser.add_argument("--segmentation_output", type=str,
                        default="segmentation_results")
    parser.add_argument("--dataset_type", type=str,
                        choices=["dtu", "nerf", "tyt"], default="tyt")
    parser.add_argument("--skip_camera_clustering", action="store_true")
    parser.add_argument("--sam2", action="store_true")
    parser.add_argument("--clean", action="store_true")
    parser.add_argument("--dino_start_iter", type=int, default=3000)
    parser.add_argument("--lambda_dino", type=float, default=0.05)
    parser.add_argument("--dino_mode", type=str, default="fixed",
                        choices=["fixed", "parity", "off"])
    parser.add_argument("--capacity", type=int, default=None)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--profile_dir", type=str, default=None,
                        help="capture a jax.profiler trace to this dir")
    parser.add_argument("--no_tensorboard", action="store_true")
    parser.add_argument("--gui", action="store_true",
                        help="serve the live viewer during training")
    parser.add_argument("--n_devices", type=int, default=1,
                        help="multi-device training over this many devices "
                             "of the JAX mesh (see --parallel_mode)")
    parser.add_argument("--parallel_mode", type=str, default="dp",
                        choices=["dp", "mp"],
                        help="dp: camera-data-parallel (state replicated, "
                             "grads psum'd on ICI); mp: Gaussian-sharded "
                             "model-parallel (params+Adam split over the "
                             "arena axis, 1/N of scene state per chip)")
    parser.add_argument("--adam_on_densify", type=str, default="drop",
                        choices=["apply", "drop"],
                        help="'drop' (default) reproduces the reference "
                             "behavior of skipping the Adam update on "
                             "densify iterations; measured more stable "
                             "than 'apply' in the sparse-view regime "
                             "(A/B in BASELINE.md, COMPONENTS.md #3)")
    return parser


def main(argv=None):
    from gaussmart_tpu.runtime import setup as _runtime_setup
    _runtime_setup()
    parser = build_parser()
    args = parser.parse_args(argv)
    args.save_iterations.append(args.iterations)

    print("Optimizing " + args.model_path)

    if args.run_segmentation:
        print("\nRunning segmentation process...")
        seg_output = os.path.join("identification", "results")
        os.makedirs(seg_output, exist_ok=True)
        cmd = [sys.executable, "-m", "gaussmart_tpu.semantics.pipeline",
               "-s", args.source_path, "-o", seg_output,
               "-t", args.dataset_type]
        if args.skip_camera_clustering:
            cmd.append("--skip_camera_clustering")
        if args.sam2:
            cmd.append("--sam2")
        if args.clean:
            cmd.append("--clean")
        try:
            subprocess.run(cmd, check=True)
            print("Segmentation completed successfully!")
        except subprocess.CalledProcessError as e:
            print(f"Segmentation failed with error: {e}")
            sys.exit(1)

    if args.detect_anomaly:
        jax.config.update("jax_debug_nans", True)

    dataset = extract_group(args, ModelParams)
    opt = extract_group(args, OptimizationParams)
    pipe = extract_group(args, PipelineParams)
    os.makedirs(dataset.model_path, exist_ok=True)
    save_cfg(dataset.model_path, args)

    gui = None
    if args.gui:
        from gaussmart_tpu.viewer.protocol import NetworkGUI
        gui = NetworkGUI()
        gui.init(args.ip, args.port)

    with profile_trace(args.profile_dir):
        training(dataset, opt, pipe, args.test_iterations,
                 args.save_iterations, args.checkpoint_iterations,
                 args.start_checkpoint,
                 use_dino_loss=(args.dino_mode != "off"),
                 lambda_dino=args.lambda_dino,
                 dino_start_iter=args.dino_start_iter,
                 dino_mode=args.dino_mode, seed=args.seed, quiet=args.quiet,
                 capacity=args.capacity,
                 tensorboard=not args.no_tensorboard, gui=gui,
                 n_devices=args.n_devices,
                 parallel_mode=args.parallel_mode,
                 adam_on_densify=args.adam_on_densify)
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
