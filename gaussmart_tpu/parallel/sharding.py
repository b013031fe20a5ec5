"""Multi-chip scale-out over a JAX device mesh.

The reference is strictly single-GPU/single-process (SURVEY.md §2.3); its
only "multi-GPU" use is embarrassingly-parallel job dispatch. This module is
the designed-from-scratch TPU equivalent:

 * **Camera data-parallel training** (`make_dp_train_step`): a batch of B
   cameras is sharded over the `data` mesh axis; Gaussian state is
   replicated; each device renders + differentiates its own views; gradients
   and densification statistics are `psum`'d over ICI before a replicated
   Adam step. Mathematically this is grad-accumulation over B views per
   iteration (batch size 1 recovers the reference schedule exactly).
 * **Pixel/row-sharded rendering** (`render_row_sharded`): for single large
   frames, shard image rows across devices — every device composites the
   full (replicated) splat set for its rows; exact, no cross-device
   compositing needed because 2DGS compositing is per-pixel.

 * **Gaussian-sharded rendering** (`render_gaussian_sharded`): splats
   depth-stratified across the mesh, each device composites only its
   stratum, partial framebuffers folded by the associativity of the `over`
   operator — the memory-scaling axis for multi-million-splat scenes
   (parallel/DESIGN.md §3).
 * **Gaussian-sharded training** (`make_mp_train_step`): the full training
   step with params, Adam moments, AD residuals and densification stats
   sharded over the arena axis — per-chip HBM holds 1/D of the scene;
   collectives move only prep rows + framebuffer maps.
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gaussmart_tpu.cameras import CameraParams
from gaussmart_tpu.config import OptimizationParams
from gaussmart_tpu.render.raster_common import T_EPS
from gaussmart_tpu.models.densify import add_densification_stats
from gaussmart_tpu.optim import adam_step, group_lrs
from gaussmart_tpu.train_lib import StepMetrics, _loss_and_aux


def make_mesh(n_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np
    return Mesh(np.array(devs), (axis,))


def replicate(tree, mesh: Mesh):
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def shard_batch(tree, mesh: Mesh, axis: str = "data"):
    sharding = NamedSharding(mesh, P(axis))
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class BatchedCameras:
    """A stack of B same-resolution cameras (leading device axis)."""
    world_view: jnp.ndarray      # [B,4,4]
    full_proj: jnp.ndarray       # [B,4,4]
    camera_center: jnp.ndarray   # [B,3]
    tanfovx: jnp.ndarray         # [B]
    tanfovy: jnp.ndarray         # [B]
    width: int = dataclasses.field(metadata=dict(static=True))
    height: int = dataclasses.field(metadata=dict(static=True))

    @staticmethod
    def stack(cams):
        import numpy as np
        return BatchedCameras(
            world_view=jnp.asarray(np.stack([c.world_view for c in cams])),
            full_proj=jnp.asarray(np.stack([c.full_proj for c in cams])),
            camera_center=jnp.asarray(np.stack([c.camera_center for c in cams])),
            tanfovx=jnp.asarray(np.stack([np.asarray(c.tanfovx) for c in cams])),
            tanfovy=jnp.asarray(np.stack([np.asarray(c.tanfovy) for c in cams])),
            width=cams[0].width, height=cams[0].height)

    def index(self, i) -> CameraParams:
        return CameraParams(
            world_view=self.world_view[i], full_proj=self.full_proj[i],
            camera_center=self.camera_center[i], tanfovx=self.tanfovx[i],
            tanfovy=self.tanfovy[i], width=self.width, height=self.height)


def make_dp_train_step(opt: OptimizationParams, mesh: Mesh, *,
                       sh_degree: int, white_background: bool,
                       depth_ratio: float = 0.0, backend: str = "dense",
                       spatial_lr_scale: float = 1.0, axis: str = "data",
                       dino_fn=None, donate: bool = False,
                       adam_on_densify: str = "drop",
                       raster_budget=None):
    """Camera-DP training step over `mesh`. Batch size B must equal the mesh
    size (one camera per device per step); stats/grads ride ICI psum.
    backend="pallas" runs the production kernel inside shard_map (interpret
    mode off-TPU); "auto" picks per platform like the single-chip step.
    adam_on_densify and raster_budget match make_train_step's semantics."""
    assert adam_on_densify in ("apply", "drop"), adam_on_densify
    bg = jnp.asarray([1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0],
                     jnp.float32)
    n_dev = mesh.devices.size

    def per_device(params, adam, aux_state, cams: BatchedCameras,
                   gt_images, iteration):
        # inside shard_map: leading camera axis is the local shard (size 1)
        cam = cams.index(0)
        gt = gt_images[0]
        means2d = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)
        grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1), has_aux=True)
        (total, extras), (gparams, gmeans2d) = grad_fn(
            params, means2d, aux_state, cam, gt, iteration, opt, bg,
            sh_degree, depth_ratio, backend, dino_fn, raster_budget)

        # gradient all-reduce over ICI (mean, matching grad accumulation)
        gparams = jax.tree.map(lambda g: jax.lax.psum(g, axis) / n_dev, gparams)

        # densification stats accumulate over *all* cameras in the batch
        stats0 = jax.tree.map(jnp.zeros_like, aux_state)
        stats = add_densification_stats(stats0, gmeans2d, extras["radii"])
        in_window = iteration < opt.densify_until_iter
        aux_state = dataclasses.replace(
            aux_state,
            grad_accum=aux_state.grad_accum + jnp.where(
                in_window, jax.lax.psum(stats.grad_accum, axis), 0.0),
            denom=aux_state.denom + jnp.where(
                in_window, jax.lax.psum(stats.denom, axis), 0.0),
            max_radii2d=jnp.where(
                in_window,
                jnp.maximum(aux_state.max_radii2d,
                            jax.lax.pmax(stats.max_radii2d, axis)),
                aux_state.max_radii2d))

        lrs = group_lrs(opt, iteration, spatial_lr_scale)
        new_params, new_adam = adam_step(params, gparams, adam, lrs,
                                         aux_state.active)
        if adam_on_densify == "drop":
            is_densify = (in_window
                          & (iteration > opt.densify_from_iter)
                          & (iteration % opt.densification_interval == 0))
            keep = lambda new, old: jnp.where(is_densify, old, new)
            params = jax.tree.map(keep, new_params, params)
            adam = jax.tree.map(keep, new_adam, adam)
        else:
            params, adam = new_params, new_adam

        metrics = StepMetrics(
            total=jax.lax.pmean(total, axis),
            l1=jax.lax.pmean(extras["l1"], axis),
            dist=jax.lax.pmean(extras["dist"], axis),
            normal=jax.lax.pmean(extras["normal"], axis),
            dino=jax.lax.pmean(extras["dino"], axis),
            psnr=jax.lax.pmean(extras["psnr"], axis),
            n_active=aux_state.active.sum(),
            n_dropped=jax.lax.psum(extras["n_dropped"], axis))
        return params, adam, aux_state, metrics

    rep = P()
    sharded = P(axis)
    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(rep, rep, rep, sharded, sharded, rep),
        out_specs=(rep, rep, rep, rep),
        check_vma=False)

    def step(params, adam, aux_state, cams, gt_images, iteration):
        params, adam, aux_state, metrics = fn(params, adam, aux_state, cams,
                                              gt_images, iteration)
        # device-side counter, mirroring make_train_step's contract
        return params, adam, aux_state, metrics, iteration + 1

    donate_argnums = (0, 1, 2) if donate else ()
    return jax.jit(step, donate_argnums=donate_argnums)


def make_mp_train_step(opt: OptimizationParams, mesh: Mesh, *,
                       sh_degree: int, white_background: bool,
                       depth_ratio: float = 0.0,
                       spatial_lr_scale: float = 1.0, axis: str = "data",
                       dino_fn=None, adam_on_densify: str = "drop",
                       backend: str = "gaussian_sharded",
                       raster_budget=None):
    """Gaussian-sharded (model-parallel) training step — the memory-scaling
    axis for scenes whose splat state outgrows one chip's HBM.

    One camera per iteration (the reference schedule, train.py:100-102);
    splat params, Adam moments, reverse-AD residuals and densification
    statistics all carry a leading-arena-axis sharding over `mesh`, so each
    chip holds 1/D of the scene state. The per-frame composite is
    `render_gaussian_sharded`'s two-pass associative fold; its collectives
    move only the ~21-float/splat preprocess rows plus [H,W] framebuffer
    maps — never the 59-float params or the 118-float Adam state. Loss,
    densify-stat and adam_on_densify semantics are identical to the
    single-chip step (train_lib.make_train_step).

    Arena capacity must be a multiple of the mesh size (every capacity the
    CLI produces is a multiple of 256).

    backend: "gaussian_sharded" composites each stratum with the dense XLA
    compositor; "gaussian_sharded_pallas" rides the production tiled
    kernel's differentiable seeded core — the TPU training default.
    """
    assert adam_on_densify in ("apply", "drop"), adam_on_densify
    assert backend in ("gaussian_sharded", "gaussian_sharded_pallas"), backend
    bg = jnp.asarray([1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0],
                     jnp.float32)
    from gaussmart_tpu.optim import AdamState
    from gaussmart_tpu.train_lib import StepMetrics as _SM

    shard = NamedSharding(mesh, P(axis))     # leading arena axis
    rep = NamedSharding(mesh, P())
    adam_sh = AdamState(mu=shard, nu=shard, step=rep)

    def step(params, adam, aux_state, cam, gt_image, iteration):
        # re-pin the arena sharding on entry (instead of jit in_shardings,
        # which rejects args the densify/reset programs re-placed)
        params = jax.lax.with_sharding_constraint(params, shard)
        aux_state = jax.lax.with_sharding_constraint(aux_state, shard)
        adam = AdamState(
            mu=jax.lax.with_sharding_constraint(adam.mu, shard),
            nu=jax.lax.with_sharding_constraint(adam.nu, shard),
            step=adam.step)
        means2d = jnp.zeros((params.xyz.shape[0], 2), jnp.float32)
        grad_fn = jax.value_and_grad(_loss_and_aux, argnums=(0, 1),
                                     has_aux=True)
        (total, extras), (gparams, gmeans2d) = grad_fn(
            params, means2d, aux_state, cam, gt_image, iteration, opt, bg,
            sh_degree, depth_ratio, backend, dino_fn, raster_budget, mesh)

        in_window = iteration < opt.densify_until_iter
        new_stats = add_densification_stats(aux_state, gmeans2d,
                                            extras["radii"])
        aux_state = jax.tree.map(
            lambda new, old: jnp.where(in_window, new, old), new_stats,
            aux_state)

        lrs = group_lrs(opt, iteration, spatial_lr_scale)
        new_params, new_adam = adam_step(params, gparams, adam, lrs,
                                         aux_state.active)
        if adam_on_densify == "drop":
            is_densify = (in_window
                          & (iteration > opt.densify_from_iter)
                          & (iteration % opt.densification_interval == 0))
            keep = lambda new, old: jnp.where(is_densify, old, new)
            params = jax.tree.map(keep, new_params, params)
            adam = jax.tree.map(keep, new_adam, adam)
        else:
            params, adam = new_params, new_adam

        metrics = _SM(
            total=total, l1=extras["l1"], dist=extras["dist"],
            normal=extras["normal"], dino=extras["dino"],
            psnr=extras["psnr"], n_active=aux_state.active.sum(),
            n_dropped=extras["n_dropped"])
        return params, adam, aux_state, metrics, iteration + 1

    return jax.jit(
        step, out_shardings=(shard, adam_sh, shard, rep, rep))


def shard_state(params, adam, aux, mesh: Mesh, axis: str = "data"):
    """Place scene state with the leading-arena-axis sharding
    make_mp_train_step expects (params/moments/aux split over the mesh)."""
    shard = NamedSharding(mesh, P(axis))
    rep = NamedSharding(mesh, P())
    put = lambda t, s: jax.tree.map(lambda a: jax.device_put(a, s), t)
    from gaussmart_tpu.optim import AdamState
    adam = AdamState(mu=put(adam.mu, shard), nu=put(adam.nu, shard),
                     step=jax.device_put(adam.step, rep))
    return put(params, shard), adam, put(aux, shard)


def render_gaussian_sharded(mesh: Mesh, prep, means2d, bg, width: int,
                            height: int, chunk: int = 64,
                            axis: str = "data", backend: str = "dense",
                            raster_kwargs: Optional[dict] = None):
    """Splat-sharded rendering (parallel/DESIGN.md §3): splats are depth-
    sorted and split into mesh-size contiguous strata; each device
    composites ONLY its stratum (1/D of the splats — the memory-scaling
    axis for multi-million-splat scenes), and the per-pixel segments are
    folded across the mesh with the associativity of the `over` operator:

        C = C_near + T_near * C_far,   T = T_near * T_far,

    plus the distortion-moment merge (M1/M2 incoming offsets), a
    highest-rank-hit pick for median depth, and an exact sticky-termination
    carry: pass 1 reports each stratum's min test transmittance, the fold
    detects the stratum where the single-chip walk would freeze
    (T_in*min_test < T_EPS) and zeroes the seed T for every later stratum,
    and the final T is the last live stratum's seeded T — so the composite
    matches the single-chip walk INCLUDING the early-termination freeze
    (pass-1 moment factors remain w-linear approximations below the
    T_EPS=1e-4 cutoff; everything else is exact to fp rounding).

    Pass 1 composites every stratum locally (init T=1) and all-gathers the
    per-pixel transmittance factors + moment totals; pass 2 re-composites
    with the exact incoming (T, M1, M2) so every accumulator — including
    the T>0.5 median crossing and A_before in the distortion integral —
    is computed against GLOBAL state; a psum then combines the per-shard
    contributions.

    backend="pallas" runs both passes through the production tiled kernel:
    rasterize_tiled's seeded core carries a custom VJP (gradients to splats,
    seed, and the raw T/M1/M2 fold outputs), so this path is fully
    differentiable — the model-parallel TRAINING path on TPU. Pass 1 uses
    an identity seed so its moment outputs also ride the differentiable
    seeded core. `raster_kwargs` forwards duplicate budgets and the
    need_dist_grad/need_med_grad backward specializations to
    rasterize_tiled."""
    from gaussmart_tpu.render.raster_dense import rasterize_pixels

    if backend == "pallas":
        from gaussmart_tpu.render.raster_pallas import rasterize_tiled

        def raster(prep_l, means2d_l, init=None):
            if init is None:
                npix = width * height
                init = {"T": jnp.ones(npix), "M1": jnp.zeros(npix),
                        "M2": jnp.zeros(npix)}
            out = rasterize_tiled(
                prep_l, means2d_l, jnp.zeros(3), width, height,
                init_state=init, return_raw=True,
                **(raster_kwargs or {}))
            return out["raw"], out["n_dropped"]
    else:
        def raster(prep_l, means2d_l, init=None):
            out = rasterize_pixels(
                prep_l, means2d_l, jnp.zeros(3), width, height,
                chunk=chunk, return_raw=True, init_state=init)
            return out["raw"], jnp.zeros((), jnp.int32)

    n_dev = mesh.devices.size
    N = prep.depth.shape[0]

    # depth-stratified assignment: global sort, contiguous strata
    sort_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(sort_key)
    n_pad = _round_up_int(N, n_dev)

    def shard_leaf(x):
        x = x[order]
        pad = [(0, n_pad - N)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad).reshape((n_dev, n_pad // n_dev) + x.shape[1:])

    prep_s = jax.tree.map(shard_leaf, prep)
    # padded rows must not contribute
    pad_valid = jnp.pad(prep.valid[order], (0, n_pad - N))
    prep_s = prep_s._replace(
        valid=pad_valid.reshape(n_dev, -1),
        opacity=prep_s.opacity * pad_valid.reshape(n_dev, -1))
    means2d_s = shard_leaf(means2d)

    def per_device(prep_l, means2d_l, bg_l):
        prep_l = jax.tree.map(lambda a: a[0], prep_l)
        means2d_l = means2d_l[0]
        rank = jax.lax.axis_index(axis)

        # pass 1: local composite (init T=1) -> stratum summary
        p1, _ = raster(prep_l, means2d_l)
        factors = jax.lax.all_gather(
            jnp.stack([p1["T"], p1["M1"], p1["M2"],
                       p1["min_test"]]), axis)                   # [D,4,P]
        ranks = jnp.arange(n_dev)
        before = (ranks < rank)[:, None]
        T_in = jnp.prod(jnp.where(before, factors[:, 0], 1.0), axis=0)
        # incoming moments: earlier strata's local moments scaled by THEIR
        # incoming transmittance (w-linearity; exact modulo T_EPS cutoffs)
        T_in_all = jnp.concatenate([
            jnp.ones((1,) + T_in.shape),
            jnp.cumprod(factors[:, 0], axis=0)[:-1]], axis=0)    # [D,P]
        M1_in = jnp.sum(jnp.where(before, T_in_all * factors[:, 1], 0.0), 0)
        M2_in = jnp.sum(jnp.where(before, T_in_all * factors[:, 2], 0.0), 0)
        # sticky-termination carry: single-chip stops a pixel for good once
        # test_T = T(1-alpha) < T_EPS, and its frozen T can be as large as
        # T_EPS/(1-ALPHA_MAX), so "T_in < T_EPS" alone cannot reconstruct
        # `done`. Stratum k triggered globally iff T_in_k * min_test_k <
        # T_EPS (tests decrease monotonically along a walk; w-linearity
        # maps local tests to global ones). A zero seed transmittance
        # reproduces "done": every later contribution gets w = alpha*T = 0.
        trig = T_in_all * factors[:, 3] < T_EPS                  # [D,P]
        done_in = jnp.any(jnp.where(before, trig, False), axis=0)
        T_seed = jnp.where(done_in, 0.0, T_in)

        # pass 2: exact re-composite against global incoming state
        p2, nd = raster(prep_l, means2d_l,
                        init={"T": T_seed, "M1": M1_in, "M2": M2_in})

        local = {
            "color": p2["color"], "normal": p2["normal"],
            "depth": p2["depth"], "alpha": p2["alpha"],
            "dist": p2["dist"],
        }
        tot = jax.tree.map(lambda v: jax.lax.psum(v, axis), local)
        # final transmittance = the LAST LIVE stratum's seeded T (exact,
        # incl. the early-termination freeze); the naive product of local
        # factors keeps multiplying past a termination cut
        r_live = jnp.where(~done_in, rank, -1)
        r_star = jax.lax.pmax(r_live, axis)
        T_total = jax.lax.psum(
            jnp.where(r_live == r_star, p2["T"], 0.0), axis)

        # median: the deepest stratum that recorded a T>0.5 crossing wins
        hit = p2["median"] > 0
        r_hit = jnp.where(hit, rank, -1)
        r_star = jax.lax.pmax(r_hit, axis)
        med = jax.lax.psum(jnp.where(r_hit == r_star, p2["median"], 0.0),
                           axis)

        image = tot["color"] + T_total[None, :] * bg_l[:, None]
        allmap = jnp.stack([
            tot["depth"], tot["alpha"],
            tot["normal"][0], tot["normal"][1], tot["normal"][2],
            med, tot["dist"]], axis=0)
        return (image.reshape(3, height, width),
                allmap.reshape(7, height, width),
                jax.lax.psum(nd, axis))

    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P_spec_tree(prep_s, axis), P(axis), P()),
        out_specs=(P(), P(), P()),
        check_vma=False)
    image, allmap, n_dropped = fn(prep_s, means2d_s, bg)
    return {"image": image, "allmap": allmap,
            "n_dropped": jax.lax.stop_gradient(n_dropped)}


def P_spec_tree(tree, axis: str):
    return jax.tree.map(lambda _: P(axis), tree,
                        is_leaf=lambda x: hasattr(x, "shape"))


def _round_up_int(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def render_row_sharded(mesh: Mesh, prep, means2d, bg, width: int, height: int,
                       chunk: int = 64, axis: str = "data"):
    """Shard image rows over devices; splats replicated. Exact: compositing
    is independent per pixel."""
    from gaussmart_tpu.render.raster_dense import rasterize_pixels

    n_dev = mesh.devices.size
    assert height % n_dev == 0, "pad image height to a multiple of mesh size"

    def per_device(prep_l, means2d_l, bg_l):
        # Each device rasterizes its row block by shifting pixel-y origin:
        # implemented by rendering the full-width block with offset rows.
        row0 = jax.lax.axis_index(axis) * (height // n_dev)
        out = rasterize_pixels(prep_l, means2d_l, bg_l, width, height,
                               chunk=chunk, row_offset=row0,
                               rows=height // n_dev)
        return out["image"], out["allmap"]

    fn = jax.shard_map(
        per_device, mesh=mesh,
        in_specs=(P(), P(), P()),
        out_specs=(P(None, axis, None), P(None, axis, None)),
        check_vma=False)
    image, allmap = fn(prep, means2d, bg)
    return {"image": image, "allmap": allmap}
