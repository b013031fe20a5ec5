"""Tile-binned Pallas TPU rasterizer — the production 2DGS compositor.

Semantics-equivalent to the dense XLA compositor (raster_dense.py, itself
the behavioral mirror of reference kernel N1 — SURVEY.md §2.2) with the
CUDA tile pipeline re-designed around the TPU's (8,128) vector registers:

  XLA stage (vectorized, fused):
    1. map a static W-slot work buffer to (splat, duplicate) pairs with a
       binary search over cumsum(footprint-rect tile counts) — every splat
       gets its FULL clipped rect (CUDA duplication semantics, no per-splat
       cap), compaction with no scatter;
    2. sort once by a single packed int32 (tile | quantized-depth) key —
       the XLA replacement for the CUDA radix sort;
    3. K-align per-tile ranges so kernel DMA windows never cross tiles;
       gather splat attributes into a row-per-entry [M, 128] blob.

  Pallas stage — the 4-stream sub-tile scheme: one grid program owns a
  32x32-pixel *group* = 2x2 16x16 tiles. Each tile is an independent
  front-to-back stream; its 256 pixels live in a 2-sublane band of the
  (8,128) vreg set, so EVERY vector op composites 4 entries (one per
  stream) at once. Splats are far smaller than a 32x32 tile, so v1's
  one-entry-per-vreg scheme wasted most lanes; the 4-stream layout
  recovers ~3x arithmetic efficiency at the cost of per-field 4-way
  sublane broadcasts. Chunks stream HBM->VMEM with double buffering and
  per-stream gating; early exit when every pixel of the group saturates.

  Backward (custom VJP, same grid): re-traverses each stream back-to-front
  reconstructing T_before = T/(1-alpha) like the CUDA backward, with the
  suffix accumulator S = sum_{j>i} w_j dL/dw_j. Geometry cotangents come
  from a hand-derived VJP (shared forward intermediates, cross-product
  transpose; validated against autodiff in tests). Entries invisible in
  the whole group skip the heavy path. Per-entry gradient rows are written
  race-free to the padded [M, 128] layout and scatter-added to splats.

Distortion gradients use the pairwise identity
    dist = sum_{k<j} w_j w_k (m_j - m_k)^2
so only the totals (A_n, M1_n, M2_n) are needed as residuals:
    d dist / d w_i = m_i^2 A_n + M2_n - 2 m_i M1_n
    d dist / d m_i = 2 w_i (m_i A_n - M1_n).
"""
from __future__ import annotations

import functools
import os
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gaussmart_tpu.render.raster_common import (ALPHA_EPS, ALPHA_MAX,
                                                FILTER_INV_SQUARE, NEAR_PLANE,
                                                T_EPS, Preprocessed,
                                                mapped_depth)
from gaussmart_tpu.render.segsum_pallas import (CB as SEG_CB, ID_LANE,
                                                segment_sum_sorted)

TILE = 16           # binning tile (one stream)
GROUP = 32          # 2x2 tiles per grid program
STREAMS = 4
K = 64              # splat entries per DMA chunk
F = 20              # blob feature columns (see _build_blob)
# "compact" (default) scatter-adds only the K-aligned walked-prefix
# windows the backward's out-DMAs actually write (~28% of the sorted
# entries at the bench workload; the rest of the full scatter's
# 15 ns/row floor was spent adding exact zeros) — see _grad_reduce.
# MEASURED (v5e, 2026-08-21, 100k bench): 17.40 -> 19.31 it/s, and it
# replaces the scatter-floor explosion at the multi-million-splat
# scale (the cap tracks tile count, not entry count).
# "scatter" keeps the full XLA .at[].add gradient reduction (also the
# lax.cond fallback when the compact windows overflow their cap).
# "segsum" routes it through the sorted-segment-sum Pallas kernel
# (segsum_pallas). MEASURED (v5e, 2026-08-21, 100k-splat bench): the
# microbenched chain (inv sort 2.5 + row gather 3.5 + segsum kernel 5.0)
# beats the 16.7 ms standalone scatter, but IN-STEP the segsum program
# regresses the train step 14.26 -> 7.9 it/s — the custom-call +
# reorder chain in the backward breaks XLA's fusion/layout around it
# (+20 ms of copies and select fusions appear step-wide; see the
# GMT_SEGSUM_BARRIER layout firewall in _grad_reduce).
_GRAD_REDUCE = os.environ.get("GMT_GRAD_REDUCE", "compact")
_FWD_UNROLL = int(os.environ.get("GMT_FWD_UNROLL", "8"))
_BWD_UNROLL = int(os.environ.get("GMT_BWD_UNROLL", "8"))
# Row width of the per-entry blob and gradient buffers. MEASURED NEGATIVE
# (round 5): shrinking to 32 lanes (the 20 features only need 32) is
# rejected by Mosaic — HBM<->VMEM DMA slice shapes must be 128-lane
# multiples ("Slice shape along dimension 1 must be aligned to tiling
# (128), but is 32"), and packing 4 entries per 128-lane row dies on
# per-tile start misalignment (starts are not 4-entry aligned, so the
# lane quarter becomes a traced per-stream offset that would force
# dynamic lane slicing in the hot delivery path). The ~3 ms/step of
# lane-pad + zero traffic this width costs at the bench scale is
# structural. XLA-side, gather[M,20]+pad == gather[M,128] from a
# pre-padded blob (3.14 vs 3.2 ms microbenched) — no free lunch there
# either.
F_PAD = 128
CH = 14             # forward framebuffer channels (incl. min_test)
FARNEAR = (100.0 * 0.2) / (100.0 - 0.2)  # d(mapped)/d(depth) numerator


# ---------------------------------------------------------------------------
# per-entry geometry (shared math; scalars or broadcast fields -> pixels)
# ---------------------------------------------------------------------------

def _geom(scal, px, py):
    """scal: [13] = (T9[9], cx, cy, sx, sy). Returns (rho, depth)."""
    b = [scal[i] for i in range(9)]
    cx, cy, sx, sy = scal[9], scal[10], scal[11], scal[12]
    pxe = px - sx
    pye = py - sy
    kx = pxe * b[2] - b[0]
    ky = pxe * b[5] - b[3]
    kz = pxe * b[8] - b[6]
    lx = pye * b[2] - b[1]
    ly = pye * b[5] - b[4]
    lz = pye * b[8] - b[7]
    p_x = ky * lz - kz * ly
    p_y = kz * lx - kx * lz
    p_z = kx * ly - ky * lx
    degenerate = jnp.abs(p_z) < 1e-12
    inv_pz = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, p_z))
    su = p_x * inv_pz
    sv = p_y * inv_pz
    rho3d = jnp.where(degenerate, jnp.float32(jnp.inf), su * su + sv * sv)
    depth3d = su * b[2] + sv * b[5] + b[8]
    dx = cx - pxe
    dy = cy - pye
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(use3d, depth3d, b[8])
    return rho, depth


def _alpha_from(scal_geom, opacity, px, py):
    rho, depth = _geom(scal_geom, px, py)
    alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(-0.5 * rho))
    ok = (alpha >= ALPHA_EPS) & (depth >= NEAR_PLANE)
    return jnp.where(ok, alpha, 0.0), depth


def _geom_fwd_res(scal, opacity, px, py):
    """Forward geometry keeping the intermediates the manual VJP reuses.
    `scal` entries and `opacity` may be scalars or broadcast pixel fields."""
    b = [scal[i] for i in range(9)]
    cx, cy, sx, sy = scal[9], scal[10], scal[11], scal[12]
    pxe = px - sx
    pye = py - sy
    kx = pxe * b[2] - b[0]
    ky = pxe * b[5] - b[3]
    kz = pxe * b[8] - b[6]
    lx = pye * b[2] - b[1]
    ly = pye * b[5] - b[4]
    lz = pye * b[8] - b[7]
    p_x = ky * lz - kz * ly
    p_y = kz * lx - kx * lz
    p_z = kx * ly - ky * lx
    degenerate = jnp.abs(p_z) < 1e-12
    inv_pz = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, p_z))
    u = p_x * inv_pz
    v = p_y * inv_pz
    rho3d = jnp.where(degenerate, jnp.float32(jnp.inf), u * u + v * v)
    depth3d = u * b[2] + v * b[5] + b[8]
    dxc = cx - pxe
    dyc = cy - pye
    rho2d = FILTER_INV_SQUARE * (dxc * dxc + dyc * dyc)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(use3d, depth3d, b[8])
    g = jnp.exp(-0.5 * rho)
    a_raw = opacity * g
    alpha = jnp.minimum(ALPHA_MAX, a_raw)
    ok = (alpha >= ALPHA_EPS) & (depth >= NEAR_PLANE)
    alpha = jnp.where(ok, alpha, 0.0)
    return dict(b=b, pxe=pxe, pye=pye, kx=kx, ky=ky, kz=kz, lx=lx, ly=ly,
                lz=lz, inv_pz=inv_pz, u=u, v=v, use3d=use3d, dxc=dxc,
                dyc=dyc, g=g, live=ok & (a_raw < ALPHA_MAX),
                alpha=alpha, depth=depth)


def _geom_manual_bwd(res, opacity, ca, cd):
    """Hand-derived cotangents of (alpha, depth) w.r.t. the 13 geometry
    scalars + opacity. Returns ([13] per-pixel gradient FIELDS, gop field);
    the caller reduces over each stream's pixels. Validated against the
    autodiff oracle in tests/test_geom_vjp.py.

    Op-count notes (round 5): crho reuses gop_f (saves 2 mul); the cross-
    product cotangents are computed in NEGATED form (nck*, ncl*) so the
    six gb sign flips become free operand swaps of the subtractions, at
    the cost of one negation on inv_pz + one on cpz (net -5 vector
    ops/entry)."""
    b = res["b"]
    live = res["live"].astype(jnp.float32)
    g = res["g"]
    gop_f = ca * g * live
    crho = (-0.5) * opacity * gop_f
    use3d = res["use3d"]
    u3 = use3d.astype(jnp.float32)
    crho3 = crho * u3
    crho2 = crho - crho3
    cdep3 = cd * u3
    cd_b8 = cd - cdep3

    f4x = 2.0 * FILTER_INV_SQUARE * res["dxc"] * crho2
    f4y = 2.0 * FILTER_INV_SQUARE * res["dyc"] * crho2

    u, v, inv_pz = res["u"], res["v"], res["inv_pz"]
    cu = 2.0 * u * crho3 + b[2] * cdep3
    cv = 2.0 * v * crho3 + b[5] * cdep3
    ninv_pz = -inv_pz
    ncpx = cu * ninv_pz                    # = -cpx
    ncpy = cv * ninv_pz                    # = -cpy
    ncpz = -(u * ncpx + v * ncpy)          # = -cpz
    kx, ky, kz = res["kx"], res["ky"], res["kz"]
    lx, ly, lz = res["lx"], res["ly"], res["lz"]
    nckx = ly * ncpz - lz * ncpy           # = -ckx
    ncky = lz * ncpx - lx * ncpz
    nckz = lx * ncpy - ly * ncpx
    nclx = ncpy * kz - ncpz * ky
    ncly = ncpz * kx - ncpx * kz
    nclz = ncpx * ky - ncpy * kx

    pxe, pye = res["pxe"], res["pye"]
    gb = [None] * 9
    gb[0] = nckx
    gb[3] = ncky
    gb[6] = nckz
    gb[1] = nclx
    gb[4] = ncly
    gb[7] = nclz
    gb[2] = u * cdep3 - (pxe * nckx + pye * nclx)
    gb[5] = v * cdep3 - (pxe * ncky + pye * ncly)
    gb[8] = cdep3 + cd_b8 - (pxe * nckz + pye * nclz)
    gcx = f4x
    gcy = f4y
    gsx = f4x + (nckx * b[2] + ncky * b[5] + nckz * b[8])
    gsy = f4y + (nclx * b[2] + ncly * b[5] + nclz * b[8])
    return gb + [gcx, gcy, gsx, gsy], gop_f


def _reduce_rows(fields):
    """Sum (8,128) fields to full-group scalars (kept for tests/utility)."""
    return [jnp.sum(f) for f in fields]


# ---------------------------------------------------------------------------
# group/stream geometry helpers
# ---------------------------------------------------------------------------

def _stream_pixels(tids, tiles_x):
    """Pixel coords for 4 arbitrary 16x16 tiles. Stream s owns sublanes
    {s, s+4} (so a tiled 4->8 sublane repeat broadcasts per-stream values
    correctly); p_local = (sublane//4)*128 + lane."""
    sub = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    stream_id = sub % 4
    a = sub // 4
    p_local = a * 128 + lane
    px_local = (p_local % TILE).astype(jnp.float32)
    py_local = (p_local // TILE).astype(jnp.float32)
    ox = _bcast4([(t % tiles_x).astype(jnp.float32) * TILE for t in tids],
                 stream_id)
    oy = _bcast4([(t // tiles_x).astype(jnp.float32) * TILE for t in tids],
                 stream_id)
    return ox + px_local, oy + py_local, stream_id


def _bcast4(vals, stream_id):
    """Broadcast 4 per-stream scalars into the (8,128) stream layout."""
    x = jnp.where(stream_id < 1, vals[0], vals[1])
    x = jnp.where(stream_id == 2, vals[2], x)
    x = jnp.where(stream_id == 3, vals[3], x)
    return x


def _reduce4(field):
    """Per-stream sums of an (8,128) field -> 4 scalars (stream s owns
    sublanes s and s+4)."""
    lane_sum = jnp.sum(field, axis=1)          # (8,)
    return [lane_sum[s] + lane_sum[s + 4] for s in range(STREAMS)]


def _reduce_block(fields):
    """Per-stream sums of F fields -> one (STREAMS, F_PAD) block without
    scalar extraction: fold the {s, s+4} sublane pair, lane-reduce to a
    (4,1) column, place at the field's lane.

    Measured note (round 4): an MXU variant (per-field (4,128)@ones(128,128)
    dot to put the row sum in every lane) was tried in round 3 and REGRESSED
    the train step 13.86 -> 10.76 it/s on the v5e at the (20,4) budget — 20
    per-entry 128x128 matmuls are far more expensive than 7 shifted adds for
    a 4x128 row-sum. Keep the VPU lane reduction; any future change to this
    function must carry a measured bench number in its commit.

    Also measured (round 4): pairing two folded (4,128) fields into one
    (8,128) vreg so one lane-reduction tree serves both fields benches
    13.733 vs 13.852 it/s — the VLIW scheduler already hides the per-field
    reduction behind neighboring entries' geometry math (same finding as
    round 2's fake-reduce test), and the extra concat costs more than the
    saved shifts. Keep the simple per-field loop."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (STREAMS, F_PAD), 1)
    block = jnp.zeros((STREAMS, F_PAD), jnp.float32)
    for f_idx, f in enumerate(fields):
        folded = f[0:4] + f[4:8]                       # (4,128)
        col = jnp.sum(folded, axis=1, keepdims=True)   # (4,1)
        block = jnp.where(lane == f_idx, col, block)
    return block


def _pack_row(vals):
    """Pack F scalars into an (F_PAD,) row with masked selects (scalar
    stores to VMEM are not lowerable)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, F_PAD), 1).reshape(F_PAD)
    row = jnp.zeros((F_PAD,), jnp.float32)
    for i, v in enumerate(vals):
        row = jnp.where(lane == i, v, row)
    return row


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------



def _make_fwd_kernel(tiles_x: int, with_init: bool = False):
    """`with_init=True` adds a per-pixel (T, M1, M2) seed input so a depth-
    contiguous SEGMENT of a larger splat set composites exactly against the
    global incoming state (Gaussian-sharded rendering, parallel/DESIGN.md
    §3) — the tiled analogue of rasterize_pixels' init_state."""
    def kernel(starts_ref, counts_ref, order_ref, blob_ref, *rest):
        if with_init:
            init_ref, fb_ref, ints_ref, chunk, sems = rest
        else:
            fb_ref, ints_ref, chunk, sems = rest
        g = pl.program_id(0)
        tids = [order_ref[STREAMS * g + s] for s in range(STREAMS)]
        px, py, stream_id = _stream_pixels(tids, tiles_x)
        starts = [starts_ref[t] for t in tids]
        counts = [counts_ref[t] for t in tids]
        chunks_s = [pl.cdiv(cn, K) for cn in counts]
        n_chunks = functools.reduce(jnp.maximum, chunks_s)
        max_count = functools.reduce(jnp.maximum, counts)
        count_f = _bcast4([c.astype(jnp.float32) for c in counts], stream_id)

        zero = jnp.zeros((8, 128), jnp.float32)
        izero = jnp.zeros((8, 128), jnp.int32)
        if with_init:
            T0, M1_0, M2_0 = init_ref[0, 0], init_ref[0, 1], init_ref[0, 2]
        else:
            T0, M1_0, M2_0 = jnp.ones((8, 128), jnp.float32), zero, zero
        state0 = dict(
            T=T0, done=izero,
            C0=zero, C1=zero, C2=zero, D=zero, A=zero,
            N0=zero, N1=zero, N2=zero, med=zero, dist=zero,
            M1=M1_0, M2=M2_0, mt=zero + 2.0,
            n_contrib=izero, med_e=izero - 1)

        # UNCONDITIONAL clamped in-DMAs (round 5): the per-stream
        # @pl.when(c < chunks_s[s]) gates (+ the zero-fill else branch)
        # cost real branch bubbles per chunk; instead every stream always
        # DMAs a window, clamped to stay in-array. A short stream's extra
        # window holds OTHER tiles' rows — finite real data whose entries
        # are masked to alpha=0 by the per-stream count check (in_range),
        # exactly like the ragged chunk tail. This also removes the
        # uninitialized-VMEM hazard the zero-fill guarded (the slot is
        # always written by the DMA).
        dma_hi = blob_ref.shape[0] - K

        def dma_at(slot, s, c):
            base = jnp.minimum(starts[s] + c * K, dma_hi)
            return pltpu.make_async_copy(
                blob_ref.at[pl.ds(base, K), :],
                chunk.at[slot, :, s, :], sems.at[slot, s])

        def start_dmas(slot, c):
            for s in range(STREAMS):
                dma_at(slot, s, c).start()

        def wait_dmas(slot, c):
            for s in range(STREAMS):
                dma_at(slot, s, c).wait()

        @pl.when(n_chunks > 0)
        def _():
            start_dmas(0, 0)

        def body(carry):
            c, st = carry
            slot = jax.lax.rem(c, 2)

            @pl.when(c + 1 < n_chunks)
            def _():
                start_dmas(jax.lax.rem(c + 1, 2), c + 1)

            wait_dmas(slot, c)

            def entry(e, st):
                e_rel = c * K + e
                block4 = chunk[slot, e]               # [STREAMS, F_PAD]

                def fld(i):
                    # lane-broadcast column i, duplicate sublanes 4->8
                    col = jnp.broadcast_to(block4[:, i:i + 1], (STREAMS, 128))
                    return pltpu.repeat(col, 2, axis=0)

                scal = [fld(i) for i in range(13)]
                opacity = fld(13)
                rho, depth = _geom(scal, px, py)
                alpha = jnp.minimum(ALPHA_MAX, opacity * jnp.exp(-0.5 * rho))
                ok = (alpha >= ALPHA_EPS) & (depth >= NEAR_PLANE)
                in_range = jnp.float32(e_rel) < count_f
                alpha = jnp.where(ok & in_range, alpha, 0.0)

                T = st["T"]
                alive = st["done"] == 0
                has_a = alpha > 0
                test_T = T * (1.0 - alpha)
                trigger = alive & has_a & (test_T < T_EPS)
                contrib = alive & has_a & (test_T >= T_EPS)
                w = jnp.where(contrib, alpha * T, 0.0)

                dsafe = jnp.where(contrib, depth, 1.0)
                m = jnp.where(contrib, mapped_depth(dsafe), 0.0)
                A_before = 1.0 - T
                dsel = jnp.where(contrib, depth, 0.0)

                new = dict(st)
                new["dist"] = st["dist"] + (m * m * A_before + st["M2"]
                                            - 2.0 * m * st["M1"]) * w
                new["M1"] = st["M1"] + m * w
                new["M2"] = st["M2"] + m * m * w
                med_hit = contrib & (T > 0.5)
                new["med"] = jnp.where(med_hit, dsel, st["med"])
                new["med_e"] = jnp.where(med_hit, e_rel, st["med_e"])
                new["C0"] = st["C0"] + w * fld(14)
                new["C1"] = st["C1"] + w * fld(15)
                new["C2"] = st["C2"] + w * fld(16)
                new["N0"] = st["N0"] + w * fld(17)
                new["N1"] = st["N1"] + w * fld(18)
                new["N2"] = st["N2"] + w * fld(19)
                new["D"] = st["D"] + w * dsel
                new["A"] = st["A"] + w
                new["T"] = jnp.where(contrib, test_T, T)
                new["done"] = jnp.maximum(st["done"], trigger.astype(jnp.int32))
                new["n_contrib"] = jnp.where(contrib, e_rel + 1, st["n_contrib"])
                # min test transmittance over CONSIDERED entries (incl. the
                # terminating one, which T itself never records) — lets the
                # Gaussian-sharded fold reconstruct the sticky `done` state
                # exactly: stratum k triggered iff T_in_k*min_test_k < T_EPS
                new["mt"] = jnp.where(alive & has_a,
                                      jnp.minimum(st["mt"], test_T), st["mt"])
                return new

            # only walk up to the longest stream's remaining entries —
            # per-stream lists are usually much shorter than K
            bound = jnp.clip(max_count - c * K, 0, K)
            # manual 8x unroll: entry geometry is independent between
            # iterations (only the cheap T/accumulator carry is serial), so
            # batching entries lets the VLIW scheduler overlap their vector
            # work (measured: 28.2 -> 31.0 it/s on the 100k bench; x16 is
            # flat). Entries past `bound` are masked no-ops (alpha forced 0
            # by the count_f range check), so a ragged bound rounds up safely.
            def octet(i, st):
                for q in range(_FWD_UNROLL):
                    st = entry(_FWD_UNROLL * i + q, st)
                return st

            st = jax.lax.fori_loop(0, pl.cdiv(bound, _FWD_UNROLL), octet, st)
            return c + 1, st

        def cond(carry):
            c, st = carry
            return (c < n_chunks) & (jnp.sum(st["done"]) < 8 * 128)

        c_final, st = jax.lax.while_loop(cond, body, (jnp.int32(0), state0))

        # Early exit leaves prefetched chunks in flight; drain them (a
        # dangling DMA semaphore deadlocks the core at teardown).
        @pl.when(c_final < n_chunks)
        def _():
            wait_dmas(jax.lax.rem(c_final, 2), c_final)

        names = ["C0", "C1", "C2", "D", "A", "N0", "N1", "N2", "med",
                 "dist", "T", "M1", "M2", "mt"]
        for i, nm in enumerate(names):
            fb_ref[0, i] = st[nm]
        ints_ref[0, 0] = st["n_contrib"]
        ints_ref[0, 1] = st["med_e"]

    return kernel


# ---------------------------------------------------------------------------
# backward kernel
# ---------------------------------------------------------------------------

def _make_bwd_kernel(tiles_x: int, need_dist: bool, need_med: bool,
                     with_init: bool = False, with_ids: bool = False):
    """`need_dist`/`need_med` statically elide the distortion-channel and
    median-depth gradient paths (zero cotangents when the training recipe
    sets lambda_dist=0 / depth_ratio=0 — the default, BASELINE.md).

    `with_init=True` builds the SEEDED backward (Gaussian-sharded training):
    the segment composited against an incoming per-pixel (T0, M1_0, M2_0)
    seed. Three extensions, derived from writing the seeded distortion as
    the in-segment pairwise sum plus the upstream cross term
        dist = sum_{j>k in seg} w_j w_k (m_j-m_k)^2
             + sum_i w_i (m_i^2 A_up + M2_0 - 2 m_i M1_0),  A_up = 1 - T0
    (exact because the seeds ARE the upstream aggregates):
      * the raw moment outputs M1/M2 now carry cotangents (they feed the
        cross-shard fold), adding m*dM1 + m^2*dM2 to the per-entry weight
        cotangent and (dM1 + 2 m dM2) * w * dm/dd to the depth cotangent;
      * every A_n in the distortion terms becomes A_n + A_up;
      * seed gradients, emitted per pixel after the reverse walk:
          gT0   = (S_end + dT*T_final)/T0 - dDist*(M2_n - M2_0)
          gM1_0 = dM1 - 2*dDist*(M1_n - M1_0)
          gM2_0 = dM2 + dDist*A_n
        (every output is linear in T0 through its w_i = T0 u_i factors, so
        the w-routed part of dL/dT0 is S_end/T0; T0 >= T_EPS by the
        forward's early-termination invariant, so the division is safe)."""
    def kernel(starts_ref, counts_ref, order_ref, blob_ref, fb_ref, ints_ref,
               ct_ref, *rest):
        if with_init:
            (init_ref, gzero_ref, grad_ref, gi_ref,
             chunk, gchunk, sems, gsems) = rest
        else:
            gzero_ref, grad_ref, chunk, gchunk, sems, gsems = rest
        del gzero_ref  # aliased to grad_ref: zero-fills rows never written
        g = pl.program_id(0)
        tids = [order_ref[STREAMS * g + s] for s in range(STREAMS)]
        px, py, stream_id = _stream_pixels(tids, tiles_x)
        starts = [starts_ref[t] for t in tids]
        counts = [counts_ref[t] for t in tids]
        count_f = _bcast4([cn.astype(jnp.float32) for cn in counts], stream_id)

        A_n = fb_ref[0, 4]
        M1_n = fb_ref[0, 11]
        M2_n = fb_ref[0, 12]
        T_final = fb_ref[0, 10]
        n_contrib = ints_ref[0, 0]
        med_e = ints_ref[0, 1]
        # per-stream last contributor -> processed chunk range
        needed = [jnp.minimum(jnp.max(jnp.where(stream_id == s, n_contrib, 0)),
                              counts[s]) for s in range(STREAMS)]
        n_rel = [pl.cdiv(nd, K) for nd in needed]
        start_c = functools.reduce(jnp.maximum, n_rel)
        max_needed = functools.reduce(jnp.maximum, needed)

        dC = (ct_ref[0, 0], ct_ref[0, 1], ct_ref[0, 2])
        dD = ct_ref[0, 3]
        dA = ct_ref[0, 4]
        dN = (ct_ref[0, 5], ct_ref[0, 6], ct_ref[0, 7])
        dMed = ct_ref[0, 8]
        dDist = ct_ref[0, 9]
        dT_n = ct_ref[0, 10]
        if with_init:
            T0 = init_ref[0, 0]
            M1_0 = init_ref[0, 1]
            M2_0 = init_ref[0, 2]
            dM1 = ct_ref[0, 11]
            dM2 = ct_ref[0, 12]
            A_eff = A_n + (1.0 - T0)     # in-segment alpha + upstream alpha
        else:
            A_eff = A_n
        # loop-invariant: the T-cotangent routed through the suffix term
        # (hoisted out of the per-entry body — it used to cost one
        # multiply per entry)
        TdT = T_final * dT_n

        # Unconditional clamped in-DMAs — same rationale and masking
        # guarantees as the forward (see _make_fwd_kernel); the out-DMAs
        # below KEEP their gates (an ungated out-DMA would overwrite
        # other tiles' gradient rows).
        dma_hi = blob_ref.shape[0] - K

        def dma_at(slot, s, c):
            base = jnp.minimum(starts[s] + c * K, dma_hi)
            return pltpu.make_async_copy(
                blob_ref.at[pl.ds(base, K), :],
                chunk.at[slot, :, s, :], sems.at[slot, s])

        def start_dmas(slot, c):
            for s in range(STREAMS):
                dma_at(slot, s, c).start()

        def wait_dmas(slot, c):
            for s in range(STREAMS):
                dma_at(slot, s, c).wait()

        # Rows in chunks the reverse walk never reaches ([n_rel[s], ...))
        # stay zero via the XLA-side zero buffer aliased into grad_ref; the
        # scratch zeroing below covers partial-bound rows of the first
        # (highest-c) chunk each slot processes.
        gchunk[...] = jnp.zeros((2, K, STREAMS, F_PAD), jnp.float32)

        def out_dma(gs, s, c):
            return pltpu.make_async_copy(
                gchunk.at[gs, :, s, :],
                grad_ref.at[pl.ds(starts[s] + c * K, K), :],
                gsems.at[gs, s])

        @pl.when(start_c > 0)
        def _():
            start_dmas(jax.lax.rem(start_c - 1, 2), start_c - 1)

        def body(carry):
            c, T_cur, S = carry          # c runs start_c-1 .. 0
            slot = jax.lax.rem(c, 2)
            gs = jax.lax.rem(c, 2)

            @pl.when(c > 0)
            def _():
                start_dmas(jax.lax.rem(c - 1, 2), c - 1)

            # this gchunk slot's previous out-DMA (chunk c+2) must be done
            # before the entry loop rewrites it
            for s in range(STREAMS):
                @pl.when(c + 2 < n_rel[s])
                def _(s=s):
                    out_dma(gs, s, c + 2).wait()

            wait_dmas(slot, c)

            bound = jnp.clip(max_needed - c * K, 0, K)

            def entry(e, carry2):
                T_cur, S = carry2
                e_rel = c * K + e
                block4 = chunk[slot, e]               # [STREAMS, F_PAD]

                def fld(i):
                    col = jnp.broadcast_to(block4[:, i:i + 1], (STREAMS, 128))
                    return pltpu.repeat(col, 2, axis=0)

                scal = [fld(i) for i in range(13)]
                opacity = fld(13)
                color = (fld(14), fld(15), fld(16))
                normal = (fld(17), fld(18), fld(19))

                res = _geom_fwd_res(scal, opacity, px, py)
                alpha, depth = res["alpha"], res["depth"]
                in_range = jnp.float32(e_rel) < count_f
                alpha = jnp.where(in_range, alpha, 0.0)

                contrib = (e_rel < n_contrib) & (alpha > 0)
                grad_any = contrib
                is_med = med_e == e_rel
                if need_med:
                    grad_any = contrib | is_med
                alpha_c = jnp.where(contrib, alpha, 0.0)
                # one reciprocal serves both T_before and the suffix term
                # of dLdalpha (merged from two divides — round-5 op cut)
                inv_oma = 1.0 / (1.0 - alpha_c)
                T_before = T_cur * inv_oma
                w = jnp.where(contrib, alpha_c * T_before, 0.0)

                dsafe = jnp.where(contrib, depth, 1.0)
                dLdw = (color[0] * dC[0] + color[1] * dC[1] + color[2] * dC[2]
                        + depth * dD + dA
                        + normal[0] * dN[0] + normal[1] * dN[1]
                        + normal[2] * dN[2])
                if need_dist or with_init:
                    m = jnp.where(contrib, mapped_depth(dsafe), 0.0)
                if need_dist:
                    dLdw = dLdw + (m * m * A_eff + M2_n - 2.0 * m * M1_n) * dDist
                if with_init:
                    dLdw = dLdw + m * dM1 + m * m * dM2

                # straight-line (round 5): the old per-entry
                # @pl.when(active) pair skipped the VJP for the ~9% of
                # walked entries with no contributing pixel (measured by
                # the GMT_BWD_COUNT build), but two vector-predicated
                # branches per entry cost pipeline bubbles on EVERY entry.
                # With no active pixel, every VJP field is exactly zero
                # (dLdalpha/dLdd/w all carry contrib masks), so the
                # unconditional write is semantically identical.
                dLdalpha = jnp.where(
                    contrib,
                    T_before * dLdw - (S + TdT) * inv_oma,
                    0.0)
                dLdd = w * dD
                if need_dist or with_init:
                    dm_dd = FARNEAR / jnp.square(dsafe)
                if need_dist:
                    dLdd = dLdd + dDist * 2.0 * w * (m * A_eff - M1_n) * dm_dd
                if with_init:
                    dLdd = dLdd + (dM1 + 2.0 * m * dM2) * w * dm_dd
                if need_med:
                    dLdd = dLdd + jnp.where(is_med, dMed, 0.0)
                dLdd = jnp.where(grad_any, dLdd, 0.0)

                gfields, gop_f = _geom_manual_bwd(res, opacity,
                                                  dLdalpha, dLdd)
                fields = (gfields + [gop_f]
                          + [w * dC[ci] for ci in range(3)]
                          + [w * dN[ci] for ci in range(3)])
                blk = _reduce_block(fields)
                if with_ids:
                    # carry the entry's splat id (embedded in the blob at
                    # ID_LANE by _core_fwd_impl) into the gradient row so
                    # the compact reduction needs no 1-D padded_idx gather
                    lane = jax.lax.broadcasted_iota(
                        jnp.int32, (STREAMS, F_PAD), 1)
                    blk = jnp.where(lane == ID_LANE,
                                    block4[:, ID_LANE:ID_LANE + 1], blk)
                gchunk[gs, e] = blk

                S = S + jnp.where(contrib, w * dLdw, 0.0)
                return T_before, S

            # manual unroll of the reverse walk (see forward): entries at
            # or above `bound` are masked no-ops (contrib False -> zero grad
            # row), so a ragged bound rounds up safely. UNROLL is an env
            # knob (GMT_BWD_UNROLL, default 8): the 8x body is ~3.6k
            # instructions with ~20 live (8,128) fields — round-5 walk
            # counting showed the kernel walks only ~61k entries at the
            # bench scale (~7 ms of arithmetic of the 24.5 ms kernel), so
            # the cost is structural (spills/overheads), not entry math.
            n_octets = pl.cdiv(bound, _BWD_UNROLL)

            def octet(i, carry2):
                e_top = _BWD_UNROLL * (n_octets - i) - 1
                for q in range(_BWD_UNROLL):
                    carry2 = entry(e_top - q, carry2)
                return carry2

            T_cur, S = jax.lax.fori_loop(0, n_octets, octet, (T_cur, S))

            for s in range(STREAMS):
                @pl.when(c < n_rel[s])
                def _(s=s):
                    out_dma(gs, s, c).start()
            return c - 1, T_cur, S

        def cond(carry):
            c, _, _ = carry
            return c >= 0

        _, _, S_end = jax.lax.while_loop(
            cond, lambda carry: body((carry[0], carry[1], carry[2])),
            (start_c - 1, T_final, jnp.zeros((8, 128), jnp.float32)))

        if with_init:
            T0_safe = jnp.maximum(T0, 1e-12)
            gT0 = (S_end + T_final * dT_n) / T0_safe
            gM1 = dM1
            gM2 = dM2
            if need_dist:
                gT0 = gT0 - dDist * (M2_n - M2_0)
                gM1 = gM1 - 2.0 * dDist * (M1_n - M1_0)
                gM2 = gM2 + dDist * A_n
            gi_ref[0, 0] = gT0
            gi_ref[0, 1] = gM1
            gi_ref[0, 2] = gM2

        # drain the last two chunks' in-flight gradient writes
        for cc in range(2):
            for s in range(STREAMS):
                @pl.when(cc < n_rel[s])
                def _(s=s, cc=cc):
                    out_dma(jax.lax.rem(jnp.int32(cc), 2), s, cc).wait()

    return kernel


# ---------------------------------------------------------------------------
# XLA-side binning + packing
# ---------------------------------------------------------------------------

def _build_blob(prep: Preprocessed, means2d, half_wh):
    """[N+1, F] feature blob (last row = zero dummy for padding)."""
    shift = means2d * half_wh[None, :]
    rows = [prep.T.reshape(-1, 9)[:, i] for i in range(9)]
    rows += [prep.center2d[:, 0], prep.center2d[:, 1],
             shift[:, 0], shift[:, 1], prep.opacity,
             prep.color[:, 0], prep.color[:, 1], prep.color[:, 2],
             prep.normal[:, 0], prep.normal[:, 1], prep.normal[:, 2]]
    blob = jnp.stack(rows, axis=1)                      # [N, F]
    return jnp.pad(blob, ((0, 1), (0, 0)))


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _binning(prep: Preprocessed, tiles_x: int, tiles_y: int, max_dup: int,
             n_giants: int = 0, giant_dup: int | None = None,
             work_mult: int = 3, conic_cull: bool = True):
    """Duplicate-expand over 16x16 tiles and sort by a packed (tile|depth)
    int32 key into a per-tile K-aligned layout — scatter-free, built from
    parity-merge rank-selects and sorts only.

    TWO-LEVEL compacted expansion (the CUDA reference bins every splat's
    full isotropic 3-sigma square, rasterize_points.cu; like the tight-rect
    footprint in preprocess, this only removes (splat, tile) pairs that
    composite to exactly zero):

      level 1  splat -> (splat, tile-row): a static R_buf-slot row buffer
        maps slots to rect rows. Per row, an EXACT-conservative x-interval
        is computed analytically: the splat contributes where
        rho = min(rho3d, rho2d) <= c_cut, i.e. inside the c_cut level
        conic of rho3d (prep.ell, interior A dx^2 + B dx dy + C dy^2 <= 1)
        OR the rho2d filter disc (radius^2 = c_cut/2). For the tile-row's
        pixel band the ellipse's x-extent is closed-form (the rightmost/
        leftmost ellipse point's dy clamped to the band — the extent is
        concave/convex in dy, so clamping the unconstrained argmax is
        exact) and the disc's is sqrt(r^2 - dy_min^2); the interval is the
        conservative hull of both, widened by 2e-2 relative margins that
        cover the ~2.4e-3 worst-case relative error of the P^-1-built
        conic coefficients 8x over (raster_common.preprocess conditioning
        gate). Splats with no usable ellipse (A=B=C=0: degenerate or
        ill-conditioned) keep their full rect row. `conic_cull=False`
        keeps full rect rows everywhere (the pre-cull CUDA-parity
        enumeration, used by the exactness tests).

      level 2  (splat, tile-row) -> (splat, tile): a W-slot work buffer
        maps slots to columns inside each row's interval. This makes EVERY
        downstream cost — the key sort, the kernels' entry walks, and the
        [M, F] gradient scatter (all proportional to W) — scale with the
        post-cull workload instead of the rect workload, which is where
        the former per-(splat,tile) cull (evaluated per work slot AFTER
        slot allocation) fell short: it culled kernel entries but the
        buffer, sort, and scatter still paid for the full rect.

    Each level's slot->owner rank-select runs as a PARITY-MERGE SORT, the
    only TPU-fast primitive for it (measured on v5e: one 1.5M int32 sort =
    4 ms vs 161 ms for vectorized binary search — 17 serial gather passes —
    and 279 ms for a single 100k scatter): sort ONE int32 array holding
    marker keys 2*min(cum_prev, W) (per owner, even) and slot keys 2m+1
    (odd). Markers enter pre-sorted and stable-tie before their first slot,
    so after the sort the r-th marker IS owner r and parity recovers
    identity with no payload: s = cumsum(is_marker) - 1, m = p - s - 1.
    Per-owner attributes then arrive in ONE row-gather from a packed int32
    table (row gathers are ~6x cheaper than per-column gathers); float
    fields ride the table bitcast.

    W = max(N, 1024)*(max_dup//4 + work_mult) and R_buf = max(N, 1024)*
    max(2, (max_dup//4 + work_mult)//2): the (max_dup, work_mult) budget
    pair keeps its external meaning (one escalating dial — the trainer
    escalates work_mult +1 per adaptive step, the finest W granularity, so
    it lands ON the zero-drop point instead of overshooting; mesh/eval
    paths floor it) and the row buffer scales with it. Overflow of either
    buffer drops trailing entries and reports them in n_dropped (each
    dropped row is weighted by the mean column count of surviving rows, so
    row-buffer overflow on wide-footprint scenes still trips the trainer's
    >1% escalation trigger promptly), which drives the trainer's adaptive
    budget escalation.
    NOTE: cumsums are int32 — total wanted (splat, tile) pairs must stay
    below 2^31, which the trainer's 48M-key cap guarantees.

    Filler trick (unchanged): append exactly K filler entries per tile
    whose key is the tile's maximum depth quantile (real entries are
    clamped one below it). After the stable sort, every tile's run is
    [real entries..., K fillers...], so
      * the sorted payload IS the final index array,
      * tile t's chunked DMA windows [start_t, start_t + ceil(count_t/K)*K)
        stay disjoint from tile t+1's region (at most K rows of padding are
        consumed from the fillers), which the racing backward out-DMAs rely
        on,
      * starts/counts drop out of two searchsorted calls.

    `n_giants`/`giant_dup` are accepted for API compatibility and ignored
    (the tier scheme they configured no longer exists).

    Returns (padded_idx [M_pad] int32 splat indices (N = dummy),
             starts [n_tiles], counts [n_tiles], order, n_dropped,
             ws_sorted [M_pad] int32 work slot per sorted entry (W = dummy)).
    Work slots are assigned splat-major (cum2 is over rows in s1 order, and
    s1 is a cumsum of sorted markers), so slot -> splat id is NON-DECREASING
    — ws_sorted is the permutation the backward inverts to turn its per-
    entry gradient reduction into a SORTED segment sum (segsum_pallas)."""
    del n_giants, giant_dup
    N = prep.depth.shape[0]
    n_tiles = tiles_x * tiles_y
    cx, cy = prep.center2d[:, 0], prep.center2d[:, 1]
    # tight opacity-aware per-axis footprint (see preprocess: EXACT — every
    # tile it cuts relative to the isotropic `radius` square composites zero)
    rx, ry = prep.rx, prep.ry
    valid = prep.valid & (rx > 0) & (ry > 0)

    tx0 = jnp.clip(jnp.floor((cx - rx) / TILE), 0, tiles_x).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((cx + rx) / TILE) + 1, 0, tiles_x).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((cy - ry) / TILE), 0, tiles_y).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((cy + ry) / TILE) + 1, 0, tiles_y).astype(jnp.int32)
    nx = jnp.where(valid, tx1 - tx0, 0)
    ny = jnp.where(valid, ty1 - ty0, 0)

    # N floored at 1024: tiny scenes (early training, unit tests) get slack
    # far beyond their arena, and the floor SCALES with the budget pair so
    # the trainer/mesh escalation reaches zero drops even when N is tiny
    # but the splats are enormous (post-opacity-reset fog sheets)
    base = max(N, 1024)
    wm = max(max_dup // 4 + work_mult, 1)
    W = base * wm
    R_buf = base * max(2, wm // 2)

    # Pack (tile, quantized depth) into ONE int32 sort key: depth order
    # only matters within a tile, where the quantization is far below any
    # visible reordering threshold.
    bits_tile = max(1, int(np.ceil(np.log2(n_tiles + 2))))
    db = 30 - bits_tile
    d = prep.depth
    dmin = jnp.min(jnp.where(valid, d, jnp.inf))
    dmax = jnp.max(jnp.where(valid, d, -jnp.inf))
    dq = jnp.clip((d - dmin) / jnp.maximum(dmax - dmin, 1e-9), 0.0, 1.0)
    # clamp as INTEGER: f32 cannot represent 2^db-1 exactly and rounds up,
    # which would leak the deepest splats into the next tile's key range.
    # Top quantile (2^db - 1) is reserved for the per-tile filler entries.
    dq = jnp.clip((dq * (1 << db)).astype(jnp.int32), 0, (1 << db) - 2)
    BIG = jnp.int32(n_tiles) * (1 << db)

    # --- level 1: splat -> (splat, tile-row) -------------------------------
    cumr = jnp.cumsum(ny)                          # [N] int32
    cumr_prev = cumr - ny
    rows_dropped = jnp.maximum(cumr[N - 1] - R_buf, 0)
    P1 = R_buf + N
    mk1 = 2 * jnp.minimum(cumr_prev, R_buf)
    sk1 = 2 * jnp.arange(R_buf, dtype=jnp.int32) + 1
    # single-array sort: equal marker keys are interchangeable (identity is
    # recovered from parity counts alone), so stability buys nothing and
    # is_stable=True makes XLA sort a hidden iota payload alongside
    # (measured: the stable [1.3M] merge costs 1.97 ms vs ~1.4 unstable)
    kA1 = jax.lax.sort(jnp.concatenate([mk1, sk1]), is_stable=False)
    is_m1 = (kA1 & 1) == 0
    s1 = jnp.cumsum(is_m1.astype(jnp.int32)) - 1     # [P1] splat id
    r1 = jnp.arange(P1, dtype=jnp.int32) - s1 - 1    # row slot id

    cols1 = [cumr_prev, ty0, tx0, nx, ny, dq]
    if conic_cull:
        c_cut = 2.0 * jnp.log(jnp.maximum(prep.opacity, 1e-12) / ALPHA_EPS)
        fcols1 = [prep.ell[:, 0], prep.ell[:, 1], prep.ell[:, 2],
                  prep.ell[:, 3], prep.ell[:, 4], cx, cy,
                  0.5 * c_cut]                       # filter-disc radius^2
        cols1 += [jax.lax.bitcast_convert_type(f.astype(jnp.float32),
                                               jnp.int32) for f in fcols1]
    tab1 = jnp.stack(cols1, axis=1)                  # [N, 13|14]
    g1 = tab1[jnp.clip(s1, 0, N - 1)]                # [P1, ...]
    rr = r1 - g1[:, 0]                               # row index in rect
    rowv = (~is_m1) & (rr >= 0) & (rr < g1[:, 4])
    ty = g1[:, 1] + rr                               # tile row
    tx0_r = g1[:, 2]
    nx_r = g1[:, 3]

    if conic_cull:
        fl1 = jax.lax.bitcast_convert_type(g1[:, 6:14], jnp.float32)
        eA, eB, eC, ccx, ccy, scx, scy, rd2 = [fl1[:, i] for i in range(8)]
        usable = (eA > 0) & (eC > 0)
        b0 = ty.astype(jnp.float32) * TILE           # pixel centers at ints
        b1 = b0 + float(TILE - 1)
        # ellipse x-extent over the band (dy relative to the conic center):
        # rightmost point of {A dx^2 + B dx dy + C dy^2 <= 1} is at
        # dx_m = 2 sqrt(C/D), dy_m = -B dx_m / (2C) with D = 4AC - B^2 > 0;
        # x+(dy) = (-B dy + sqrt(4A - D dy^2)) / (2A) is concave in dy, so
        # its max over [d0, d1] is at clamp(dy_m); symmetrically for x-.
        d0 = b0 - ccy
        d1 = b1 - ccy
        safeA = jnp.where(usable, eA, 1.0)
        safeC = jnp.where(usable, eC, 1.0)
        D4 = jnp.maximum(4.0 * eA * eC - eB * eB, 1e-20)
        dx_m = 2.0 * jnp.sqrt(jnp.maximum(eC, 0.0) / D4)
        dy_r = -eB * dx_m / (2.0 * safeC)
        dy_rc = jnp.clip(dy_r, d0, d1)
        dy_lc = jnp.clip(-dy_r, d0, d1)
        disc_r = 4.0 * eA - D4 * dy_rc * dy_rc
        disc_l = 4.0 * eA - D4 * dy_lc * dy_lc
        # band meets the ellipse iff the band dy nearest the center is
        # within the ellipse's y-extent (with relative margin)
        dy_near = jnp.clip(0.0, d0, d1)
        e_hit = usable & (D4 * dy_near * dy_near
                          <= 4.0 * eA * (1.0 + 2e-2) + 1e-6)
        xhi_e = ccx + (-eB * dy_rc + jnp.sqrt(jnp.maximum(disc_r, 0.0))) \
            / (2.0 * safeA)
        xlo_e = ccx + (-eB * dy_lc - jnp.sqrt(jnp.maximum(disc_l, 0.0))) \
            / (2.0 * safeA)
        # conservative widen: covers coefficient error (2e-2 relative on
        # footprint-sized extents) plus sub-pixel slop
        err_e = 2e-2 * (dx_m + jnp.abs(dy_rc) + jnp.abs(dy_lc)) + 0.51
        # filter disc x-extent over the band
        dmin_d = jnp.maximum(jnp.maximum(b0 - scy, scy - b1), 0.0)
        d_hit = dmin_d * dmin_d <= rd2 * (1.0 + 1e-5) + 1e-5
        hw = jnp.sqrt(jnp.maximum(rd2 - dmin_d * dmin_d, 0.0)) + 0.51
        BIGX = jnp.float32(1e9)
        xlo = jnp.minimum(jnp.where(e_hit, xlo_e - err_e, BIGX),
                          jnp.where(d_hit, scx - hw, BIGX))
        xhi = jnp.maximum(jnp.where(e_hit, xhi_e + err_e, -BIGX),
                          jnp.where(d_hit, scx + hw, -BIGX))
        # no usable ellipse -> keep the full rect row (rho3d unbounded)
        xlo = jnp.where(usable, xlo, -BIGX)
        xhi = jnp.where(usable, xhi, BIGX)
        inv_t = 1.0 / TILE
        cx0 = jnp.clip(jnp.floor(xlo * inv_t).astype(jnp.int32),
                       tx0_r, tx0_r + nx_r)
        cx1 = jnp.clip(jnp.floor(xhi * inv_t).astype(jnp.int32) + 1,
                       tx0_r, tx0_r + nx_r)
        cnt = jnp.where(rowv, jnp.maximum(cx1 - cx0, 0), 0)
    else:
        cx0 = tx0_r
        cnt = jnp.where(rowv, nx_r, 0)

    # --- level 2: (splat, tile-row) -> (splat, tile) -----------------------
    cum2 = jnp.cumsum(cnt)                           # [P1] int32
    cum2_prev = cum2 - cnt
    total2 = cum2[P1 - 1]
    # Weight each dropped row by the mean column count of surviving rows
    # (>= 1): counting a dropped row as a single pair under-reports drops
    # and delays the trainer's >1% escalation trigger on wide-footprint
    # (fog-sheet) scenes where rows carry many columns each.
    rows_used = jnp.maximum(jnp.minimum(cumr[N - 1], R_buf), 1)
    avg_cols = jnp.maximum(total2 // rows_used, 1)
    n_dropped = jnp.maximum(total2 - W, 0) + rows_dropped * avg_cols
    P2 = W + P1
    mk2 = 2 * jnp.minimum(cum2_prev, W)
    sk2 = 2 * jnp.arange(W, dtype=jnp.int32) + 1
    kA2 = jax.lax.sort(jnp.concatenate([mk2, sk2]), is_stable=False)
    is_m2 = (kA2 & 1) == 0
    s2 = jnp.cumsum(is_m2.astype(jnp.int32)) - 1     # [P2] row-slot id
    m2 = jnp.arange(P2, dtype=jnp.int32) - s2 - 1    # work slot id

    tile0 = ty * tiles_x + cx0
    sid_r = jnp.where(rowv, s1, N)
    # MEASURED NEGATIVE (round 5): pre-packing (tile0, dq) into one sort-
    # key-format column (4-col table) made the step SLOWER (14.37 -> 13.95
    # it/s): the [P2, 4] gather picked a T(4,128) tiling that gathers
    # worse than the 5-col T(8,128) one, and the pk0 where() split the
    # conic-cull fusion chain into ~4 ms of standalone [P1] fusions. Keep
    # the 5-col row layout.
    tab2 = jnp.stack([cum2_prev, tile0, cnt, g1[:, 5], sid_r], axis=1)
    g2 = tab2[jnp.clip(s2, 0, P1 - 1)]               # [P2, 5]
    jc = m2 - g2[:, 0]                               # column in the interval
    live = (~is_m2) & (jc >= 0) & (jc < g2[:, 2])
    tile = g2[:, 1] + jc

    packed = jnp.where(live, tile * (1 << db) + g2[:, 3], BIG)
    sidx = jnp.where(live, g2[:, 4], N)

    tids = jnp.arange(n_tiles, dtype=jnp.int32)
    filler_keys = jnp.repeat(tids, K) * (1 << db) + ((1 << db) - 1)
    keys_all = jnp.concatenate([packed, filler_keys])
    sidx_all = jnp.concatenate(
        [sidx, jnp.full((n_tiles * K,), N, jnp.int32)])
    if _GRAD_REDUCE == "segsum":
        # carry each entry's work slot through the sort (W = dummy) — the
        # segsum gradient reduction inverts it; the default scatter path
        # skips the third payload so its sort matches the pre-segsum
        # program exactly
        ws = jnp.where(live, m2, W)
        ws_all = jnp.concatenate(
            [ws, jnp.full((n_tiles * K,), W, jnp.int32)])
        keys_s, sidx_s, ws_s = jax.lax.sort((keys_all, sidx_all, ws_all),
                                            num_keys=1, is_stable=False)
        ws_s = ws_s[:W + n_tiles * K]
    else:
        # Unstable: ties are (tile, SAME quantized depth) pairs, whose
        # compositing order is already arbitrary relative to the dense
        # oracle's exact-depth order (the 2^db quantization merged them);
        # stability only pinned which arbitrary order, at the cost of a
        # hidden iota payload in the sort.
        keys_s, sidx_s = jax.lax.sort((keys_all, sidx_all), num_keys=1,
                                      is_stable=False)
        ws_s = None
    # The P1 level-2 marker rows all carry BIG keys and sort behind every
    # real entry (<= W of them) and every filler (n_tiles*K): slice them off
    # so the downstream gather/kernel/scatter sizes scale with W, not W+P1.
    keys_s = keys_s[:W + n_tiles * K]
    sidx_s = sidx_s[:W + n_tiles * K]

    # +K safety rows so the last tile's chunked DMA never runs off the array
    idx_k = jnp.where(keys_s >= BIG, N, sidx_s)
    padded_idx = jnp.concatenate([idx_k, jnp.full((K,), N, jnp.int32)])
    if ws_s is not None:
        ws_k = jnp.where(keys_s >= BIG, W, ws_s)
        ws_sorted = jnp.concatenate([ws_k, jnp.full((K,), W, jnp.int32)])
    else:
        ws_sorted = jnp.zeros((1,), jnp.int32)

    starts = jnp.searchsorted(keys_s, tids * (1 << db),
                              side="left").astype(jnp.int32)
    ends = jnp.searchsorted(keys_s, tids * (1 << db) + ((1 << db) - 1),
                            side="left").astype(jnp.int32)
    counts = ends - starts
    # Load-balanced stream packing: programs own 4 tiles of SIMILAR entry
    # count (sorted consecutive grouping), so the per-program step count
    # (max over its streams) stays close to the mean instead of the max of
    # a random spatial 2x2 block.
    order = jnp.argsort(-counts).astype(jnp.int32)
    return padded_idx, starts, counts, order, n_dropped, ws_sorted


# ---------------------------------------------------------------------------
# custom-VJP core
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(7, 8, 9, 10, 11))
def _raster_core(blob, padded_idx, inv_slots, seg_slots, starts, counts,
                 order, tiles_x, tiles_y, interpret, need_dist, need_med):
    """Kernel + fb->maps layout restore under ONE custom VJP: the layout
    map is a permutation, so its transpose is the inverse permutation
    (_maps_to_fb, a gather) rather than the scatter-add XLA's autodiff
    of _fb_to_maps would emit. Returns [CH, H_pad, W_pad] maps.

    `inv_slots` [W] (work slot -> sorted-entry row, dead slots -> the
    guaranteed-zero last padded row) and `seg_slots` [W] (work slot ->
    splat id, NON-DECREASING — see _binning) are backward-only inputs:
    they reorder the per-entry gradient rows to splat-major order so the
    per-splat reduction is a sorted segment sum (segsum_pallas) instead
    of an XLA scatter-add. Forward-only use DCEs them."""
    fb, ints, _ = _core_fwd_impl(blob, padded_idx, starts, counts, order,
                                 tiles_x, tiles_y, interpret)
    return _fb_to_maps(fb, order, tiles_x, tiles_y)


def _core_fwd_impl(blob, padded_idx, starts, counts, order, tiles_x,
                   tiles_y, interpret, init=None):
    n_groups = (tiles_x * tiles_y) // STREAMS
    pb = jnp.pad(blob, ((0, 0), (0, F_PAD - F)))
    if _GRAD_REDUCE == "compact":
        # embed each SPLAT's own id at ID_LANE of its [Np1, F_PAD] blob
        # row (exact-int f32): the entry gather below then replicates the
        # right id to every (splat, tile) entry for free — no [M_pad]-
        # scale select (at 1M splats that would be a 4 GB pass). The
        # kernels read only lanes [:F], so the lane is inert on the
        # forward path; dummy-row entries carry id Np1-1, which the
        # reduction zeroes by contract.
        lane = jax.lax.broadcasted_iota(jnp.int32, pb.shape, 1)
        ids = jnp.arange(pb.shape[0], dtype=jnp.float32)[:, None]
        pb = jnp.where(lane == ID_LANE, ids, pb)
    pblob = pb[padded_idx]                                       # [M_pad,F_PAD]
    kernel = _make_fwd_kernel(tiles_x, with_init=init is not None)
    in_specs = [pl.BlockSpec(memory_space=pltpu.HBM)]
    inputs = (pblob,)
    if init is not None:
        in_specs.append(pl.BlockSpec((1, 3, 8, 128),
                                     lambda t, *_: (t, 0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs = (pblob, init)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, CH, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, STREAMS, F_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2, STREAMS)),
        ],
    )
    fb, ints = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((n_groups, CH, 8, 128), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 2, 8, 128), jnp.int32),
        ),
        interpret=interpret,
    )(starts, counts, order, *inputs)
    return fb, ints, pblob


def _core_fwd(blob, padded_idx, inv_slots, seg_slots, starts, counts, order,
              tiles_x, tiles_y, interpret, need_dist, need_med):
    fb, ints, pblob = _core_fwd_impl(blob, padded_idx, starts, counts, order,
                                     tiles_x, tiles_y, interpret)
    maps = _fb_to_maps(fb, order, tiles_x, tiles_y)
    return maps, (blob.shape[0], padded_idx, inv_slots, seg_slots, starts,
                  counts, order, fb, ints, pblob)


def _grad_reduce(grad_padded, padded_idx, inv_slots, seg_slots, Np1,
                 interpret, starts=None, counts=None, order=None, ints=None):
    """Per-splat sums of the [M_pad, F_PAD] per-entry gradient rows.

    Three modes (GMT_GRAD_REDUCE):

    "compact" (default): scatter-add only the WALKED-PREFIX windows. The
    backward's reverse walk stops at each tile's last contributor
    (n_contrib from the forward), so it writes gradient rows only into
    the K-aligned prefix [starts[t], starts[t] + cdiv(needed_t, K)*K) of
    each tile's entry range — at the bench workload that is ~61k of
    ~780k sorted entries (GMT_BWD_COUNT measurement, BASELINE.md round
    5): ~92% of the full scatter's 15 ns/row cost is spent adding exact
    zeros. This mode reconstructs the per-tile window sizes from the
    SAME formula the kernel's out-DMA gates use (min(max n_contrib over
    the tile's pixels, counts[t])), expands the windows into a compact
    C-slot row list with the parity-merge rank-select (the binning
    primitive — sort + cumsum, no scatter), row-gathers the compact rows
    ([*,128] gathers are the fast regime), and scatter-adds C rows
    instead of M_pad. Row targets ride IN the rows at lane ID_LANE
    (written by the kernel from the id-embedded blob), so no 1-D
    padded_idx gather is needed. If the windows ever exceed the static
    cap C (a full-saturation scene), a lax.cond falls back to the full
    scatter — never a dropped gradient.

    "scatter": the reference-shaped full [M_pad] scatter-add.

    "segsum": reorder rows to work-slot (splat-major) order via the
    precomputed inverse permutation, embed ids at ID_LANE, then run the
    sorted-segment-sum MXU kernel (segsum_pallas) — the opt-in answer
    for the multi-million-splat regime where the scatter floor explodes
    superlinearly (BASELINE.md "Splat-count scaling")."""
    if _GRAD_REDUCE == "scatter":
        grad_blob = jnp.zeros((Np1, F), jnp.float32).at[padded_idx].add(
            grad_padded[:, :F], mode="drop")
        return grad_blob.at[Np1 - 1].set(0.0)
    if _GRAD_REDUCE == "compact":
        assert Np1 - 1 < 2 ** 24, (
            "compact grad reduce rides splat ids as exact-int f32 at "
            f"ID_LANE; N={Np1 - 1} exceeds the 2^24 exact-int range")
        M_pad = grad_padded.shape[0]
        n_gs = order.shape[0]                      # == n_tiles, (g,s) flat
        # Per-(group,stream) walked-entry count — the EXACT mirror of the
        # backward kernel's `needed`/`n_rel`: stream s owns sublanes
        # {s, s+4} of the [8,128] pixel block (see _stream_pixels).
        nc = ints[:, 0].reshape(-1, 2, STREAMS, 128)
        per_gs = jnp.max(nc, axis=(1, 3)).reshape(-1)   # [n_gs] int32
        counts_gs = counts[order]
        starts_gs = starts[order]
        needed = jnp.minimum(per_gs, counts_gs)
        kcnt = ((needed + K - 1) // K) * K         # rows out-DMA'd per tile
        cum = jnp.cumsum(kcnt)
        total = cum[n_gs - 1]
        cum_prev = cum - kcnt
        cap_env = os.environ.get("GMT_COMPACT_CAP")
        if cap_env:
            C = int(cap_env)
        else:
            # The walked-window total is bounded by IMAGE complexity, not
            # entry count: sum_t cdiv(min(max-n_contrib_t, counts_t),K)*K
            # ≈ n_tiles*K alignment padding + sum_t max-per-pixel
            # contributor depth. MEASURED (v5e bench scene, (16,4)
            # budget): 137 rows/tile at 100k splats, 334 at 1M — the
            # per-tile MAX statistic grows slowly with entry density, so
            # the default scales 160 rows/tile by (entries/tile / 430)
            # ^0.4 (calibrated on those two points: 160 at 100k, ~400 at
            # 1M, ~20% headroom at both). Overflow steps (e.g. right
            # after an opacity reset, when per-pixel lists deepen) take
            # the lax.cond full-scatter fallback — slower, never wrong.
            rpt_env = os.environ.get("GMT_COMPACT_ROWS_PER_TILE")
            if rpt_env:
                rpt = int(rpt_env)
            else:
                ept = M_pad / float(n_gs)
                rpt = int(160 * max(1.0, ept / 430.0) ** 0.4)
            C = min(M_pad, _round_up(n_gs * rpt, 512))

        def compact(gp):
            # parity-merge rank-select (see _binning): markers 2*cum_prev
            # (even, pre-sorted) + slot keys 2j+1; after the unstable sort
            # the owner of each slot position is cumsum(is_marker)-1.
            mk = 2 * jnp.minimum(cum_prev, C)
            sk = 2 * jnp.arange(C, dtype=jnp.int32) + 1
            kA = jax.lax.sort(jnp.concatenate([mk, sk]), is_stable=False)
            is_m = (kA & 1) == 0
            s = jnp.cumsum(is_m.astype(jnp.int32)) - 1
            m = jnp.arange(C + n_gs, dtype=jnp.int32) - s - 1
            tab = jnp.stack([cum_prev, starts_gs, kcnt], axis=1)
            g = tab[jnp.clip(s, 0, n_gs - 1)]      # [C+n_gs, 3] row gather
            jj = m - g[:, 0]
            live = (~is_m) & (jj >= 0) & (jj < g[:, 2])
            # dead positions gather the guaranteed-zero final safety row
            # (never written by any out-DMA, zero id lane -> adds 0 to
            # splat 0)
            row = jnp.where(live, g[:, 1] + jj, M_pad - 1)
            rows_c = gp[row]                       # [C+n_gs, 128]
            tgt = rows_c[:, ID_LANE].astype(jnp.int32)
            out = jnp.zeros((Np1, F), jnp.float32).at[tgt].add(
                rows_c[:, :F], mode="drop")
            return out.at[Np1 - 1].set(0.0)

        def full(gp):
            out = jnp.zeros((Np1, F), jnp.float32).at[padded_idx].add(
                gp[:, :F], mode="drop")
            return out.at[Np1 - 1].set(0.0)

        if C >= M_pad:
            return full(grad_padded)
        return jax.lax.cond(total <= C, compact, full, grad_padded)
    # Pre-pad the reorder indices so the kernel's chunk over-read windows
    # stay in bounds without a [W, 128] jnp.pad copy inside the segsum:
    # dummy slots gather the guaranteed-zero last padded row, with seg id
    # 2^30 (>= any padded segment block, so bounds exclude them).
    W = inv_slots.shape[0]
    M_pad = grad_padded.shape[0]
    pad_n = _round_up(W + SEG_CB + 16, 8) - W
    inv_p = jnp.concatenate(
        [inv_slots, jnp.full((pad_n,), M_pad - 1, jnp.int32)])
    seg_p = jnp.concatenate(
        [seg_slots, jnp.full((pad_n,), 2 ** 30, jnp.int32)])
    rows_sm = grad_padded[inv_p]
    # embed ids via a lane-select (fuses into the gather's consumer; a
    # .at[:, lane].set lowers to a dynamic-update-slice, ~2 ms standalone)
    lane = jax.lax.broadcasted_iota(jnp.int32, rows_sm.shape, 1)
    rows_sm = jnp.where(lane == ID_LANE,
                        seg_p[:, None].astype(jnp.float32), rows_sm)
    grad128 = segment_sum_sorted(rows_sm, seg_p, Np1 - 1,
                                 interpret=interpret, assume_padded=True)
    out = jnp.pad(grad128[:Np1 - 1, :F], ((0, 1), (0, 0)))
    if os.environ.get("GMT_SEGSUM_BARRIER", "1") != "0":
        # Layout-assignment firewall (measured, v5e, 100k bench): without
        # it the segsum program's custom-call/reorder chain poisons the
        # layouts of the UNRELATED per-splat SH/Adam chains ([N,15,3]
        # tensors pick {2,0,1} layouts + copies, ~+20 ms step-wide,
        # 14.26 -> 7.9 it/s). The barrier pins the reduced gradient to a
        # fresh canonical-layout value so downstream layout choices match
        # the scatter program's.
        out = jax.lax.optimization_barrier(out)
    return out


def _core_bwd(tiles_x, tiles_y, interpret, need_dist, need_med, res, ct_maps):
    (Np1, padded_idx, inv_slots, seg_slots, starts, counts, order, fb,
     ints, pblob) = res
    n_groups = (tiles_x * tiles_y) // STREAMS
    M_pad = pblob.shape[0]

    # Moment channels (M1/M2) carry no cotangent by contract (inference-only
    # outputs); convert the 11 differentiable channels through the inverse
    # permutation and zero-pad to the kernel's CH-channel ct layout.
    ct = _maps_to_fb(ct_maps[:11], order, tiles_x, tiles_y)
    ct = jnp.pad(ct, ((0, 0), (0, CH - 11), (0, 0), (0, 0)))

    kernel = _make_bwd_kernel(tiles_x, need_dist, need_med,
                              with_ids=_GRAD_REDUCE == "compact")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, CH, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
        scratch_shapes=[
            pltpu.VMEM((2, K, STREAMS, F_PAD), jnp.float32),
            pltpu.VMEM((2, K, STREAMS, F_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2, STREAMS)),
            pltpu.SemaphoreType.DMA((2, STREAMS)),
        ],
    )
    # The zeros input is aliased to the gradient output: rows belonging to
    # chunks the reverse walk never processes need no in-kernel zero-flush.
    gzero = jnp.zeros((M_pad, F_PAD), jnp.float32)
    grad_padded = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M_pad, F_PAD), jnp.float32),
        input_output_aliases={7: 0},
        interpret=interpret,
    )(starts, counts, order, pblob, fb, ints, ct, gzero)

    grad_blob = _grad_reduce(grad_padded, padded_idx, inv_slots, seg_slots,
                             Np1, interpret, starts=starts, counts=counts,
                             order=order, ints=ints)
    return grad_blob, None, None, None, None, None, None


_raster_core.defvjp(_core_fwd, _core_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(8, 9, 10, 11, 12))
def _raster_core_seeded(blob, init_fb, padded_idx, inv_slots, seg_slots,
                        starts, counts, order, tiles_x, tiles_y, interpret,
                        need_dist, need_med):
    """Seeded (init-state) raster core — the differentiable production path
    for Gaussian-sharded TRAINING: gradients flow to both the splat blob and
    the per-pixel (T0, M1_0, M2_0) seed, and the raw T/M1/M2 map outputs
    carry cotangents (they feed the cross-shard over-operator fold)."""
    fb, ints, _ = _core_fwd_impl(blob, padded_idx, starts, counts, order,
                                 tiles_x, tiles_y, interpret, init=init_fb)
    return _fb_to_maps(fb, order, tiles_x, tiles_y)


def _seeded_fwd(blob, init_fb, padded_idx, inv_slots, seg_slots, starts,
                counts, order, tiles_x, tiles_y, interpret, need_dist,
                need_med):
    fb, ints, pblob = _core_fwd_impl(blob, padded_idx, starts, counts, order,
                                     tiles_x, tiles_y, interpret, init=init_fb)
    maps = _fb_to_maps(fb, order, tiles_x, tiles_y)
    return maps, (blob.shape[0], padded_idx, inv_slots, seg_slots, starts,
                  counts, order, fb, ints, pblob, init_fb)


def _seeded_bwd(tiles_x, tiles_y, interpret, need_dist, need_med, res,
                ct_maps):
    (Np1, padded_idx, inv_slots, seg_slots, starts, counts, order, fb,
     ints, pblob, init_fb) = res
    n_groups = (tiles_x * tiles_y) // STREAMS
    M_pad = pblob.shape[0]

    # all CH channels carry cotangents here (incl. T/M1/M2 raw outputs)
    ct = _maps_to_fb(ct_maps, order, tiles_x, tiles_y)

    kernel = _make_bwd_kernel(tiles_x, need_dist, need_med, with_init=True,
                              with_ids=_GRAD_REDUCE == "compact")
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_groups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, CH, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, CH, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.HBM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.HBM),
            pl.BlockSpec((1, 3, 8, 128), lambda t, *_: (t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, K, STREAMS, F_PAD), jnp.float32),
            pltpu.VMEM((2, K, STREAMS, F_PAD), jnp.float32),
            pltpu.SemaphoreType.DMA((2, STREAMS)),
            pltpu.SemaphoreType.DMA((2, STREAMS)),
        ],
    )
    gzero = jnp.zeros((M_pad, F_PAD), jnp.float32)
    grad_padded, gi = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((M_pad, F_PAD), jnp.float32),
            jax.ShapeDtypeStruct((n_groups, 3, 8, 128), jnp.float32),
        ),
        input_output_aliases={8: 0},
        interpret=interpret,
    )(starts, counts, order, pblob, fb, ints, ct, init_fb, gzero)

    grad_blob = _grad_reduce(grad_padded, padded_idx, inv_slots, seg_slots,
                             Np1, interpret, starts=starts, counts=counts,
                             order=order, ints=ints)
    return grad_blob, gi, None, None, None, None, None, None


_raster_core_seeded.defvjp(_seeded_fwd, _seeded_bwd)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------

def _fb_to_maps(fb, order, tiles_x, tiles_y):
    """[n_groups, C, 8, 128] -> [C, H_pad, W_pad]: tile t lives in program
    rank(t)//4, sublane band rank(t)%4; band pixels p=(a*128+lane) map to
    (y_local = a*8 + lane//16, x_local = lane%16)."""
    n_tiles = tiles_x * tiles_y
    C = fb.shape[1]
    rank = jnp.argsort(order)                         # tile -> rank
    prog = rank // STREAMS
    band = rank % STREAMS
    # sublane = a*4 + band (stream band owns sublanes {band, band+4})
    fbb = fb.reshape(-1, C, 2, STREAMS, 8, TILE)      # prog,ch,a,band,b1,px
    # non-adjacent advanced indices put the tile axis first: [n,C,2,8,px]
    tile_blocks = fbb[prog, :, :, band]
    tb = tile_blocks.reshape(tiles_y, tiles_x, C, 2, 8, TILE)
    tb = jnp.transpose(tb, (2, 0, 3, 4, 1, 5))        # ch,ty,a,b1,tx,px
    return tb.reshape(C, tiles_y * TILE, tiles_x * TILE)


def _maps_to_fb(maps, order, tiles_x, tiles_y):
    """[C, H_pad, W_pad] -> [n_groups, C, 8, 128] in the kernel's
    group/stream layout — the exact inverse of _fb_to_maps."""
    C = maps.shape[0]
    tb = maps.reshape(C, tiles_y, 2, 8, tiles_x, TILE)
    # [C, ty, a, b1, tx, px] -> [ty, tx, C, a, (b1 px)=lane]
    per_tile = jnp.transpose(tb, (1, 4, 0, 2, 3, 5)).reshape(
        tiles_y * tiles_x, C, 2, 128)
    gathered = per_tile[order]                        # rank-ordered tiles
    g4 = gathered.reshape(-1, STREAMS, C, 2, 128)
    out = jnp.transpose(g4, (0, 2, 3, 1, 4))          # [g, C, a, band, lane]
    return out.reshape(-1, C, 8, 128)                 # sublane = a*4 + band


def rasterize_tiled(prep: Preprocessed, means2d, bg, width: int, height: int,
                    *, max_dup: int = 16, n_giants: int = 256,
                    giant_dup: int | None = None, work_mult: int = 3,
                    interpret: bool | None = None,
                    need_dist_grad: bool = True, need_med_grad: bool = True,
                    init_state: Dict[str, jnp.ndarray] | None = None,
                    return_raw: bool = False, conic_cull: bool = True
                    ) -> Dict[str, jnp.ndarray]:
    """`need_dist_grad`/`need_med_grad=False` compile a specialized backward
    that skips the distortion / median-depth gradient paths (valid whenever
    the loss never reads rend_dist / the median part of surf_depth, e.g. the
    default recipe's lambda_dist=0, depth_ratio=0 — BASELINE.md).

    `max_dup`/`work_mult` set the GLOBAL duplicate budget
    W = N*(max_dup//4 + work_mult) entry slots (see _binning — there is no
    per-splat cap; every splat keeps its full footprint rect while total
    wants fit W): late-training states whose splats have grown to cover
    smooth regions can want far more than the default 7N duplicates — the
    trainer grows the budget when `n_dropped` stays high, and inference
    paths pass a generous budget up front (the CUDA reference never
    truncates).

    `init_state` (flat [H*W] "T"/"M1"/"M2", same contract as
    rasterize_pixels) seeds the per-pixel compositing state so a depth-
    contiguous SEGMENT of a larger splat set composites exactly against
    global incoming transmittance/moments — the production-kernel path for
    Gaussian-sharded rendering AND training: the seeded core carries a
    custom VJP with gradients to both the splats and the seed, and its raw
    T/M1/M2 outputs are differentiable (they feed the cross-shard fold).
    `return_raw=True` adds the flat per-pixel final state (premultiplied
    color/normal, T, moments) matching rasterize_pixels' raw dict.
    GRADIENT CONTRACT for the raw moments: with init_state (the seeded
    core) raw M1/M2 carry full cotangents; WITHOUT init_state the fast
    un-seeded backward statically zeroes them (raw color/normal/depth/
    alpha/dist/T remain differentiable) — pass an identity seed
    ({"T": ones, "M1": zeros, "M2": zeros}) to differentiate through the
    raw moments, as render_gaussian_sharded's pass 1 does."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    gx_count = -(-width // GROUP)
    gy_count = -(-height // GROUP)
    tiles_x = 2 * gx_count
    tiles_y = 2 * gy_count
    half_wh = jnp.array([0.5 * width, 0.5 * height], jnp.float32)

    blob = _build_blob(prep, means2d, half_wh)
    (padded_idx, starts, counts, order, n_dropped,
     ws_sorted) = jax.lax.stop_gradient(
        _binning(prep, tiles_x, tiles_y, max_dup,
                 n_giants=n_giants, giant_dup=giant_dup,
                 work_mult=work_mult, conic_cull=conic_cull))

    # Backward-only reduction tables (forward-only use DCEs them): invert
    # the sorted-entry -> work-slot map so gradient rows can be reordered
    # to splat-major order, where the per-splat reduction is a SORTED
    # segment sum (see _grad_reduce / segsum_pallas). Inversion rides a
    # second (key, payload) sort — 2.5 ms vs 7.2 ms for the equivalent
    # 1-D scatter-set at the bench scale (bench_segsum.py). Dead slots
    # (dummy ws = W sorts last) land on filler/unwritten sorted positions,
    # whose gradient rows are zero by construction.
    # seg rides the same sort as a second payload: a separate
    # padded_idx[inv_slots] would be a 1-D [W] gather, which lowers
    # catastrophically on TPU (~17x a row gather — bench_binning_gather
    # variant D).
    w_slots = max(prep.depth.shape[0], 1024) * max(max_dup // 4 + work_mult, 1)
    M_pad = padded_idx.shape[0]
    if _GRAD_REDUCE == "segsum":
        _, inv_full, seg_full = jax.lax.sort(
            (ws_sorted, jnp.arange(M_pad, dtype=jnp.int32), padded_idx),
            num_keys=1)
        inv_slots = inv_full[:w_slots]
        seg_slots = seg_full[:w_slots]
    else:
        # keep the custom-VJP arity; unused by the scatter reduction
        inv_slots = jnp.zeros((1,), jnp.int32)
        seg_slots = jnp.zeros((1,), jnp.int32)

    if init_state is None:
        maps = _raster_core(blob, padded_idx, inv_slots, seg_slots, starts,
                            counts, order, tiles_x, tiles_y, interpret,
                            need_dist_grad, need_med_grad)
    else:
        H_pad, W_pad = tiles_y * TILE, tiles_x * TILE

        def pad_map(x, fill):
            m = jnp.asarray(x).reshape(1, height, width)
            return jnp.pad(m, ((0, 0), (0, H_pad - height),
                               (0, W_pad - width)), constant_values=fill)

        init_maps = jnp.concatenate([
            pad_map(init_state["T"], 1.0),
            pad_map(init_state.get("M1", jnp.zeros(height * width)), 0.0),
            pad_map(init_state.get("M2", jnp.zeros(height * width)), 0.0),
        ], axis=0)
        init_fb = _maps_to_fb(init_maps, order, tiles_x, tiles_y)
        maps = _raster_core_seeded(blob, init_fb, padded_idx, inv_slots,
                                   seg_slots, starts, counts, order, tiles_x,
                                   tiles_y, interpret, need_dist_grad,
                                   need_med_grad)
    maps = maps[:, :height, :width]

    image = maps[0:3] + maps[10][None] * bg[:, None, None]
    allmap = jnp.stack([maps[3], maps[4], maps[5], maps[6], maps[7],
                        maps[8], maps[9]], axis=0)
    out = {"image": image, "allmap": allmap,
           "n_dropped": jax.lax.stop_gradient(n_dropped)}
    if return_raw:
        flat = lambda i: maps[i].reshape(-1)
        out["raw"] = {
            "color": maps[0:3].reshape(3, -1),
            "normal": maps[5:8].reshape(3, -1),
            "depth": flat(3), "alpha": flat(4), "median": flat(8),
            "dist": flat(9), "T": flat(10), "M1": flat(11), "M2": flat(12),
            # discrete termination-reconstruction signal (sharded fold);
            # not differentiable by contract
            "min_test": jax.lax.stop_gradient(flat(13)),
        }
    return out


def available() -> bool:
    return True
