"""Sorted segment-sum Pallas kernel — the gradient-reduction fast path.

Replaces the backward's [M, F] per-splat scatter-add (reference N1's
atomicAdd gradient accumulation, diff-surfel-rasterization
cuda_rasterizer/backward.cu — the CUDA kernel accumulates per-Gaussian
gradients with atomics; TPUs have no usable HBM atomics, and the XLA
scatter-add lowering costs ~15 ns/row at 100k targets, 25% of the train
step at the honest budget; BASELINE.md "Known-bad").

The TPU-native shape of the problem: `_binning`'s level-2 parity merge
assigns work slots to splats in cumsum (splat-major) order, so the map
slot -> splat id is NON-DECREASING by construction. Reordering the
per-entry gradient rows from sorted-entry order to work-slot order (the
inverse permutation from one extra (key, payload) sort — 2.5 ms vs
7.2 ms for the equivalent 1-D scatter-set — plus one [M, 128] row
gather; row gathers at 128 lanes are the fast regime, vs the
catastrophic [M, 20] shapes) turns the reduction into a SORTED segment
sum, which this kernel computes by streaming row chunks and contracting
them against a one-hot segment-selection matrix on the MXU:

    out[base + i, :] = sum_j [id(rows[j]) == base + i] * rows[j, :]

i.e. per 128-segment output block, per CB-row input chunk:
    sel[j, i] = (id(rows[j]) == base + i)     # (CB, OB) VPU compare
    out      += sel^T @ chunk                 # MXU, contract over rows

The selection matmul does the "scatter" as dense compute: 2 MXU passes
per 256 rows instead of 256 serialized RMW updates. Chunk windows come
from a searchsorted bounds table (scalar prefetch); chunks freely
over-read rows of neighboring segments — the one-hot mask zeroes them,
so no tail/boundary special cases exist.

Ids ride IN the rows at lane `ID_LANE` (as exact-integer f32): Mosaic
cannot DMA non-128-aligned lane slices from HBM, so a separate [M, 1]
id stream is not deliverable — but a width-1 lane slice of a chunk
already resident in VMEM is. Rows whose id lane is stale (e.g. zero
rows the producer never wrote) are harmless as long as they are
all-zero: they contract to zero wherever the mask puts them.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

OB = 128     # output segments per grid step
CB = 512     # rows per streamed chunk
LANES = 128
ID_LANE = 20  # lane of each row carrying its segment id (exact-int f32)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def _kernel(bounds_ref, rows_ref, out_ref, chunk, sems):
    o = pl.program_id(0)
    base = o * OB
    rs0 = bounds_ref[o]
    re = bounds_ref[o + 1]
    # sublane-align the window start; the extra rows belong to segments
    # < base and are masked off by the one-hot compare
    rs = (rs0 // 8) * 8
    nch = pl.cdiv(re - rs, CB)

    def dma_at(slot, start):
        return pltpu.make_async_copy(
            rows_ref.at[pl.ds(start, CB), :], chunk.at[slot],
            sems.at[slot])

    def dma(slot, c):
        return dma_at(slot, rs + c * CB)

    # Cross-block software pipeline: slots 2/3 ping-pong across grid steps
    # — block o's chunk 0 lives in slot 2 + o%2, DMA'd by the PREVIOUS
    # step (the per-block fixed cost is otherwise one exposed DMA latency
    # x n_blocks — measured ~4 ms of a ~6 ms kernel). Each step prefetches
    # its successor's chunk 0 into the OTHER cross slot before processing
    # its own chunks; block 0 starts its own.
    my_cross = 2 + jax.lax.rem(o, 2)

    def slot_of(c):
        return jnp.where(c == 0, my_cross, jax.lax.rem(c, 2))

    # Guard the self-start exactly like the successor prefetch: an empty
    # block 0 (re == rs) must not start a DMA it will never wait on — the
    # orphaned completion on slot 2 would desynchronize the slot-2/3
    # cross-block ping-pong for every later even block.
    @pl.when((o == 0) & (re > rs))
    def _():
        dma(2, 0).start()

    @pl.when(o + 1 < pl.num_programs(0))
    def _():
        nrs = (bounds_ref[o + 1] // 8) * 8
        nre = bounds_ref[o + 2]
        @pl.when(nre > nrs)
        def _():
            dma_at(2 + jax.lax.rem(o + 1, 2), nrs).start()

    out_ref[...] = jnp.zeros((OB, LANES), jnp.float32)

    @pl.when(nch > 1)
    def _():
        dma(1, 1).start()

    def body(c, carry):
        slot = slot_of(c)

        @pl.when((c + 1 < nch) & (c > 0))
        def _():
            dma(jax.lax.rem(c + 1, 2), c + 1).start()

        dma(slot, c).wait()

        rows_c = chunk[slot]                                # (CB, LANES)
        # build sel in (OB, CB) orientation so the MXU dot is the standard
        # (OB,CB)@(CB,LANES) contraction: transpose the tiny (CB,1) id
        # column instead of a (CB,OB) one-hot (a transposed-lhs dot_general
        # makes Mosaic relayout the full selection matrix every chunk)
        ids_row = jnp.transpose(
            rows_c[:, ID_LANE:ID_LANE + 1].astype(jnp.int32))   # (1, CB)
        ids_b = jnp.broadcast_to(ids_row, (OB, CB))
        row = jax.lax.broadcasted_iota(jnp.int32, (OB, CB), 0) + base
        sel = (ids_b == row)
        partial = jax.lax.dot_general(
            sel.astype(jnp.float32), rows_c,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)             # (OB, LANES)
        out_ref[...] += partial
        return carry

    jax.lax.fori_loop(0, nch, body, 0)


@functools.partial(jax.jit, static_argnames=("n_segments", "interpret",
                                              "assume_padded"))
def segment_sum_sorted(rows, seg_ids, n_segments: int, *,
                       interpret: bool = False, assume_padded: bool = False):
    """Per-segment sums of `rows` grouped by NON-DECREASING `seg_ids`.

    rows:    [M, 128] float32. Lane ID_LANE of each NON-ZERO row must hold
             its segment id as an exact-integer float32 (ids < 2^24);
             all-zero rows may carry any id lane (they contribute nothing).
             Note the id lane itself is summed like any other lane — the
             output's ID_LANE column is id*count garbage by design; callers
             consume lanes [:F] with F <= ID_LANE.
    seg_ids: [M] int32, non-decreasing, matching the id lanes of the
             non-zero rows; ids >= n_segments are trailing dummies.
    Returns [round_up(n_segments, 128), 128] float32. Segments >=
    n_segments in the padded tail are zero only if dummy rows are zero.
    """
    M = rows.shape[0]
    assert rows.shape[1] == LANES and seg_ids.shape == (M,)
    # ids ride in-row as exact-integer f32: above 2^24 the id lane can no
    # longer represent every integer and segment assignment silently
    # corrupts — fail loudly instead.
    assert n_segments < 2 ** 24, (
        f"segment ids ride as exact-integer float32; n_segments="
        f"{n_segments} exceeds the 2^24 exact-int range")
    n_pad = _round_up(max(n_segments, 1), OB)
    n_blocks = n_pad // OB

    # chunk windows may over-read up to CB + 8 rows past a block's bounds.
    # `assume_padded=True` promises the caller already appended >= CB + 16
    # trailing rows whose seg_ids are >= n_pad (so bounds stay clear of
    # them) — skipping the jnp.pad saves a full [M, 128] copy (~1 ms at
    # the bench scale).
    if assume_padded:
        assert M % 8 == 0
        rows_p = rows
    else:
        M_pad = _round_up(M, 8) + CB + 8
        rows_p = jnp.pad(rows, ((0, M_pad - M), (0, 0)))

    edges = (jnp.arange(n_blocks + 1, dtype=jnp.int32) * OB)
    bounds = jnp.searchsorted(seg_ids, edges, side="left").astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_blocks,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((OB, LANES), lambda o, *_: (o, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((4, CB, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, LANES), jnp.float32),
        interpret=interpret,
    )(bounds, rows_p)
