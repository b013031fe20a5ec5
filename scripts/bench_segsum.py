"""Micro-benchmark: gradient-reduction variants at the bench-scene scale.

Compares the current XLA [M,20] scatter-add against the Pallas
sorted-segment-sum replacement chain (inverse-permutation scatter-set +
[M,128] row gather + MXU one-hot segment sum), component by component and
end to end. Sizes mirror bench.py's (16,4) budget: N=100k splats,
W=8N work slots, M = W + fillers.
"""
from __future__ import annotations
import argparse, os, sys, time
import numpy as np
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=100_096)
    ap.add_argument("--wmult", type=int, default=8)
    ap.add_argument("--fillers", type=int, default=116_032)  # 1813 tiles * 64
    args = ap.parse_args()
    it = args.iters
    import jax, jax.numpy as jnp
    from gaussmart_tpu.runtime import setup
    setup()
    from gaussmart_tpu.render.segsum_pallas import (ID_LANE,
                                                    segment_sum_sorted)

    N = args.n
    W = args.wmult * N
    M = W + args.fillers + 64
    F = 20
    rng = np.random.default_rng(0)

    # realistic slot structure: ~W true pairs distributed over N splats
    # (clipped geometric-ish counts), slots assigned splat-major
    cnt = np.minimum(rng.poisson(args.wmult - 1, N) + 1, 64).astype(np.int64)
    cum = np.cumsum(cnt)
    scale = min(1.0, (W - 1) / cum[-1])
    cum = (cum * scale).astype(np.int32)
    cnt = np.diff(np.concatenate([[0], cum]))
    seg_ids = np.repeat(np.arange(N, dtype=np.int32), cnt)
    n_used = seg_ids.size
    seg_ids = np.concatenate(
        [seg_ids, np.full(W - n_used, N, np.int32)])        # [W]
    # sorted-entry order: a random permutation of the live slots, fillers at
    # the back (tile-sorted order is arbitrary w.r.t. splat id)
    perm = rng.permutation(n_used).astype(np.int32)
    # ws_sorted[pos] = slot for the first n_used sorted positions, dummy = W
    ws_sorted = np.full(M, W, np.int32)
    ws_sorted[np.arange(n_used)] = perm
    ids_of_sorted = np.full(M, N, np.int32)
    ids_of_sorted[:n_used] = seg_ids[ws_sorted[:n_used]]

    rows128 = rng.standard_normal((M, 128), np.float32) * 0.01
    rows128[n_used:] = 0.0
    rows128[:, F:] = 0.0

    j_rows = jnp.asarray(rows128)
    j_ids_sorted = jnp.asarray(ids_of_sorted)               # per sorted row
    j_ws = jnp.asarray(ws_sorted)
    j_seg = jnp.asarray(seg_ids)

    def timed(op, label, *arrs):
        """op: (scalar bias, *arrays) -> output array; the bias is added to
        the op's OPERANDS (fuses into the producing op, no extra full-array
        pass) and each iteration's bias comes from the previous OUTPUT, so
        the chain serializes and nothing dead-code-eliminates. Returning
        the full array (not a reduction) stops XLA from algebraically
        simplifying scatters/gathers that only feed a sum. Arrays ride as
        jit ARGUMENTS (closed-over device arrays bake into the HLO as
        constants and the axon remote-compile endpoint rejects them with
        HTTP 413). Warmup and timed calls use different bias values: the
        tunnel deduplicates identical dispatches (reports ~0 ms)."""
        def body(i, carry, *a):
            return op(carry.reshape(-1)[0].astype(jnp.float32) * 1e-30, *a)
        fnj = jax.jit(lambda s, *a: jax.lax.fori_loop(
            0, it, lambda i, c: body(i, c, *a), op(s, *a)))
        # sync via a scalar HOST FETCH: through the axon tunnel,
        # block_until_ready resolves before remote execution completes
        # (measured: a 12 ms scatter loop "finishes" in 0.05 ms); a data
        # read cannot lie
        float(fnj(jnp.float32(0), *arrs).reshape(-1)[0])
        t0 = time.perf_counter()
        float(fnj(jnp.float32(1e-25), *arrs).reshape(-1)[0])
        dt = (time.perf_counter() - t0) / it * 1e3
        print(f"  {dt:8.2f} ms  {label}", flush=True)
        return dt

    print(f"M={M} W={W} N={N} used={n_used}")

    # baseline: the current scatter-add
    timed(lambda b, r, ix: jnp.zeros((N + 1, F), jnp.float32)
          .at[ix].add(r[:, :F] + b, mode="drop"),
          "scatter-add [M,20] (current)", j_rows, j_ids_sorted)

    # component 1: inverse-permutation scatter-set [M] -> [W] (int chain:
    # bias folded through minimum() so it cannot constant-fold away)
    timed(lambda b, ws: jnp.full((W,), M - 1, jnp.int32)
          .at[ws].set(jnp.arange(M, dtype=jnp.int32)
                      + jnp.minimum(b.astype(jnp.int32), 0), mode="drop")
          .astype(jnp.float32),
          "inv scatter-set [M]->[W] int32", j_ws)

    inv = jnp.full((W,), M - 1, jnp.int32).at[j_ws].set(
        jnp.arange(M, dtype=jnp.int32), mode="drop")
    inv = jax.device_put(inv)

    # component 2: [W,128] row gather (bias fuses into the gather output)
    timed(lambda b, r, ix: r[ix] + b, "row gather [W,128]", j_rows, inv)

    # component 3: pallas segsum on pre-ordered rows (ids at lane 20);
    # the +b costs one extra [W,128] pass, so this row reads ~1 ms high
    rows_sm_np = rows128[:W].copy()
    rows_sm_np[:n_used, ID_LANE] = seg_ids[:n_used].astype(np.float32)
    rows_sm = jnp.asarray(rows_sm_np)
    # (+b is exact on the integer id lane: 1e-30 << f32 eps at id >= 1)
    timed(lambda b, r, s: segment_sum_sorted(r + b, s, N),
          "pallas segsum [W,128] by sorted ids (+1 copy pass)",
          rows_sm, j_seg)

    # component 1b: inv via a second sort (key=slot, payload=position)
    timed(lambda b, ws: jax.lax.sort(
        (ws + jnp.minimum(b.astype(jnp.int32), 0),
         jnp.arange(M, dtype=jnp.int32)), num_keys=1)[1][:W].astype(
             jnp.float32),
          "inv via sort (ws, iota) -> positions[:W]", j_ws)

    # end-to-end replacement chain
    def chain(b, r, ix, s):
        rows = r[ix] + b
        rows = rows.at[:, ID_LANE].set(s.astype(jnp.float32))
        return segment_sum_sorted(rows, s, N)
    timed(chain, "chain: gather + id-embed + segsum (inv precomputed)",
          j_rows, inv, j_seg)

    # numeric check vs the scatter
    a = np.asarray(jnp.zeros((N + 1, F), jnp.float32)
                   .at[j_ids_sorted].add(j_rows[:, :F], mode="drop"))[:N]
    b_out = np.asarray(chain(jnp.float32(0), j_rows, inv, j_seg))[:N, :F]
    err = np.abs(a - b_out).max()
    print(f"check: max|scatter - chain| = {err:.3e} "
          f"ok={err < 1e-4}")


if __name__ == "__main__":
    main()
