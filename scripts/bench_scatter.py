"""Micro-benchmark: candidates for the backward's [M, F] per-splat gradient
reduction (grad_blob = zeros[N+1, F].at[padded_idx].add(rows[:, :F])) at the
north-star shapes (N=100k splats, W=14N work slots -> M_pad ~ 1.52M rows).

Timing methodology: the op runs inside a jitted fori_loop whose carry feeds
the next iteration (outputs chained), so the axon tunnel cannot pipeline or
elide dispatches; wall time / iters is the device time.

Usage: python scripts/bench_scatter.py [--iters 20]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--n", type=int, default=100_096)
    ap.add_argument("--mult", type=int, default=14)  # W = mult*N
    args = ap.parse_args()
    it = args.iters

    import jax
    import jax.numpy as jnp
    from gaussmart_tpu.runtime import setup
    setup()

    N = args.n
    W = args.mult * N
    n_tiles = 49 * 37
    K = 64
    M = W + n_tiles * K + K
    F = 20
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, N, size=M, dtype=np.int32))
    ids_sorted = jnp.sort(ids)
    perm = jnp.asarray(rng.permutation(M).astype(np.int32))
    rows128 = jnp.asarray(rng.random((M, 128), np.float32))
    rows20 = jnp.asarray(rng.random((M, F), np.float32))

    def timed(op, payload, label, idx=None):
        """op: (f32 array[, idx]) -> f32 array; chained via scalar leak.
        `idx` rides as a jit ARGUMENT (closing over a multi-MB device array
        bakes it into the HLO as a constant, which the axon remote-compile
        endpoint rejects with HTTP 413)."""
        if idx is None:
            def body(i, carry):
                return op(payload + carry.reshape(-1)[0] * 1e-30)
            fn = jax.jit(lambda p: jax.lax.fori_loop(0, it, body, op(p)))
            fargs = (payload,)
        else:
            def body(i, carry):
                return op(payload + carry.reshape(-1)[0] * 1e-30, idx)
            fn = jax.jit(
                lambda p, ix: jax.lax.fori_loop(0, it, body, op(p, ix)))
            fargs = (payload, idx)
        out = fn(*fargs)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*fargs))
        dt = (time.perf_counter() - t0) / it * 1e3
        print(f"  {dt:8.2f} ms  {label}", flush=True)
        return dt

    print(f"M={M} N={N} (W={W})")

    timed(lambda r, ix: jnp.zeros((N + 1, F), jnp.float32).at[ix].add(
        r[:, :F], mode="drop"), rows128,
        "scatter-add [M,20] from [M,128] slice (current)", idx=ids)
    timed(lambda r, ix: jnp.zeros((N + 1, F), jnp.float32).at[ix].add(
        r, mode="drop"), rows20, "scatter-add [M,20] native rows", idx=ids)
    timed(lambda r, ix: jnp.zeros((N + 1, 128), jnp.float32).at[ix].add(
        r, mode="drop")[:, :F], rows128,
        "scatter-add [M,128] then slice", idx=ids)
    timed(lambda r, ix: jnp.zeros((N + 1, F), jnp.float32).at[ix].add(
        r[:, :F], mode="drop", indices_are_sorted=True), rows128,
        "scatter-add sorted ids [M,20]", idx=ids_sorted)

    timed(lambda r, ix: r[ix], rows128, "row gather [M,128]", idx=perm)


if __name__ == "__main__":
    main()
