"""Dense 2DGS surfel compositor in pure XLA.

Replicates the per-pixel behavior of the CUDA `renderCUDA` stage of
diff-surfel-rasterization (reference N1, SURVEY.md §2.2): exact ray-splat
plane intersection, screen-space low-pass, front-to-back alpha compositing
with early termination, and the 7-channel aux map (expected depth, alpha,
view-space normal, median depth, depth distortion).

TPU-first architecture (not a translation): instead of per-tile splat lists
with dynamic lengths, splats are globally depth-sorted once (XLA sort) and
composited in fixed-size chunks with a nested `lax.scan`. The inner chunk is
fully vectorized over pixels — per-chunk color accumulation is a [K,P]x[K,3]
matmul that lands on the MXU. Sequential compositing within a chunk is
re-expressed with exclusive cumulative products/sums, which is associative
and therefore exact. Memory under reverse-mode AD is bounded by sqrt
checkpointing: the outer scan stores its carries, the inner scan is remat'd.

Gradients flow to every input by ordinary autodiff; the screen-space
densification gradient uses the `means2d` side channel (zeros at input, same
trick as gaussian_renderer/__init__.py:26-31) scaled by (0.5*W, 0.5*H) to
match the CUDA `ddelx_dx = 0.5*W` convention consumed by the densifier
threshold (train.py:203, gaussian_model.py:551-553).
"""
from __future__ import annotations

import functools
from typing import Dict

import jax
import jax.numpy as jnp

from gaussmart_tpu.render.raster_common import (
    ALPHA_EPS, ALPHA_MAX, FILTER_INV_SQUARE, NEAR_PLANE, T_EPS,
    Preprocessed, mapped_depth)


def _exclusive_cumprod(x, axis=0):
    cp = jnp.cumprod(x, axis=axis)
    ones = jnp.ones_like(jax.lax.slice_in_dim(cp, 0, 1, axis=axis))
    return jnp.concatenate(
        [ones, jax.lax.slice_in_dim(cp, 0, x.shape[axis] - 1, axis=axis)], axis=axis)


def _exclusive_cumsum(x, axis=0):
    zeros = jnp.zeros_like(jax.lax.slice_in_dim(x, 0, 1, axis=axis))
    return jnp.concatenate(
        [zeros,
         jax.lax.slice_in_dim(jnp.cumsum(x, axis=axis), 0, x.shape[axis] - 1, axis=axis)],
        axis=axis)


def _chunk_body(carry: Dict[str, jnp.ndarray], chunk: Dict[str, jnp.ndarray],
                px: jnp.ndarray, py: jnp.ndarray, half_wh: jnp.ndarray):
    """Composite one chunk of K depth-sorted splats over all P pixels.

    Includes the CUDA spatial cut (rasterize_points.cu getRect): a splat
    composites only into pixels of 16x16 tiles inside its binned footprint
    rect. This is NOT redundant with the alpha >= ALPHA_EPS skip: the rect
    is clamped to the reference's ceil(3*sigma) radius square, while the
    alpha cut reaches sqrt(2*ln(255*o)) sigma — up to 3.33*sigma for opaque
    splats — so the annulus between them has alpha >= eps pixels the CUDA
    kernel (and therefore the Pallas path, which bins the same rect) never
    composites. Same f32 arithmetic as raster_pallas._binning so dense and
    tiled outputs agree bit-for-bit on the pair set."""
    T9 = chunk["T"]              # [K,9] row-major splat->pixel transform
    K = T9.shape[0]
    # Columns of the 3x3 T: Tu (x coeffs), Tv (y coeffs), Tw (depth coeffs).
    Tu = T9[:, 0::3]             # [K,3]
    Tv = T9[:, 1::3]
    Tw = T9[:, 2::3]

    shift = chunk["means2d"] * half_wh[None, :]          # [K,2] px units
    px_eff = px[None, :] - shift[:, 0:1]                 # [K,P]
    py_eff = py[None, :] - shift[:, 1:2]

    # Ray-splat intersection: planes k = px*Tw - Tu, l = py*Tw - Tv;
    # intersection point (u,v) from p = k x l.
    kx = px_eff * Tw[:, 0:1] - Tu[:, 0:1]
    ky = px_eff * Tw[:, 1:2] - Tu[:, 1:2]
    kz = px_eff * Tw[:, 2:3] - Tu[:, 2:3]
    lx = py_eff * Tw[:, 0:1] - Tv[:, 0:1]
    ly = py_eff * Tw[:, 1:2] - Tv[:, 1:2]
    lz = py_eff * Tw[:, 2:3] - Tv[:, 2:3]
    p_x = ky * lz - kz * ly
    p_y = kz * lx - kx * lz
    p_z = kx * ly - ky * lx
    degenerate = jnp.abs(p_z) < 1e-12
    inv_pz = jnp.where(degenerate, 0.0, 1.0 / jnp.where(degenerate, 1.0, p_z))
    su = p_x * inv_pz
    sv = p_y * inv_pz
    rho3d = jnp.where(degenerate, jnp.inf, su * su + sv * sv)
    depth3d = su * Tw[:, 0:1] + sv * Tw[:, 1:2] + Tw[:, 2:3]

    # Screen-space low-pass (sigma^2 = 0.5px) around the projected center.
    dx = chunk["center"][:, 0:1] - px_eff
    dy = chunk["center"][:, 1:2] - py_eff
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)

    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = jnp.where(use3d, depth3d, Tw[:, 2:3])

    # tile-rect membership (binning mirror: tx0 = floor((cx-rx)/16),
    # tx1 = floor((cx+rx)/16)+1, pairs exist only for valid & rx,ry > 0)
    TILE = 16.0
    cx_c = chunk["center"][:, 0:1]
    cy_c = chunk["center"][:, 1:2]
    rxk = chunk["rx"][:, None]
    ryk = chunk["ry"][:, None]
    tpx = jnp.floor(px * (1.0 / TILE))[None, :]
    tpy = jnp.floor(py * (1.0 / TILE))[None, :]
    in_rect = ((rxk > 0) & (ryk > 0)
               & (tpx >= jnp.floor((cx_c - rxk) / TILE))
               & (tpx <= jnp.floor((cx_c + rxk) / TILE))
               & (tpy >= jnp.floor((cy_c - ryk) / TILE))
               & (tpy <= jnp.floor((cy_c + ryk) / TILE)))

    alpha = jnp.minimum(ALPHA_MAX, chunk["opacity"][:, None] * jnp.exp(-0.5 * rho))
    alpha = jnp.where((alpha >= ALPHA_EPS) & (depth >= NEAR_PLANE) & in_rect,
                      alpha, 0.0)

    # Front-to-back transmittance with the CUDA early-termination rule:
    # the splat that would push T below T_EPS is itself excluded.
    T_before = carry["T"][None, :] * _exclusive_cumprod(1.0 - alpha, axis=0)
    test_T = T_before * (1.0 - alpha)
    bad = ((test_T < T_EPS) & (alpha > 0)) | carry["done"][None, :]
    excluded = jnp.cumsum(bad.astype(jnp.float32), axis=0) >= 1.0
    include = jnp.logical_not(excluded)
    w = jnp.where(include, alpha * T_before, 0.0)       # [K,P]

    # Accumulations. The [K,P]x[K,C] contractions are MXU matmuls.
    feats = jnp.concatenate([
        chunk["color"],                                  # 3
        chunk["normal"],                                 # 3
    ], axis=1)                                           # [K,6]
    acc = jnp.einsum("kp,kc->cp", w, feats,
                     preferred_element_type=jnp.float32)
    color_add = acc[0:3]
    normal_add = acc[3:6]
    dsafe = jnp.where(w > 0, depth, 1.0)
    depth_add = jnp.sum(w * dsafe, axis=0)
    alpha_add = jnp.sum(w, axis=0)

    # Depth distortion integral (CUDA: m in remapped [near,far] space).
    m = jnp.where(w > 0, mapped_depth(dsafe), 0.0)
    mw = m * w
    m2w = m * mw
    A_before = 1.0 - T_before
    M1_before = carry["M1"][None, :] + _exclusive_cumsum(mw, axis=0)
    M2_before = carry["M2"][None, :] + _exclusive_cumsum(m2w, axis=0)
    dist_add = jnp.sum((m * m * A_before + M2_before - 2.0 * m * M1_before) * w, axis=0)

    # Median depth: depth of the last included splat with T_before > 0.5.
    med_mask = (w > 0) & (T_before > 0.5)
    kid = jnp.arange(K, dtype=jnp.int32)[:, None]
    last = jnp.max(jnp.where(med_mask, kid, -1), axis=0)          # [P]
    med_depth = jnp.take_along_axis(
        depth, jnp.maximum(last, 0)[None, :], axis=0)[0]
    median = jnp.where(last >= 0, med_depth, carry["median"])

    # Transmittance carry: stop exactly at the first early-termination hit.
    any_bad = jnp.max(bad, axis=0)
    first = jnp.argmax(bad, axis=0)                               # [P]
    T_at_cut = jnp.take_along_axis(T_before, first[None, :], axis=0)[0]
    T_full = carry["T"] * jnp.prod(1.0 - alpha, axis=0)
    new_T = jnp.where(any_bad, T_at_cut, T_full)

    # min test transmittance over CONSIDERED entries (incl. the terminating
    # one, which T never records): lets the Gaussian-sharded fold
    # reconstruct the sticky `done` exactly across strata.
    prior_bad = (jnp.cumsum(bad.astype(jnp.int32), axis=0)
                 - bad.astype(jnp.int32)) >= 1
    considered = (alpha > 0) & ~prior_bad & ~carry["done"][None, :]
    mt_chunk = jnp.min(jnp.where(considered, test_T, 2.0), axis=0)

    new_carry = {
        "T": new_T,
        "min_test": jnp.minimum(carry["min_test"], mt_chunk),
        "done": carry["done"] | jnp.max(bad, axis=0),
        "color": carry["color"] + color_add,
        "normal": carry["normal"] + normal_add,
        "depth": carry["depth"] + depth_add,
        "alpha": carry["alpha"] + alpha_add,
        "M1": carry["M1"] + jnp.sum(mw, axis=0),
        "M2": carry["M2"] + jnp.sum(m2w, axis=0),
        "dist": carry["dist"] + dist_add,
        "median": median,
    }
    return new_carry, None


def rasterize_pixels(
    prep: Preprocessed,
    means2d: jnp.ndarray,         # [N,2] zeros; receives screen-space grads
    bg: jnp.ndarray,              # [3]
    width: int,
    height: int,
    chunk: int = 64,
    rows: int | None = None,      # render only `rows` rows (pixel sharding)
    row_offset=0,                 # first row index (may be traced)
    init_state: Dict[str, jnp.ndarray] | None = None,
    return_raw: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Composite preprocessed splats into an image + 7-channel aux map.

    `init_state` (optional) seeds the per-pixel compositing carry — flat
    [P]-shaped "T", "M1", "M2" — so a depth-contiguous SEGMENT of a larger
    splat set can be composited exactly (Gaussian-sharded rendering,
    parallel/DESIGN.md §3). `return_raw=True` additionally returns the raw
    final carry (premultiplied color, transmittance, moments)."""
    N = prep.depth.shape[0]
    if rows is None:
        rows = height
    P = width * rows
    half_wh = jnp.array([0.5 * width, 0.5 * height], jnp.float32)

    # Global front-to-back order (replaces the CUDA (tile|depth) radix sort).
    sort_key = jnp.where(prep.valid, prep.depth, jnp.inf)
    order = jnp.argsort(sort_key)

    n_chunks = -(-N // chunk)
    n_outer = max(1, int(n_chunks**0.5))
    n_inner = -(-n_chunks // n_outer)
    total = n_outer * n_inner * chunk

    def pad_gather(x, fill=0.0):
        x = x[order]
        pad = [(0, total - N)] + [(0, 0)] * (x.ndim - 1)
        return jnp.pad(x, pad, constant_values=fill)

    chunks = {
        "T": pad_gather(prep.T.reshape(N, 9)),
        "center": pad_gather(prep.center2d),
        "opacity": pad_gather(prep.opacity),
        "color": pad_gather(prep.color),
        "normal": pad_gather(prep.normal),
        "means2d": pad_gather(means2d),
        "rx": pad_gather(jax.lax.stop_gradient(prep.rx)),
        "ry": pad_gather(jax.lax.stop_gradient(prep.ry)),
    }
    chunks = {k: v.reshape((n_outer, n_inner, chunk) + v.shape[1:])
              for k, v in chunks.items()}

    ys, xs = jnp.meshgrid(jnp.arange(rows, dtype=jnp.float32)
                          + jnp.asarray(row_offset, jnp.float32),
                          jnp.arange(width, dtype=jnp.float32), indexing="ij")
    px = xs.reshape(P)
    py = ys.reshape(P)

    init = {
        "T": jnp.ones((P,), jnp.float32),
        "min_test": jnp.full((P,), 2.0, jnp.float32),
        "done": jnp.zeros((P,), bool),
        "color": jnp.zeros((3, P), jnp.float32),
        "normal": jnp.zeros((3, P), jnp.float32),
        "depth": jnp.zeros((P,), jnp.float32),
        "alpha": jnp.zeros((P,), jnp.float32),
        "M1": jnp.zeros((P,), jnp.float32),
        "M2": jnp.zeros((P,), jnp.float32),
        "dist": jnp.zeros((P,), jnp.float32),
        "median": jnp.zeros((P,), jnp.float32),
    }
    if init_state is not None:
        init.update({k: jnp.asarray(v) for k, v in init_state.items()})
        init["done"] = init["done"] | (init["T"] < T_EPS)

    body = functools.partial(_chunk_body, px=px, py=py, half_wh=half_wh)

    @jax.checkpoint
    def inner(carry, seg):
        return jax.lax.scan(body, carry, seg)

    final, _ = jax.lax.scan(inner, init, chunks)

    image = final["color"] + final["T"][None, :] * bg[:, None]
    allmap = jnp.stack([
        final["depth"],
        final["alpha"],
        final["normal"][0], final["normal"][1], final["normal"][2],
        final["median"],
        final["dist"],
    ], axis=0)
    out = {
        "image": image.reshape(3, rows, width),
        "allmap": allmap.reshape(7, rows, width),
    }
    if return_raw:
        raw = dict(final)
        # discrete termination-reconstruction signal; not differentiable
        raw["min_test"] = jax.lax.stop_gradient(raw["min_test"])
        out["raw"] = raw
    return out
