"""Shared per-splat preprocessing for the 2DGS surfel rasterizer.

Replicates the behavior of the CUDA preprocess stage of
`diff-surfel-rasterization` (reference submodule N1; call surface documented
at gaussian_renderer/__init__.py:37-106 and SURVEY.md §2.2): build the 3x3
homogeneous splat->pixel transform T, project centers, compute bounding radii
and view-space normals, and evaluate SH colors. Pure vectorized jnp — XLA
fuses this whole stage into a handful of kernels; both the dense and the
Pallas compositors consume its outputs.

Geometry convention (row vectors, matching the reference Python mirror at
gaussian_renderer/__init__.py:64-75):
    [u, v, 1] @ T = (px * z_view, py * z_view, z_view)
so T's columns are (Tu, Tv, Tw) with Tw giving view-space depth.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from gaussmart_tpu.cameras import CameraParams
from gaussmart_tpu.ops.sh import eval_sh
from gaussmart_tpu.transforms import quat_to_rotmat

# Constants mirroring the CUDA kernel's auxiliary.h
NEAR_PLANE = 0.2          # near cull + distortion mapping near
FAR_PLANE = 100.0         # distortion mapping far
FILTER_INV_SQUARE = 2.0   # screen-space low-pass: sigma^2 = 0.5 px
ALPHA_EPS = 1.0 / 255.0   # skip threshold
T_EPS = 1e-4              # front-to-back early termination
ALPHA_MAX = 0.99


class Preprocessed(NamedTuple):
    """Per-splat rasterization inputs, all shape [N, ...]."""
    T: jnp.ndarray            # [N,3,3] splat->homogeneous-pixel transform
    center2d: jnp.ndarray     # [N,2] projected center (pixels)
    radius: jnp.ndarray       # [N] float screen bounding radius (0 = culled)
    depth: jnp.ndarray        # [N] view-space z of center
    normal: jnp.ndarray       # [N,3] view-space normal (camera-facing)
    color: jnp.ndarray        # [N,3] RGB
    opacity: jnp.ndarray      # [N] in [0,1]
    valid: jnp.ndarray        # [N] bool
    rx: jnp.ndarray           # [N] tight per-axis half-extent (px, 0 = culled)
    ry: jnp.ndarray           # [N] tight per-axis half-extent (px, 0 = culled)
    ell: jnp.ndarray          # [N,5] centered/normalized c_cut-level conic
    #                           (A, B, C, ccx, ccy): the splat contributes
    #                           (rho3d <= c_cut) exactly where
    #                           A dx^2 + B dx dy + C dy^2 - 1 <= 0 with
    #                           (dx, dy) = pixel - (ccx, ccy). A=B=C=0 means
    #                           "no usable ellipse" (degenerate/hyperbolic or
    #                           invalid splat): treat every tile as live.


def _ndc2pix_cols(width: int, height: int) -> jnp.ndarray:
    """Columns [0,1,3] of the (transposed) NDC->pixel matrix
    (gaussian_renderer/__init__.py:69-73). Column 2 (depth remap) is unused
    because Tw already carries view-space z."""
    return jnp.array([
        [width / 2.0, 0.0, 0.0],
        [0.0, height / 2.0, 0.0],
        [0.0, 0.0, 0.0],
        [(width - 1) / 2.0, (height - 1) / 2.0, 1.0],
    ], jnp.float32)


def preprocess(
    means3d: jnp.ndarray,       # [N,3]
    scales: jnp.ndarray,        # [N,2] activated (exp'd) 2-axis scales
    quats: jnp.ndarray,         # [N,4] unnormalized (w,x,y,z)
    opacities: jnp.ndarray,     # [N] activated (sigmoid'd)
    shs: jnp.ndarray,           # [N,K,3] SH coeffs (DC first)
    active: jnp.ndarray,        # [N] bool mask of live splats
    cam: CameraParams,
    sh_degree: int,
    scale_modifier: float = 1.0,
    override_color: jnp.ndarray | None = None,
    active_degree=None,
) -> Preprocessed:
    """`sh_degree` is the static max degree compiled in; `active_degree`
    (optional, traced) masks coefficient bands above it so ONE compiled
    program serves the whole degree schedule (no recompiles at the
    every-1000-iterations SH bump)."""
    W, H = cam.width, cam.height
    R = quat_to_rotmat(quats)                         # [N,3,3]
    axis_u = R[..., :, 0] * (scales[:, 0:1] * scale_modifier)
    axis_v = R[..., :, 1] * (scales[:, 1:2] * scale_modifier)
    normal_world = R[..., :, 2]

    # Splat->pixel transform: rows [axis_u; axis_v; mean] with homog (0,0,1).
    M = jnp.stack([axis_u, axis_v, means3d], axis=1)  # [N,3,3]
    hom = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], jnp.float32)[None, :, None],
                           (M.shape[0], 3, 1))
    Mh = jnp.concatenate([M, hom], axis=2)            # [N,3,4]
    world2pix = cam.full_proj @ _ndc2pix_cols(W, H)   # [4,3]
    T = Mh @ world2pix                                # [N,3,3]

    # View-space center & normal.
    p_view = means3d @ cam.world_view[:3, :3] + cam.world_view[3, :3]
    z_view = p_view[:, 2]
    n_view = normal_world @ cam.world_view[:3, :3]
    # Flip normals toward the camera (CUDA DUAL_VISIBLE behavior).
    facing = jnp.sum(p_view * n_view, axis=-1)
    n_view = n_view * jnp.where(facing < 0, 1.0, -1.0)[:, None]

    # Screen-space center + extent from T (CUDA computeCenter/computeAABB):
    # the projected conic of the surfel; f = (1,1,-1)/dist.
    Tu, Tv, Tw = T[..., 0], T[..., 1], T[..., 2]      # [N,3] each (columns)
    dist = Tw[:, 0] ** 2 + Tw[:, 1] ** 2 - Tw[:, 2] ** 2
    safe_dist = jnp.where(jnp.abs(dist) < 1e-12, 1.0, dist)
    cx = (Tu[:, 0] * Tw[:, 0] + Tu[:, 1] * Tw[:, 1] - Tu[:, 2] * Tw[:, 2]) / safe_dist
    cy = (Tv[:, 0] * Tw[:, 0] + Tv[:, 1] * Tw[:, 1] - Tv[:, 2] * Tw[:, 2]) / safe_dist
    su = (Tu[:, 0] ** 2 + Tu[:, 1] ** 2 - Tu[:, 2] ** 2) / safe_dist
    sv = (Tv[:, 0] ** 2 + Tv[:, 1] ** 2 - Tv[:, 2] ** 2) / safe_dist
    ext_x = jnp.sqrt(jnp.maximum(1e-4, cx * cx - su))
    ext_y = jnp.sqrt(jnp.maximum(1e-4, cy * cy - sv))
    radius = jnp.ceil(3.0 * jnp.maximum(ext_x, ext_y))

    # Frustum / screen culling.
    on_screen = ((cx + radius > 0) & (cx - radius < W) &
                 (cy + radius > 0) & (cy - radius < H))
    valid = (active & (z_view > NEAR_PLANE) & (jnp.abs(dist) >= 1e-12) & on_screen)
    radius = jnp.where(valid, radius, 0.0)

    # Tight per-axis footprint for binning, EXACT w.r.t. the compositor's
    # per-pixel skip: alpha = o*exp(-rho/2) with rho = min(rho3d, rho2d)
    # falls below ALPHA_EPS wherever rho > c_cut = 2*ln(o/ALPHA_EPS), so a
    # tile outside BOTH the rho3d<=c_cut level conic AND the rho2d<=c_cut
    # disc (radius sqrt(c_cut/2); FILTER_INV_SQUARE=2) composites exactly
    # zero everywhere. The level conic's AABB comes from the SAME dual-conic
    # identity as (cx, ext): u^2+v^2=c pulled to pixels has dual
    # T^T diag(1,1,-1/c) T — the projective level sets are NOT concentric,
    # so sqrt(c)*ext would be wrong; this is the exact c-level AABB (its
    # center shifts off (cx, cy); we keep a symmetric bound around the
    # binning center). Everything is clipped to the reference's isotropic
    # 3-sigma square so tiles the square would CUT stay cut:
    # rasterize_tiled's output is bit-identical to binning with `radius`,
    # just without the zero-contribution (splat, tile) pairs (the CUDA
    # reference pays for those; rasterize_points.cu bins the full square).
    # o <= ALPHA_EPS makes the footprint empty: such a splat composites
    # nowhere and receives zero gradient either way.
    c_cut = 2.0 * jnp.log(jnp.maximum(opacities, 1e-12) / ALPHA_EPS)
    inv_c = 1.0 / jnp.maximum(c_cut, 1e-12)
    dist_c = Tw[:, 0] ** 2 + Tw[:, 1] ** 2 - Tw[:, 2] ** 2 * inv_c
    safe_dc = jnp.where(jnp.abs(dist_c) < 1e-12, 1.0, dist_c)
    cx_c = (Tu[:, 0] * Tw[:, 0] + Tu[:, 1] * Tw[:, 1]
            - Tu[:, 2] * Tw[:, 2] * inv_c) / safe_dc
    cy_c = (Tv[:, 0] * Tw[:, 0] + Tv[:, 1] * Tw[:, 1]
            - Tv[:, 2] * Tw[:, 2] * inv_c) / safe_dc
    su_c = (Tu[:, 0] ** 2 + Tu[:, 1] ** 2 - Tu[:, 2] ** 2 * inv_c) / safe_dc
    sv_c = (Tv[:, 0] ** 2 + Tv[:, 1] ** 2 - Tv[:, 2] ** 2 * inv_c) / safe_dc
    ex2 = cx_c * cx_c - su_c
    ey2 = cy_c * cy_c - sv_c
    # well-conditioned ellipse only (same orientation as the 1-level conic);
    # anything degenerate falls back to the full square
    good = ((jnp.abs(dist_c) >= 1e-12) & (dist_c * safe_dist > 0)
            & (ex2 >= 0) & (ey2 >= 0))
    extc_x = jnp.sqrt(jnp.maximum(ex2, 0.0))
    extc_y = jnp.sqrt(jnp.maximum(ey2, 0.0))
    r2d = jnp.sqrt(jnp.maximum(c_cut, 0.0) * 0.5)
    tx = jnp.maximum(jnp.abs(cx_c - cx) + extc_x, r2d)
    ty = jnp.maximum(jnp.abs(cy_c - cy) + extc_y, r2d)
    rx = jnp.minimum(radius, jnp.ceil(jnp.where(good, tx, radius)))
    ry = jnp.minimum(radius, jnp.ceil(jnp.where(good, ty, radius)))
    tight_ok = valid & (c_cut > 0.0)
    rx = jnp.where(tight_ok, rx, 0.0)
    ry = jnp.where(tight_ok, ry, 0.0)

    # Exact c_cut-level conic of rho3d in pixel space, for per-(splat, tile)
    # culling in the Pallas binning (_binning). Built from the SAME dual-conic
    # identity as the tight AABB above — center (cx_c, cy_c) and the 2x2
    # support matrix P with h(d) = d.center + sqrt(d^T P d), so the level set
    # is the ellipse {z : (z - center)^T P^-1 (z - center) <= 1}, i.e.
    # P_xx = cx_c^2 - su_c (= ext_x^2), P_yy = cy_c^2 - sv_c, and
    # P_xy = cx_c*cy_c - suv_c. This route needs only quadratic products of T
    # plus one 2x2 inversion; the direct adjugate route (ran here first)
    # needs quartic products whose f32 cancellation mis-sized real ellipses
    # by >2x (tests/test_conic_cull.py regression scene, splat 41). All
    # quantities are computed in coordinates recentered at (cx, cy) so the
    # products are footprint-sized, not image-sized. Safety gates (the cull
    # may only ever KEEP too much): P must be positive definite with
    # det >= 1e-4*trace^2 (caps the P^-1 relative error at ~2.4e-3, covered
    # 8x by _binning's 2e-2 test margin; thinner ellipses fall back to the
    # rect footprint) and the stored ellipse must contain the projected
    # center (rho3d there is exactly 0). A = B = C = 0 marks "no usable
    # ellipse": _binning keeps every tile of the rect.
    Tuc = Tu - cx[:, None] * Tw
    Tvc = Tv - cy[:, None] * Tw

    def dotc(a, b):
        return a[:, 0] * b[:, 0] + a[:, 1] * b[:, 1] - a[:, 2] * b[:, 2] * inv_c

    exo = dotc(Tuc, Tw) / safe_dc      # conic center offset from (cx, cy)
    eyo = dotc(Tvc, Tw) / safe_dc
    pxx = exo * exo - dotc(Tuc, Tuc) / safe_dc
    pxy = exo * eyo - dotc(Tuc, Tvc) / safe_dc
    pyy = eyo * eyo - dotc(Tvc, Tvc) / safe_dc
    detp = pxx * pyy - pxy * pxy
    trp = pxx + pyy
    is_ell = (good & (c_cut > 0.0) & (pxx > 0) & (pyy > 0)
              & (detp > 1e-4 * trp * trp))
    inv_det = jnp.where(is_ell, 1.0 / jnp.where(is_ell, detp, 1.0), 0.0)
    eA = pyy * inv_det
    eB = -2.0 * pxy * inv_det
    eC = pxx * inv_det
    # the projected center must satisfy the interior test (Q(-off) <= 1)
    q_ctr = eA * exo * exo + eB * exo * eyo + eC * eyo * eyo
    is_ell = is_ell & (q_ctr <= 1.0)
    zero_bad = is_ell.astype(jnp.float32)
    ell = jnp.stack([eA * zero_bad, eB * zero_bad, eC * zero_bad,
                     cx + jnp.where(is_ell, exo, 0.0),
                     cy + jnp.where(is_ell, eyo, 0.0)], axis=1)

    # Color: SH evaluated toward the camera (in-kernel convert, as the CUDA
    # path does when shs are passed — gaussian_renderer/__init__.py:92-93).
    if override_color is None:
        from gaussmart_tpu.transforms import safe_normalize
        dirs = safe_normalize(means3d - cam.camera_center[None, :])
        sh_in = shs
        if active_degree is not None:
            import numpy as _np
            k = (sh_degree + 1) ** 2
            bands = jnp.asarray(_np.floor(_np.sqrt(_np.arange(k))), jnp.float32)
            mask = (bands <= jnp.asarray(active_degree, jnp.float32))
            sh_in = shs * mask[None, :k, None]
        color = jnp.maximum(
            eval_sh(sh_degree, jnp.swapaxes(sh_in, 1, 2), dirs) + 0.5, 0.0)
    else:
        color = override_color

    return Preprocessed(
        T=T,
        center2d=jnp.stack([cx, cy], axis=-1),
        radius=radius,
        depth=z_view,
        normal=n_view,
        color=color,
        opacity=opacities * valid.astype(opacities.dtype),
        valid=valid,
        rx=rx,
        ry=ry,
        ell=ell,
    )


def mapped_depth(depth: jnp.ndarray) -> jnp.ndarray:
    """Depth remap used by the distortion regularizer integral."""
    return FAR_PLANE / (FAR_PLANE - NEAR_PLANE) * (1.0 - NEAR_PLANE / depth)
