"""Generate a realistic COLMAP-format validation scene with ray-traced GT.

The GT images come from an analytic CPU ray tracer (textured sphere,
checkerboard ground plane, two boxes, Lambertian lighting) — fully
independent of the framework's own rasterizer, so training against them is
an honest end-to-end optimization benchmark (VERDICT round-1 task 6).

Outputs under --out:
  images/r_XX.png              ray-traced views
  sparse/0/{cameras,images,points3D}.txt   COLMAP text model
  gt_surface_points.npy        dense GT surface samples (Chamfer reference)

Usage: python scripts/make_synthetic_scene.py --out /tmp/scene24 \
           [--views 32] [--width 776] [--height 584] [--sfm_points 30000]
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PLANE_Y = -0.8
SPHERE_C = np.array([0.0, -0.1, 0.0])
SPHERE_R = 0.65
BOX1 = (np.array([-1.15, PLANE_Y, -0.35]), np.array([-0.55, -0.15, 0.25]))
BOX2 = (np.array([0.6, PLANE_Y, 0.15]), np.array([1.1, -0.35, 0.65]))
LIGHTS = [(np.array([0.4, 0.8, 0.45]), 0.85), (np.array([-0.6, 0.5, -0.6]), 0.45)]
AMBIENT = 0.25

# Bounded (DTU-like) scene by default. --unbounded switches to an M360-style
# layout: the ground plane runs to the horizon and a ring of far "hill"
# spheres surrounds the foreground, so splats must cover depth from ~2 to
# ~25 units and mesh extraction needs the contraction (unbounded) path.
PLANE_EXT = 2.2
FAR_SPHERES = []  # list of (center[3], radius, albedo[3])


def set_float_sphere():
    """Raise the sphere into the void above the scene: from the ring
    cameras its mask then has (almost) no other geometry behind it, the
    one configuration in which the reference's mask-area augmentation
    target (sqrt(area)*0.1, gaussian_model.py:186-245) can exceed the
    segment's assigned point count — see BASELINE.md round-5 'Segment
    densification' for the measured no-fire analysis on cluttered scenes."""
    global SPHERE_C
    SPHERE_C = np.array([0.0, 1.1, 0.0])


def set_unbounded():
    global PLANE_EXT, FAR_SPHERES
    PLANE_EXT = 40.0
    rng = np.random.default_rng(11)
    FAR_SPHERES = []
    for i in range(10):
        ang = 2 * np.pi * i / 10 + rng.uniform(-0.15, 0.15)
        dist = rng.uniform(14.0, 22.0)
        rad = rng.uniform(4.0, 8.0)
        c = np.array([dist * np.cos(ang), PLANE_Y - 0.55 * rad,
                      dist * np.sin(ang)])
        col = np.array([0.25 + 0.2 * rng.random(),
                        0.4 + 0.25 * rng.random(),
                        0.2 + 0.15 * rng.random()])
        FAR_SPHERES.append((c, rad, col))


def _checker(p):
    c = (np.floor(p[..., 0] * 2.0) + np.floor(p[..., 2] * 2.0)) % 2
    col = np.where(c[..., None] > 0.5,
                   np.array([0.85, 0.82, 0.78]), np.array([0.25, 0.3, 0.4]))
    # LOD fade: beyond ~6 units the checker frequency exceeds what any
    # camera in the ring resolves (and what a splat model could fit), so
    # blend toward the mean color like a mip chain would. No-op within the
    # bounded scene's 2.2-unit extent.
    r = np.linalg.norm(p[..., [0, 2]], axis=-1, keepdims=True)
    w = np.clip((r - 6.0) / 12.0, 0.0, 0.9)
    mean = np.array([0.55, 0.56, 0.59])
    return col * (1 - w) + mean * w


def _sphere_tex(p):
    d = (p - SPHERE_C) / SPHERE_R
    phi = np.arctan2(d[..., 2], d[..., 0])
    theta = np.arccos(np.clip(d[..., 1], -1, 1))
    stripes = 0.5 + 0.5 * np.sin(6.0 * phi) * np.sin(5.0 * theta)
    base = np.stack([0.9 * stripes + 0.05, 0.25 + 0.45 * (1 - stripes),
                     0.3 + 0.2 * np.sin(3 * phi)], axis=-1)
    return np.clip(base, 0, 1)


def _box_hit(o, d, lo, hi):
    inv = 1.0 / np.where(np.abs(d) < 1e-9, 1e-9, d)
    t0 = (lo - o) * inv
    t1 = (hi - o) * inv
    tmin = np.minimum(t0, t1).max(axis=-1)
    tmax = np.maximum(t0, t1).min(axis=-1)
    hit = (tmax > np.maximum(tmin, 1e-4))
    return np.where(hit, tmin, np.inf)


def _box_normal(p, lo, hi):
    eps = 1e-4
    n = np.zeros_like(p)
    for ax in range(3):
        n[..., ax] = np.where(np.abs(p[..., ax] - lo[ax]) < eps, -1.0,
                              np.where(np.abs(p[..., ax] - hi[ax]) < eps,
                                       1.0, 0.0))
    return n


def trace(o, d):
    """o,d: [..., 3] rays -> rgb [...,3], hit point [...,3], mask [...]."""
    best_t = np.full(d.shape[:-1], np.inf)
    rgb = np.zeros(d.shape[:-1] + (3,))
    normal = np.zeros_like(rgb)
    mat = np.zeros(d.shape[:-1], np.int32)  # 0 none 1 plane 2 sphere 3/4 box

    # plane (bounded to the scene extent so geometry stays finite)
    tp = (PLANE_Y - o[..., 1]) / np.where(np.abs(d[..., 1]) < 1e-9, 1e-9,
                                          d[..., 1])
    pp = o + tp[..., None] * d
    inb = (np.abs(pp[..., 0]) < PLANE_EXT) & (np.abs(pp[..., 2]) < PLANE_EXT)
    ok = (tp > 1e-4) & (tp < best_t) & inb
    best_t = np.where(ok, tp, best_t)
    mat = np.where(ok, 1, mat)

    # sphere
    oc = o - SPHERE_C
    b = np.sum(oc * d, axis=-1)
    c = np.sum(oc * oc, axis=-1) - SPHERE_R ** 2
    disc = b * b - c
    ts = -b - np.sqrt(np.maximum(disc, 0))
    ok = (disc > 0) & (ts > 1e-4) & (ts < best_t)
    best_t = np.where(ok, ts, best_t)
    mat = np.where(ok, 2, mat)

    for mi, (lo, hi) in ((3, BOX1), (4, BOX2)):
        tb = _box_hit(o, d, lo, hi)
        ok = tb < best_t
        best_t = np.where(ok, tb, best_t)
        mat = np.where(ok, mi, mat)

    for k, (fc, fr, _col) in enumerate(FAR_SPHERES):
        oc = o - fc
        b = np.sum(oc * d, axis=-1)
        c = np.sum(oc * oc, axis=-1) - fr**2
        disc = b * b - c
        ts = -b - np.sqrt(np.maximum(disc, 0))
        ok = (disc > 0) & (ts > 1e-4) & (ts < best_t)
        best_t = np.where(ok, ts, best_t)
        mat = np.where(ok, 5 + k, mat)

    hit = np.isfinite(best_t)
    t = np.where(hit, best_t, 0.0)
    p = o + t[..., None] * d

    # normals + albedo per material
    albedo = np.zeros_like(rgb)
    albedo = np.where((mat == 1)[..., None], _checker(p), albedo)
    normal = np.where((mat == 1)[..., None], np.array([0.0, 1.0, 0.0]), normal)
    albedo = np.where((mat == 2)[..., None], _sphere_tex(p), albedo)
    sn = (p - SPHERE_C) / SPHERE_R
    normal = np.where((mat == 2)[..., None], sn, normal)
    for mi, (lo, hi), col in ((3, BOX1, np.array([0.8, 0.45, 0.2])),
                              (4, BOX2, np.array([0.3, 0.65, 0.75]))):
        albedo = np.where((mat == mi)[..., None], col, albedo)
        normal = np.where((mat == mi)[..., None], _box_normal(p, lo, hi),
                          normal)
    for k, (fc, fr, col) in enumerate(FAR_SPHERES):
        sel = (mat == 5 + k)[..., None]
        albedo = np.where(sel, col, albedo)
        normal = np.where(sel, (p - fc) / fr, normal)

    shade = AMBIENT * np.ones(d.shape[:-1])
    for ldir, lint in LIGHTS:
        ld = ldir / np.linalg.norm(ldir)
        shade = shade + lint * np.maximum(np.sum(normal * ld, axis=-1), 0.0)
    rgb = np.clip(albedo * shade[..., None], 0, 1)
    rgb = np.where(hit[..., None], rgb, np.array([1.0, 1.0, 1.0]))  # white bg
    return rgb, p, hit, mat


def camera_ring(n_views, radius=3.1, height_amp=0.75):
    cams = []
    for i in range(n_views):
        ang = 2 * np.pi * i / n_views
        h = 0.55 + height_amp * (0.5 + 0.5 * np.sin(3 * ang + 0.7))
        eye = np.array([radius * np.cos(ang), h, radius * np.sin(ang)])
        target = np.array([0.0, -0.25, 0.0])
        fwd = target - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, np.array([0.0, 1.0, 0.0]))
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        # world->cam rotation rows: x=right, y=-up (image y down), z=fwd
        R = np.stack([right, -up, fwd])            # [3,3] w2c
        t = -R @ eye
        cams.append((R, t, eye))
    return cams


def render_view(R, t, eye, W, H, f, ss=2):
    """`ss`x`ss` supersampling: photographs are band-limited by the lens +
    sensor; 1-ray-per-pixel GT has aliased (Nyquist-violating) edges that no
    splat model can fit, which keeps edge gradients permanently high and
    drives runaway densification. Box-filtered SSAA makes the target
    realizable, like the reference's real-photo datasets."""
    acc = np.zeros((H, W, 3))
    offs = (np.arange(ss) + 0.5) / ss
    for oy in offs:
        for ox in offs:
            ys, xs = np.meshgrid(np.arange(H) + oy, np.arange(W) + ox,
                                 indexing="ij")
            dirs_cam = np.stack([(xs - W / 2) / f, (ys - H / 2) / f,
                                 np.ones_like(xs)], axis=-1)
            dirs = dirs_cam @ R    # R^T @ d per pixel (rows are axes)
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            o = np.broadcast_to(eye, dirs.shape)
            rgb, _, _, _ = trace(o, dirs)
            acc += rgb
    return acc / (ss * ss)


def sample_surface(n, rng):
    """GT surface samples with albedo colors (for SfM cloud + Chamfer)."""
    pts, cols = [], []
    # proportional-ish areas
    n_sph = n // 3
    n_pl = n // 3
    n_box = n - n_sph - n_pl
    v = rng.normal(size=(n_sph, 3))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    p = SPHERE_C + SPHERE_R * v
    keep = p[:, 1] > PLANE_Y
    pts.append(p[keep])
    cols.append(_sphere_tex(p[keep]))
    p = np.stack([rng.uniform(-2.2, 2.2, n_pl), np.full(n_pl, PLANE_Y),
                  rng.uniform(-2.2, 2.2, n_pl)], axis=1)
    pts.append(p)
    cols.append(_checker(p))
    for (lo, hi), col in ((BOX1, np.array([0.8, 0.45, 0.2])),
                          (BOX2, np.array([0.3, 0.65, 0.75]))):
        m = n_box // 2
        face = rng.integers(0, 5, m)  # skip bottom face
        u = rng.uniform(0, 1, (m, 3))
        p = lo + u * (hi - lo)
        for ax, side in ((0, 0), (0, 1), (2, 0), (2, 1), (1, 1)):
            sel = face == (ax * 2 + side if ax < 1 else
                           (2 + side if ax == 2 else 4))
            p[sel, ax] = (hi if side else lo)[ax]
        pts.append(p)
        cols.append(np.broadcast_to(col, p.shape).copy())
    if FAR_SPHERES:
        # background coverage for the SfM-like cloud: far ground with a
        # near-biased radial density (as real SfM tracks thin out with
        # distance) plus the camera-facing upper caps of the hill spheres
        m = n // 4
        rad = 2.2 + 18.0 * np.sqrt(rng.uniform(0, 1, m))
        ang = rng.uniform(0, 2 * np.pi, m)
        p = np.stack([rad * np.cos(ang), np.full(m, PLANE_Y),
                      rad * np.sin(ang)], axis=1)
        pts.append(p)
        cols.append(_checker(p))
        mh = n // 8
        for fc, fr, col in FAR_SPHERES:
            v = rng.normal(size=(mh // len(FAR_SPHERES) + 1, 3))
            v /= np.linalg.norm(v, axis=1, keepdims=True)
            v[:, 1] = np.abs(v[:, 1])          # upper hemisphere
            hp = fc + fr * v
            keep = hp[:, 1] > PLANE_Y - 0.05   # the part poking above ground
            pts.append(hp[keep])
            cols.append(np.broadcast_to(col, hp[keep].shape).copy())
    return np.concatenate(pts), np.clip(np.concatenate(cols), 0, 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--views", type=int, default=32)
    ap.add_argument("--width", type=int, default=776)
    ap.add_argument("--height", type=int, default=584)
    ap.add_argument("--focal", type=float, default=700.0)
    ap.add_argument("--sfm_points", type=int, default=30000)
    ap.add_argument("--gt_points", type=int, default=200000)
    ap.add_argument("--unbounded", action="store_true",
                    help="M360-style: ground to the horizon + far hill ring")
    ap.add_argument("--float_sphere", action="store_true",
                    help="raise the sphere into the void (see "
                         "set_float_sphere)")
    ap.add_argument("--write_masks", action="store_true",
                    help="write analytic GT object masks (per material id) "
                         "in the reference segments_{i:03d}.npz format to "
                         "<out>/masks_gt — a perfect-SAM stand-in for the "
                         "segmentation pipeline (--mask_backend precomputed "
                         "--mask_dir <out>/masks_gt --skip_camera_clustering)")
    ap.add_argument("--sparsify_sphere", type=float, default=0.0,
                    help="drop this FRACTION of the sphere's SfM points "
                         "(GT surface samples untouched) — builds the "
                         "under-sampled-object scene the segment-aware "
                         "densification A/B needs (reference "
                         "scene/gaussian_model.py:186-258 exists exactly "
                         "for low point-count/mask-area segments)")
    args = ap.parse_args()
    if args.unbounded:
        set_unbounded()
    if args.float_sphere:
        set_float_sphere()

    from PIL import Image
    from gaussmart_tpu.io.colmap import (ColmapCamera, ColmapImage,
                                         rotmat2qvec, write_cameras_text,
                                         write_images_text)

    rng = np.random.default_rng(7)
    os.makedirs(os.path.join(args.out, "images"), exist_ok=True)
    sparse = os.path.join(args.out, "sparse/0")
    os.makedirs(sparse, exist_ok=True)

    cams = camera_ring(args.views)
    intr = {1: ColmapCamera(1, "PINHOLE", args.width, args.height,
                            np.array([args.focal, args.focal,
                                      args.width / 2, args.height / 2]))}
    write_cameras_text(os.path.join(sparse, "cameras.txt"), intr)

    images = {}
    for i, (R, t, eye) in enumerate(cams):
        rgb = render_view(R, t, eye, args.width, args.height, args.focal)
        name = f"r_{i:02d}.png"
        Image.fromarray((rgb * 255).astype(np.uint8)).save(
            os.path.join(args.out, "images", name))
        images[i + 1] = ColmapImage(i + 1, rotmat2qvec(R), t, 1, name)
        if args.write_masks:
            # one center ray per pixel; material id -> binary object masks
            ys, xs = np.meshgrid(np.arange(args.height) + 0.5,
                                 np.arange(args.width) + 0.5, indexing="ij")
            dirs = np.stack([(xs - args.width / 2) / args.focal,
                             (ys - args.height / 2) / args.focal,
                             np.ones_like(xs)], axis=-1)
            dirs = dirs @ R
            dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
            _, _, _, mat = trace(np.broadcast_to(eye, dirs.shape), dirs)
            sys.path.insert(0, os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))))
            from gaussmart_tpu.semantics.sam_backend import save_masks_npz
            masks = []
            for m_id in np.unique(mat):
                if m_id == 0:
                    continue
                seg = mat == m_id
                ys_m, xs_m = np.where(seg)
                masks.append({
                    "segmentation": seg,
                    "bbox": [int(xs_m.min()), int(ys_m.min()),
                             int(xs_m.max() - xs_m.min() + 1),
                             int(ys_m.max() - ys_m.min() + 1)],
                    "area": int(seg.sum())})
            save_masks_npz(masks, os.path.join(
                args.out, "masks_gt", f"segments_{i:03d}.npz"))
        print(f"rendered {name}")
    write_images_text(os.path.join(sparse, "images.txt"), images)

    # SfM-like sparse cloud: surface samples + noise + a few outliers
    pts, cols = sample_surface(args.sfm_points, rng)
    if args.sparsify_sphere > 0.0:
        on_sphere = (np.abs(np.linalg.norm(pts - SPHERE_C, axis=1)
                            - SPHERE_R) < 1e-6)
        drop = on_sphere & (rng.random(len(pts)) < args.sparsify_sphere)
        pts, cols = pts[~drop], cols[~drop]
        print(f"sparsified sphere: dropped {int(drop.sum())} of "
              f"{int(on_sphere.sum())} sphere SfM points")
    pts = pts + rng.normal(0, 0.004, pts.shape)
    n_out = max(1, len(pts) // 200)
    outliers = rng.uniform(-4, 4, (n_out, 3))
    pts = np.concatenate([pts, outliers])
    cols = np.concatenate([cols, rng.uniform(0, 1, (n_out, 3))])
    with open(os.path.join(sparse, "points3D.txt"), "w") as f:
        f.write("# 3D point list\n")
        for j, (p, c) in enumerate(zip(pts, cols)):
            r, g, b = (np.clip(c, 0, 1) * 255).astype(int)
            f.write(f"{j} {p[0]:.6f} {p[1]:.6f} {p[2]:.6f} {r} {g} {b} 0.5\n")

    # nerf-format exports so the segmentation preprocessing pipeline
    # (`python -m gaussmart_tpu.semantics.pipeline -t nerf`) can run on this
    # scene: poses_bounds.npy rows = flattened 4x4 c2w + focal (the 17-col
    # layout of reference identification/camera_loader.py:61-105, which
    # assumes 1024x1024 principal point — generate with --width/height 1024
    # when alignment matters), and sparse/0/points3D.ply.
    from gaussmart_tpu.io.ply import write_ply
    rows = []
    for R, t, eye in cams:
        c2w = np.eye(4)
        c2w[:3, :3] = R.T
        c2w[:3, 3] = eye
        rows.append(np.concatenate([c2w.reshape(16), [args.focal]]))
    np.save(os.path.join(args.out, "poses_bounds.npy"),
            np.asarray(rows, np.float64))
    rgb8 = (np.clip(cols, 0, 1) * 255).astype(np.uint8)
    write_ply(os.path.join(sparse, "points3D.ply"),
              {"x": pts[:, 0].astype(np.float32),
               "y": pts[:, 1].astype(np.float32),
               "z": pts[:, 2].astype(np.float32),
               "nx": np.zeros(len(pts), np.float32),
               "ny": np.zeros(len(pts), np.float32),
               "nz": np.zeros(len(pts), np.float32),
               "red": rgb8[:, 0], "green": rgb8[:, 1], "blue": rgb8[:, 2]})

    gt_pts, _ = sample_surface(args.gt_points, rng)
    np.save(os.path.join(args.out, "gt_surface_points.npy"),
            gt_pts.astype(np.float32))
    print(f"scene written to {args.out}: {args.views} views, "
          f"{len(pts)} sfm points, {len(gt_pts)} GT surface samples")


if __name__ == "__main__":
    main()
