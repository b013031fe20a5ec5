"""Semantics pipeline: hull removal, camera formats, clustering,
projection, SAM artifact IO, DINO loss differentiability."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_hull_removal_drops_outliers(rng):
    from gaussmart_tpu.semantics.hull import hull_removal

    # dense unit ball + a few far outliers that end up on the hull
    inner = rng.normal(scale=0.3, size=(500, 3))
    outliers = rng.normal(scale=6.0, size=(10, 3))
    pts = np.concatenate([inner, outliers])
    keep, _ = hull_removal(pts)
    # most inner points survive; most far outliers are the hull itself
    assert keep[:500].mean() > 0.9
    assert keep[500:].mean() < 0.6


def test_camera_format_autodetect(tmp_path, rng):
    from gaussmart_tpu.semantics.camera_formats import (detect_format,
                                                        load_cameras)

    # DTU npz
    dtu = {f"world_mat_{i}": np.eye(4) for i in range(3)}
    dtu.update({f"camera_mat_{i}": np.eye(4) for i in range(3)})
    dtu.update({f"scale_mat_{i}": np.eye(4) for i in range(3)})
    p_dtu = tmp_path / "cameras.npz"
    np.savez(p_dtu, **dtu)
    assert detect_format(str(p_dtu)) == "dtu"
    views, fmt = load_cameras(str(p_dtu))
    assert fmt == "dtu" and len(views) == 3

    # NeRF poses_bounds (17 cols)
    nerf = np.concatenate([np.tile(np.eye(4).reshape(1, 16), (5, 1)),
                           np.full((5, 1), 500.0)], axis=1)
    p_nerf = tmp_path / "poses_bounds.npy"
    np.save(p_nerf, nerf)
    assert detect_format(str(p_nerf)) == "nerf"
    views, _ = load_cameras(str(p_nerf))
    assert views[0]["camera_mat"][0, 0] == 500.0

    # TYT (14 cols) — halved
    tyt = rng.normal(size=(10, 14))
    for i in range(10):
        tyt[i, :12] = np.eye(4)[:3].reshape(-1)
        tyt[i, 3] = 0.1 * i
    p_tyt = tmp_path / "poses.npy"
    np.save(p_tyt, tyt)
    assert detect_format(str(p_tyt)) == "tyt"
    views, _ = load_cameras(str(p_tyt))
    assert len(views) == 5  # half-split quirk


def test_view_selector(tmp_path, rng):
    from gaussmart_tpu.semantics.camera_formats import CameraAnalysis
    from gaussmart_tpu.semantics.clustering import ViewSelector

    # 3 distinct camera clusters on a ring
    mats = {}
    n = 0
    for cidx, base in enumerate([0.0, 2.1, 4.2]):
        for j in range(6):
            ang = base + 0.05 * j
            c, s = np.cos(ang), np.sin(ang)
            c2w = np.eye(4)
            c2w[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
            c2w[:3, 3] = [5 * np.cos(ang), 0, 5 * np.sin(ang)]
            w2c = np.linalg.inv(c2w)
            mats[f"world_mat_{n}"] = w2c
            mats[f"camera_mat_{n}"] = np.eye(4)
            mats[f"scale_mat_{n}"] = np.eye(4)
            n += 1
    p = tmp_path / "cameras.npz"
    np.savez(p, **mats)
    analyzer = CameraAnalysis(str(p))
    stats = analyzer.analyze()
    assert stats["num_cameras"] == 18
    sel = ViewSelector(analyzer).select()
    ks = sel["selected_indices"]
    assert 3 <= len(ks) <= 15
    assert len(set(ks)) == len(ks)


def test_projection_nerf_and_assignment(rng):
    from gaussmart_tpu.semantics.projection import (project_points_to_view,
                                                    project_segments)

    K = np.array([[100, 0, 32, 0], [0, 100, 32, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1.0]])
    cam = {"world_mat": np.eye(4), "camera_mat": K, "scale_mat": np.eye(4)}
    pts = np.array([[0, 0, 2.0], [0.1, 0.1, 2.0], [5, 5, 2.0]])
    p2d, z = project_points_to_view(pts, cam, "nerf")
    np.testing.assert_allclose(p2d[0], [32, 32], atol=1e-6)
    np.testing.assert_allclose(p2d[1], [37, 37], atol=1e-6)
    np.testing.assert_allclose(z, 2.0)

    # mask covering upper-left quadrant
    mask = np.zeros((64, 64), bool)
    mask[:40, :40] = True
    all_masks = [[{"segmentation": mask, "bbox": [0, 0, 40, 40],
                   "area": 1600}]]
    seg, areas = project_segments(pts, all_masks, {"camera_000": cam}, "nerf")
    assert seg[0] == 0 and seg[1] == 0
    assert seg[2] == -1          # out of bounds
    assert areas[0] == 1600


def test_sam_artifact_roundtrip(tmp_path, rng):
    from gaussmart_tpu.semantics.sam_backend import (save_masks_npz,
                                                     load_masks_npz)

    masks = [{"segmentation": rng.random((8, 8)) > 0.5,
              "bbox": [1, 2, 3, 4], "area": 12}]
    p = str(tmp_path / "segments_000.npz")
    save_masks_npz(masks, p)
    out = load_masks_npz(p)
    np.testing.assert_array_equal(out[0]["segmentation"],
                                  masks[0]["segmentation"])
    assert out[0]["bbox"] == [1, 2, 3, 4]
    assert out[0]["area"] == 12


def test_classical_segmenter(tmp_path, rng):
    from PIL import Image
    from gaussmart_tpu.semantics.sam_backend import ClassicalSegmenter

    img = np.zeros((64, 64, 3), np.uint8)
    img[:, :32] = [255, 0, 0]
    img[:, 32:] = [0, 0, 255]
    p = str(tmp_path / "img.png")
    Image.fromarray(img).save(p)
    masks = ClassicalSegmenter(n_colors=2).process_image(p)
    assert len(masks) >= 2
    areas = sorted(m["area"] for m in masks)[-2:]
    assert min(areas) > 1500  # two ~2048px halves


def test_dino_loss_differentiable(rng):
    from gaussmart_tpu.semantics.dino import DinoEncoder
    from gaussmart_tpu.losses import dino_term

    enc = DinoEncoder.random(depth=1, dim=96, n_heads=3, image_size=32)
    gt = jnp.asarray(rng.random((3, 32, 32)), jnp.float32)

    def loss(img):
        return dino_term(img, gt, enc, 0.05, mode="fixed")

    img = jnp.asarray(rng.random((3, 32, 32)), jnp.float32)
    val, grad = jax.value_and_grad(loss)(img)
    assert np.isfinite(float(val))
    assert np.abs(np.asarray(grad)).sum() > 0   # gradient flows (fix mode)

    val_p, grad_p = jax.value_and_grad(
        lambda i: dino_term(i, gt, enc, 0.05, mode="parity"))(img)
    assert np.abs(np.asarray(grad_p)).sum() == 0  # parity mode: no gradient


def test_pipeline_end_to_end(tmp_path, rng):
    """Full segmentation pipeline on a synthetic nerf-format scan."""
    from PIL import Image
    from gaussmart_tpu.io.ply import store_point_cloud
    from gaussmart_tpu.semantics.pipeline import Pipeline

    scan = tmp_path / "scan"
    os.makedirs(scan / "images")
    os.makedirs(scan / "sparse" / "0")
    # cameras: nerf format, 6 views
    rows = []
    for i in range(6):
        ang = i * 1.0
        c, s = np.cos(ang), np.sin(ang)
        c2w = np.eye(4)
        c2w[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        c2w[:3, 3] = [3 * np.sin(ang), 0, -3 * np.cos(ang)]
        rows.append(np.concatenate([c2w.reshape(-1), [100.0]]))
        img = (rng.random((64, 64, 3)) * 255).astype(np.uint8)
        img[:32] = [200, 30, 30]
        Image.fromarray(img).save(scan / "images" / f"{i:03d}.png")
    np.save(scan / "poses_bounds.npy", np.stack(rows))
    pts = rng.normal(scale=0.5, size=(300, 3)).astype(np.float32)
    store_point_cloud(str(scan / "sparse" / "0" / "points3D.ply"), pts,
                      rng.integers(0, 255, (300, 3)).astype(np.float64))

    out = tmp_path / "results"
    pipe = Pipeline(str(scan), str(out), "nerf", mask_backend="classical")
    seg, areas = pipe.run(clean_pc=True)
    assert seg is not None
    pc_dir = out / "segments" / "point_cloud"
    assert (pc_dir / "segmented_point_cloud.ply").exists()
    assert (pc_dir / "segment_indices.npy").exists()
    assert (pc_dir / "mask_areas.npy").exists()
    loaded = np.load(pc_dir / "segment_indices.npy")
    assert len(loaded) == len(seg)
    assert (loaded >= -1).all()


def test_project_segments_z_cull():
    """Opt-in depth test: occluded points no longer inherit the front
    object's mask; parity mode (default) keeps the reference's
    occlusion-blind behavior (pc_projection.py:111-135)."""
    from gaussmart_tpu.semantics.projection import project_segments

    # camera at origin looking +z (nerf convention), 64x64, f=64
    K = np.array([[64.0, 0, 32], [0, 64.0, 32], [0, 0, 1]])
    cam = {"camera_mat": np.eye(4), "world_mat": np.eye(4)}
    cam["camera_mat"][:3, :3] = K
    # front cluster at z=2 and occluded cluster at z=10, same pixels
    rng = np.random.default_rng(3)
    front = np.column_stack([rng.uniform(-0.2, 0.2, 40),
                             rng.uniform(-0.2, 0.2, 40), np.full(40, 2.0)])
    back = front * np.array([5.0, 5.0, 5.0])   # same rays, z=10
    pts = np.concatenate([front, back])
    mask = np.zeros((64, 64), bool)
    mask[16:48, 16:48] = True
    masks = [[{"segmentation": mask, "bbox": [16, 16, 32, 32],
               "area": int(mask.sum())}]]
    cams = {"camera_000": cam}

    seg_blind, _ = project_segments(pts, masks, cams, "nerf")
    assert (seg_blind[:40] == 0).all() and (seg_blind[40:] == 0).all()

    seg_cull, _ = project_segments(pts, masks, cams, "nerf", z_cull=True)
    assert (seg_cull[:40] == 0).all()
    assert (seg_cull[40:] == -1).all()
