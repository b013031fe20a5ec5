"""IO layer: PLY codec, COLMAP parsers, snapshots, checkpoints, Scene."""
import json
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

from gaussmart_tpu.io.ply import read_ply, write_ply, store_point_cloud, fetch_point_cloud
from gaussmart_tpu.io import colmap
from gaussmart_tpu.io.gaussian_ply import save_gaussian_ply, load_gaussian_ply
from gaussmart_tpu.io.checkpoint import save_checkpoint, load_checkpoint
from gaussmart_tpu.models.gaussians import init_from_pcd
from gaussmart_tpu.optim import init_adam


def test_ply_roundtrip(tmp_path, rng):
    cols = {
        "x": rng.normal(size=11).astype(np.float32),
        "red": rng.integers(0, 255, 11).astype(np.uint8),
        "segment": rng.integers(-1, 5, 11).astype(np.int32),
    }
    p = str(tmp_path / "t.ply")
    write_ply(p, cols)
    out = read_ply(p)
    for k in cols:
        np.testing.assert_array_equal(out[k], cols[k])


def test_point_cloud_roundtrip(tmp_path, rng):
    xyz = rng.normal(size=(20, 3)).astype(np.float32)
    rgb = rng.integers(0, 255, (20, 3)).astype(np.float64)
    p = str(tmp_path / "pc.ply")
    store_point_cloud(p, xyz, rgb, segments=np.arange(20, dtype=np.int32))
    pts, cols, normals = fetch_point_cloud(p)
    np.testing.assert_allclose(pts, xyz, rtol=1e-6)
    np.testing.assert_allclose(cols * 255, rgb, atol=1.0)
    v = read_ply(p)
    np.testing.assert_array_equal(v["segment"], np.arange(20))


def _write_colmap_binary(tmp_path):
    sparse = tmp_path / "sparse" / "0"
    os.makedirs(sparse)
    # cameras.bin: one PINHOLE camera
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 64, 48))
        f.write(struct.pack("<dddd", 60.0, 55.0, 32.0, 24.0))
    # images.bin: two images w/ 1 observation each
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i, name in [(1, b"a.png"), (2, b"b.png")]:
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.1 * i, 0, 1.0])
            f.write(struct.pack("<idddddddi", i, *q, *t, 1))
            f.write(name + b"\x00")
            f.write(struct.pack("<Q", 1))
            f.write(struct.pack("<ddq", 1.0, 2.0, -1))
    # points3D.bin: 3 points with tracks
    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", 3))
        for i in range(3):
            f.write(struct.pack("<QdddBBBd", i, i * 1.0, 0.5, 2.0,
                                10 * i, 20, 30, 0.5))
            f.write(struct.pack("<Q", 2))
            f.write(struct.pack("<ii", 1, 0))
            f.write(struct.pack("<ii", 2, 0))
    return sparse


def test_colmap_binary_parsers(tmp_path):
    sparse = _write_colmap_binary(tmp_path)
    cams = colmap.read_cameras_binary(str(sparse / "cameras.bin"))
    assert cams[1].model == "PINHOLE" and cams[1].width == 64
    np.testing.assert_allclose(cams[1].params, [60, 55, 32, 24])
    ims = colmap.read_images_binary(str(sparse / "images.bin"))
    assert ims[2].name == "b.png"
    np.testing.assert_allclose(ims[2].tvec, [0.2, 0, 1.0])
    xyz, rgb, err = colmap.read_points3d_binary(str(sparse / "points3D.bin"))
    assert xyz.shape == (3, 3)
    np.testing.assert_allclose(rgb[:, 0], [0, 10, 20])


def test_colmap_text_roundtrip(tmp_path):
    cams = {1: colmap.ColmapCamera(1, "PINHOLE", 10, 20,
                                   np.array([5.0, 6.0, 5.0, 10.0]))}
    ims = {3: colmap.ColmapImage(3, np.array([0.9, 0.1, 0.2, 0.3]),
                                 np.array([1.0, 2.0, 3.0]), 1, "x.jpg")}
    colmap.write_cameras_text(str(tmp_path / "cameras.txt"), cams)
    colmap.write_images_text(str(tmp_path / "images.txt"), ims)
    c2 = colmap.read_cameras_text(str(tmp_path / "cameras.txt"))
    i2 = colmap.read_images_text(str(tmp_path / "images.txt"))
    np.testing.assert_allclose(c2[1].params, cams[1].params)
    np.testing.assert_allclose(i2[3].qvec, ims[3].qvec)
    assert i2[3].name == "x.jpg"


def test_colmap_images_text_empty_point_lines(tmp_path):
    """Regression: images whose 2D-observation line is EMPTY (as this
    repo's scene writer emits, and as COLMAP produces for images with zero
    registered points) must all be read — the old reader stripped blank
    lines before pair-striding and silently dropped every other image."""
    ims = {i: colmap.ColmapImage(i, np.array([1.0, 0, 0, 0]),
                                 np.array([0.0, 0.0, float(i)]), 1,
                                 f"r_{i:02d}.png") for i in range(1, 9)}
    colmap.write_images_text(str(tmp_path / "images.txt"), ims)
    back = colmap.read_images_text(str(tmp_path / "images.txt"))
    assert sorted(back) == sorted(ims), (len(back), len(ims))
    # and the real-COLMAP shape too: non-empty 2D point lines
    with open(tmp_path / "images2.txt", "w") as f:
        f.write("# header\n")
        for i, im in ims.items():
            q = " ".join(str(v) for v in im.qvec)
            t = " ".join(str(v) for v in im.tvec)
            f.write(f"{i} {q} {t} 1 {im.name}\n")
            f.write("1.5 2.5 7 3.5 4.5 9\n")
    back2 = colmap.read_images_text(str(tmp_path / "images2.txt"))
    assert sorted(back2) == sorted(ims)
    assert back2[4].name == "r_04.png"


def test_qvec_rotmat_roundtrip(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    if q[0] < 0:
        q = -q
    R = colmap.qvec2rotmat(q)
    np.testing.assert_allclose(colmap.rotmat2qvec(R), q, atol=1e-8)


def make_state(rng, n=10):
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    segs = rng.integers(0, 4, n)
    return init_from_pcd(pts, cols, segs, max_sh_degree=2,
                         spatial_lr_scale=1.3, capacity=32)


def test_gaussian_ply_roundtrip(tmp_path, rng):
    state = make_state(rng)
    p = str(tmp_path / "point_cloud.ply")
    save_gaussian_ply(p, state)
    state2 = load_gaussian_ply(p, max_sh_degree=2, spatial_lr_scale=1.3)
    n = int(state.n_active)
    assert int(state2.n_active) == n
    np.testing.assert_allclose(np.asarray(state2.params.xyz)[:n],
                               np.asarray(state.params.xyz)[:n], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.params.features_rest)[:n],
                               np.asarray(state.params.features_rest)[:n], rtol=1e-6)
    np.testing.assert_allclose(np.asarray(state2.params.scaling)[:n],
                               np.asarray(state.params.scaling)[:n], rtol=1e-6)
    np.testing.assert_array_equal(np.asarray(state2.aux.segments)[:n],
                                  np.asarray(state.aux.segments)[:n])
    assert state2.active_sh_degree == 2  # restored at max degree


def test_checkpoint_roundtrip(tmp_path, rng):
    state = make_state(rng)
    adam = init_adam(state.params)
    adam = adam.__class__(mu=adam.mu, nu=adam.nu,
                          step=jnp.asarray(7, jnp.int32))
    p = str(tmp_path / "chkpnt100.npz")
    save_checkpoint(p, state, adam, iteration=100)
    state2, adam2, it = load_checkpoint(p)
    assert it == 100
    assert int(adam2.step) == 7
    assert state2.spatial_lr_scale == pytest.approx(1.3)
    np.testing.assert_allclose(np.asarray(state2.params.xyz),
                               np.asarray(state.params.xyz))
    np.testing.assert_array_equal(np.asarray(state2.aux.active),
                                  np.asarray(state.aux.active))


def test_blender_scene_end_to_end(tmp_path, rng):
    """Synthetic Blender dataset -> Scene -> cameras + init state."""
    from PIL import Image
    from gaussmart_tpu.scene import Scene
    from gaussmart_tpu.config import ModelParams

    src = tmp_path / "scene"
    os.makedirs(src / "train")
    frames = []
    for i in range(3):
        img = (rng.random((20, 30, 4)) * 255).astype(np.uint8)
        Image.fromarray(img, "RGBA").save(src / "train" / f"r_{i}.png")
        c2w = np.eye(4)
        c2w[2, 3] = -3.0 - i
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.7, "frames": frames}, f)

    args = ModelParams(source_path=str(src), model_path=str(tmp_path / "out"),
                       white_background=True, sh_degree=1, resolution=1)
    scene = Scene(args, capacity=2048, seed=0)
    assert len(scene.get_train_cameras()) == 6  # eval=False merges splits
    assert scene.cameras_extent > 0
    cam = scene.get_train_cameras()[0]
    assert cam.image.shape == (3, 20, 30)
    assert int(scene.gaussians.n_active) > 0
    assert os.path.exists(tmp_path / "out" / "cameras.json")
    assert os.path.exists(tmp_path / "out" / "input.ply")


def test_augment_by_mask_areas(rng):
    from gaussmart_tpu.semantics.augment import augment_by_mask_areas
    pts = rng.normal(size=(40, 3)).astype(np.float32)
    cols = rng.random((40, 3)).astype(np.float32)
    segs = np.concatenate([np.zeros(20, np.int32), np.ones(20, np.int32)])
    # segment 1 wants sqrt(90000)*0.1 = 30 points -> +10
    out_p, out_c, out_s = augment_by_mask_areas(
        pts, cols, segs, {1: 90000.0}, verbose=False)
    assert (out_s == 1).sum() == 30
    assert len(out_p) == len(out_c) == len(out_s)
    # new points near segment-1 centroid-ish (loose statistical bound)
    new_pts = out_p[40:]
    assert np.linalg.norm(new_pts.mean(0) - pts[20:].mean(0)) < 2.0
