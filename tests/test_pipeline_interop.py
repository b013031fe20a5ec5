"""Segmentation-pipeline artifacts flow into training init (the
dataset_readers.py:115-146 / main.py contract end-to-end)."""
import json
import os

import numpy as np
import pytest


def test_artifacts_consumed_by_scene(tmp_path, rng, monkeypatch):
    from PIL import Image
    from gaussmart_tpu.io.ply import store_point_cloud
    from gaussmart_tpu.semantics.pipeline import Pipeline
    from gaussmart_tpu.scene import Scene
    from gaussmart_tpu.config import ModelParams

    scan = tmp_path / "scan"
    os.makedirs(scan / "images")
    os.makedirs(scan / "sparse" / "0")

    rows = []
    for i in range(5):
        ang = i * 1.2
        c, s = np.cos(ang), np.sin(ang)
        c2w = np.eye(4)
        c2w[:3, :3] = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]])
        c2w[:3, 3] = [2 * np.sin(ang), 0, -2 * np.cos(ang)]
        rows.append(np.concatenate([c2w.reshape(-1), [80.0]]))
        img = np.zeros((48, 48, 3), np.uint8)
        img[:24] = [220, 40, 40]
        img[24:] = [40, 40, 220]
        Image.fromarray(img).save(scan / "images" / f"{i:03d}.png")
    np.save(scan / "poses_bounds.npy", np.stack(rows))

    pts = rng.normal(scale=0.4, size=(200, 3)).astype(np.float32)
    store_point_cloud(str(scan / "sparse" / "0" / "points3D.ply"), pts,
                      rng.integers(0, 255, (200, 3)).astype(np.float64))

    # also create a COLMAP camera model so Scene() can load the scan
    import struct
    sparse = scan / "sparse" / "0"
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, 48, 48))
        f.write(struct.pack("<dddd", 40.0, 40.0, 24.0, 24.0))
    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", 2))
        for i in range(2):
            q = np.array([1.0, 0, 0, 0])
            t = np.array([0.05 * i, 0, 2.0])
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(f"{i:03d}.png".encode() + b"\x00")
            f.write(struct.pack("<Q", 0))

    # run the pipeline with output inside a temp CWD-relative layout
    workdir = tmp_path / "work"
    os.makedirs(workdir)
    monkeypatch.chdir(workdir)
    pipe = Pipeline(str(scan), str(workdir / "identification" / "results"),
                    "nerf", mask_backend="classical")
    seg, areas = pipe.run(clean_pc=False)
    assert (workdir / "identification" / "results" / "segments"
            / "point_cloud" / "segmented_point_cloud.ply").exists()

    # Scene must pick up the cleaned+segmented cloud and mask areas
    args = ModelParams(source_path=str(scan),
                       model_path=str(tmp_path / "out"), sh_degree=1,
                       resolution=1)
    scene = Scene(args, capacity=4096, seed=0)
    info = scene.info
    assert "segmented_point_cloud" in info.ply_path
    assert len(info.point_cloud.segments) == len(info.point_cloud.points)
    # any segment id seen by the reader matches the pipeline output
    np.testing.assert_array_equal(info.point_cloud.segments, seg)
    if areas:
        assert info.point_cloud.mask_areas  # dict round-trips through .npy
        # augmentation ran when mask areas exist
        assert int(scene.gaussians.n_active) >= len(pts)
