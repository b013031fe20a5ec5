"""COLMAP-format scene end-to-end through Scene + a few train steps."""
import os
import struct

import numpy as np
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow  # full scene build — run via the full suite



def make_colmap_scene(root, rng, n_imgs=6, w=32, h=24, n_pts=60):
    from PIL import Image
    sparse = root / "sparse" / "0"
    os.makedirs(sparse)
    os.makedirs(root / "images")

    fx = fy = 30.0
    with open(sparse / "cameras.bin", "wb") as f:
        f.write(struct.pack("<Q", 1))
        f.write(struct.pack("<iiQQ", 1, 1, w, h))
        f.write(struct.pack("<dddd", fx, fy, w / 2, h / 2))

    with open(sparse / "images.bin", "wb") as f:
        f.write(struct.pack("<Q", n_imgs))
        for i in range(n_imgs):
            ang = 0.1 * i
            # qvec for rotation about y
            q = np.array([np.cos(ang / 2), 0, np.sin(ang / 2), 0])
            t = np.array([0.05 * i, 0.0, 2.5])
            name = f"im_{i:03d}.png"
            f.write(struct.pack("<idddddddi", i + 1, *q, *t, 1))
            f.write(name.encode() + b"\x00")
            f.write(struct.pack("<Q", 0))
            img = (rng.random((h, w, 3)) * 255).astype(np.uint8)
            Image.fromarray(img).save(root / "images" / name)

    with open(sparse / "points3D.bin", "wb") as f:
        f.write(struct.pack("<Q", n_pts))
        for i in range(n_pts):
            xyz = rng.uniform(-0.5, 0.5, 3)
            xyz[2] += 0.5
            f.write(struct.pack("<QdddBBBd", i, *xyz,
                                *rng.integers(0, 255, 3), 0.5))
            f.write(struct.pack("<Q", 0))


def test_colmap_scene_trains(tmp_path, rng, monkeypatch):
    from gaussmart_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from gaussmart_tpu.scene import Scene
    from gaussmart_tpu.train import training

    monkeypatch.chdir(tmp_path)  # segment artifact lookup is CWD-relative
    src = tmp_path / "scan"
    os.makedirs(src)
    make_colmap_scene(src, rng)

    args = ModelParams(source_path=str(src), model_path=str(tmp_path / "out"),
                       sh_degree=1, resolution=1, eval=True)
    scene = Scene(args, capacity=256, seed=0)
    # llffhold-8 split: 6 cams -> 1 test (idx 0), 5 train
    assert len(scene.get_test_cameras()) == 1
    assert len(scene.get_train_cameras()) == 5
    assert (src / "sparse" / "0" / "points3D.ply").exists()  # bin->ply convert

    opt = OptimizationParams(iterations=10, densify_from_iter=100,
                             densify_until_iter=0, opacity_reset_interval=100,
                             position_lr_max_steps=10)
    pipe = PipelineParams(backend="dense")
    state, _ = training(args, opt, pipe, [], [10], [], use_dino_loss=False,
                        quiet=True, capacity=256, tensorboard=False)
    assert int(state.n_active) > 0
    assert (tmp_path / "out" / "point_cloud" / "iteration_10"
            / "point_cloud.ply").exists()
