"""Render CLI + metrics CLI end-to-end on a trained toy model."""
import json
import os

import numpy as np
import pytest


def test_lpips_architecture_runs(rng):
    import jax.numpy as jnp
    from gaussmart_tpu.eval.lpips_jax import LPIPS, random_params

    for net in ("vgg", "alex"):
        model = LPIPS(random_params(net), net)
        a = jnp.asarray(rng.random((3, 64, 64)), jnp.float32)
        b = jnp.asarray(rng.random((3, 64, 64)), jnp.float32)
        s_ab = float(model(a, b)[0])
        s_aa = float(model(a, a)[0])
        assert np.isfinite(s_ab)
        assert abs(s_aa) < 1e-6          # identical images -> 0
        assert s_ab > s_aa


def test_metrics_cli_schema(tmp_path, rng):
    from PIL import Image
    from gaussmart_tpu.eval.metrics_cli import evaluate

    scene = tmp_path / "model"
    mdir = scene / "test" / "ours_30000"
    os.makedirs(mdir / "renders")
    os.makedirs(mdir / "gt")
    for i in range(2):
        img = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
        Image.fromarray(img).save(mdir / "renders" / f"{i:05d}.png")
        noisy = np.clip(img + rng.normal(0, 8, img.shape), 0, 255).astype(np.uint8)
        Image.fromarray(noisy).save(mdir / "gt" / f"{i:05d}.png")

    full = evaluate([str(scene)], use_lpips=False)
    assert (scene / "results.json").exists()
    assert (scene / "per_view.json").exists()
    res = json.load(open(scene / "results.json"))
    m = res["ours_30000"]
    assert set(m) == {"SSIM", "PSNR", "LPIPS"}
    assert 10 < m["PSNR"] < 50
    pv = json.load(open(scene / "per_view.json"))
    assert len(pv["ours_30000"]["PSNR"]) == 2


@pytest.mark.slow
def test_render_cli_end_to_end(tmp_path, rng):
    """train (30 iters) -> render_cli (images + bounded mesh)."""
    from test_train_cli import blender_scene  # fixture function reuse
    from PIL import Image
    from gaussmart_tpu.io.ply import store_point_cloud
    from gaussmart_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from gaussmart_tpu.train import training, build_parser
    from gaussmart_tpu import render_cli
    from gaussmart_tpu.config import save_cfg

    # --- tiny Blender scene ---
    src = tmp_path / "scene"
    os.makedirs(src / "train")
    frames = []
    for i in range(3):
        img = np.zeros((24, 24, 4), np.uint8)
        img[6:18, 6:18, 1] = 255
        img[:, :, 3] = 255
        Image.fromarray(img, "RGBA").save(src / "train" / f"r_{i}.png")
        ang = 0.15 * i
        c, s = np.cos(ang), np.sin(ang)
        c2w = np.array([[c, 0, s, 0.1 * i], [0, 1, 0, 0],
                        [-s, 0, c, 3.0], [0, 0, 0, 1.0]])
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    pts = rng.uniform(-0.4, 0.4, (48, 3)).astype(np.float32)
    store_point_cloud(str(src / "points3d.ply"), pts,
                      rng.integers(0, 255, (48, 3)).astype(np.float64))

    out = tmp_path / "out"
    dataset = ModelParams(source_path=str(src), model_path=str(out),
                          white_background=True, sh_degree=1, resolution=1,
                          eval=True)
    opt = OptimizationParams(iterations=20, densify_from_iter=100,
                             densify_until_iter=0, opacity_reset_interval=100,
                             position_lr_max_steps=20)
    pipe = PipelineParams(backend="dense")
    training(dataset, opt, pipe, [], [20], [], use_dino_loss=False,
             quiet=True, capacity=128)

    # cfg for get_combined_args
    import argparse
    save_cfg(str(out), argparse.Namespace(
        source_path=str(src), model_path=str(out), white_background=True,
        sh_degree=1, resolution=1, eval=True, images="images"))

    render_cli.main(["-m", str(out), "--iteration", "20",
                     "--mesh_res", "64", "--backend", "dense",
                     "--render_path"])
    it_dir = out / "train" / "ours_20"
    assert (it_dir / "renders" / "00000.png").exists()
    assert (it_dir / "vis" / "normal_00000.png").exists()
    assert (out / "test" / "ours_20" / "renders" / "00000.png").exists()
    assert (it_dir / "fuse.ply").exists()
    assert (it_dir / "fuse_post.ply").exists()

    # trajectory videos: color + depth + normal streams (reference
    # render_utils.py:203-268; its normal stream is dead upstream — we
    # emit all three). Each must decode with the full frame count.
    import cv2
    traj_dir = out / "traj" / "ours_20"
    for name in ("render_traj.mp4", "depth_traj.mp4", "normal_traj.mp4"):
        path = traj_dir / name
        assert path.exists(), name
        cap = cv2.VideoCapture(str(path))
        n_frames = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
        cap.release()
        assert n_frames == 240, (name, n_frames)
