"""Integration: the full training driver on a tiny synthetic Blender scene."""
import json
import os

import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full training driver runs — run via the full suite


from gaussmart_tpu.io.ply import store_point_cloud


@pytest.fixture
def blender_scene(tmp_path, rng):
    from PIL import Image

    src = tmp_path / "scene"
    os.makedirs(src / "train")
    frames = []
    for i in range(4):
        img = np.zeros((24, 24, 4), np.uint8)
        img[6:18, 6:18, 0] = 255
        img[:, :, 3] = 255
        Image.fromarray(img, "RGBA").save(src / "train" / f"r_{i}.png")
        ang = 0.1 * i
        c, s = np.cos(ang), np.sin(ang)
        c2w = np.array([[c, 0, s, 0.1 * i], [0, 1, 0, 0],
                        [-s, 0, c, 3.0], [0, 0, 0, 1.0]])
        # blender convention: z back — flip to look at origin region
        frames.append({"file_path": f"train/r_{i}",
                       "transform_matrix": c2w.tolist()})
    for split in ("train", "test"):
        with open(src / f"transforms_{split}.json", "w") as f:
            json.dump({"camera_angle_x": 0.8, "frames": frames}, f)
    # small init cloud so the smoke test stays fast
    pts = rng.uniform(-0.5, 0.5, (64, 3)).astype(np.float32)
    store_point_cloud(str(src / "points3d.ply"), pts,
                      rng.integers(0, 255, (64, 3)).astype(np.float64))
    return src


def test_training_driver_runs(tmp_path, blender_scene):
    from gaussmart_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from gaussmart_tpu.train import training

    dataset = ModelParams(source_path=str(blender_scene),
                          model_path=str(tmp_path / "out"),
                          white_background=True, sh_degree=1, resolution=1)
    # schedule compressed to 30 iters; opacity resets are kept clear of the
    # next prune pass (in the real 30k schedule there are >=100 recovery
    # iterations between reset and the next densify)
    opt = OptimizationParams(
        iterations=30, densify_from_iter=5, densify_until_iter=25,
        densification_interval=10, opacity_reset_interval=40,
        opacity_cull=0.005, position_lr_max_steps=30)
    pipe = PipelineParams(backend="dense")
    state, adam = training(
        dataset, opt, pipe, testing_iterations=[30], saving_iterations=[30],
        checkpoint_iterations=[30], use_dino_loss=False, quiet=True,
        capacity=256)

    out = tmp_path / "out"
    assert (out / "point_cloud" / "iteration_30" / "point_cloud.ply").exists()
    assert (out / "chkpnt30.npz").exists()
    assert (out / "eval_30.json").exists()
    assert (out / "dino_loss_log.csv").exists()
    assert int(state.n_active) > 0

    # resume path
    opt2 = OptimizationParams(
        iterations=32, densify_from_iter=5, densify_until_iter=25,
        densification_interval=10, opacity_reset_interval=40,
        opacity_cull=0.005, position_lr_max_steps=30)
    training(dataset, opt2, pipe, [], [32], [],
             start_checkpoint=str(out / "chkpnt30.npz"),
             use_dino_loss=False, quiet=True, capacity=256)
    assert (out / "point_cloud" / "iteration_32" / "point_cloud.ply").exists()


def test_training_with_dino_loss(tmp_path, blender_scene, monkeypatch):
    """The differentiable DINO term runs INSIDE the jitted train step
    (compute + VJP through the ViT into the render) — training-time
    evidence for the `fixed` mode, using the random-weight escape hatch
    since real weights need egress (reference train.py:370-373 gates the
    term past iter 3000; here dino_start_iter=0 so every step pays it)."""
    import csv

    from gaussmart_tpu.config import ModelParams, OptimizationParams, PipelineParams
    from gaussmart_tpu.train import training

    monkeypatch.setenv("GAUSSMART_DINO_WEIGHTS", "random")
    dataset = ModelParams(source_path=str(blender_scene),
                          model_path=str(tmp_path / "out_dino"),
                          white_background=True, sh_degree=1, resolution=1)
    opt = OptimizationParams(
        iterations=10, densify_from_iter=100, densify_until_iter=100,
        densification_interval=10, opacity_reset_interval=40,
        opacity_cull=0.005, position_lr_max_steps=10)
    training(dataset, opt, PipelineParams(backend="dense"), [], [10], [],
             use_dino_loss=True, dino_start_iter=0, dino_mode="fixed",
             quiet=True, capacity=256)

    with open(tmp_path / "out_dino" / "dino_loss_log.csv") as f:
        rows = list(csv.DictReader(f))
    assert rows, "no loss log rows"
    dino = [float(r["dino_loss"]) for r in rows]
    assert any(d != 0.0 for d in dino), "DINO term never contributed"
    assert all(np.isfinite(d) for d in dino)


def test_eval_budget_floors_at_train_budget():
    """In-loop eval must never truncate harder than training: the eval
    duplicate budget is the generous default floored elementwise at the
    loop's current adaptive (max_dup, work_mult)."""
    from gaussmart_tpu.train import eval_budget

    assert eval_budget(None) == (64, 12)
    assert eval_budget((16, 3)) == (64, 12)        # default already looser
    assert eval_budget((128, 24)) == (128, 24)     # escalated scene
    assert eval_budget((128, 6)) == (128, 12)      # elementwise max
