"""DTU Chamfer + TnT F-score evaluation math."""
import numpy as np
import pytest

from gaussmart_tpu.eval.chamfer import (sample_mesh_surface, radius_downsample,
                                        dtu_chamfer)
from gaussmart_tpu.eval.tnt_fscore import (umeyama, icp_refine,
                                           evaluate_histogram,
                                           voxel_downsample, run_evaluation,
                                           read_trajectory, write_trajectory,
                                           CameraPose, _points_in_polygon)
from gaussmart_tpu.mesh.meshing import TriMesh


def unit_quad_mesh(n=1):
    v = np.array([[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0.0]])
    f = np.array([[0, 1, 2], [0, 2, 3]])
    return TriMesh(v, f)


def test_surface_sampling_density():
    mesh = unit_quad_mesh()
    pts = sample_mesh_surface(mesh, thresh=0.05)
    # unit square at 0.05 spacing -> ~400 samples
    assert 200 < len(pts) < 2000
    assert np.abs(pts[:, 2]).max() < 1e-9
    assert (pts[:, :2] >= -1e-9).all() and (pts[:, :2] <= 1 + 1e-9).all()


def test_radius_downsample_spacing(rng):
    pts = rng.random((2000, 3))
    down = radius_downsample(pts, 0.2)
    from scipy.spatial import cKDTree
    d, _ = cKDTree(down).query(down, k=2)
    assert d[:, 1].min() >= 0.2 - 1e-9
    assert len(down) < len(pts)


def test_chamfer_identical_and_shifted(rng):
    pts = rng.random((3000, 3)) * 10
    res = dtu_chamfer(pts, pts.copy())
    assert res["overall"] < 1e-9
    res2 = dtu_chamfer(pts + np.array([0.5, 0, 0]), pts)
    assert 0.3 < res2["overall"] <= 0.5 + 1e-6


def test_umeyama_recovers_similarity(rng):
    src = rng.random((100, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    dst = 2.5 * src @ R.T + np.array([1, -2, 3])
    T = umeyama(src, dst)
    out = src @ T[:3, :3].T + T[:3, 3]
    np.testing.assert_allclose(out, dst, atol=1e-8)


def test_icp_converges(rng):
    pts = rng.random((800, 3))
    ang = 0.05
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    moved = pts @ R.T + np.array([0.02, -0.01, 0.03])
    T = icp_refine(moved, pts, threshold=0.3, iters=30)
    out = moved @ T[:3, :3].T + T[:3, 3]
    assert np.abs(out - pts).mean() < 0.01


def test_fscore_metric(rng):
    pts = rng.random((5000, 3))
    res = evaluate_histogram(pts, pts, tau=0.01)
    assert res["fscore"] == 100.0
    far = pts + 1.0
    res2 = evaluate_histogram(far, pts, tau=0.01)
    assert res2["fscore"] == 0.0


def test_voxel_downsample():
    pts = np.array([[0.01, 0, 0], [0.02, 0, 0], [1.5, 0, 0]])
    out = voxel_downsample(pts, 0.5)
    assert len(out) == 2


def test_polygon_crop():
    poly = np.array([[0, 0], [2, 0], [2, 2], [0, 2.0]])
    pts = np.array([[1, 1], [3, 1], [-0.5, 0.5]])
    inside = _points_in_polygon(pts, poly)
    np.testing.assert_array_equal(inside, [True, False, False])


def test_trajectory_io_roundtrip(tmp_path):
    traj = [CameraPose([0, 0, 1], np.arange(16, dtype=float).reshape(4, 4)),
            CameraPose([1, 1, 2], np.eye(4))]
    p = str(tmp_path / "t.log")
    write_trajectory(traj, p)
    out = read_trajectory(p)
    assert len(out) == 2
    np.testing.assert_allclose(out[0].pose,
                               np.arange(16, dtype=float).reshape(4, 4))
    assert out[1].metadata == [1, 1, 2]


def test_run_evaluation_full_protocol(rng):
    gt = rng.random((4000, 3)) * 2
    ang = 0.3
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    rec = 1.5 * gt @ R.T + np.array([3, 1, -2])   # similarity-misaligned copy
    # trajectories: camera centers are corresponding points
    traj_gt = [CameraPose([i, i, i + 1], _pose_at(gt[i])) for i in range(30)]
    traj_est = [CameraPose([i, i, i + 1],
                           _pose_at(1.5 * gt[i] @ R.T + np.array([3, 1, -2])))
                for i in range(30)]
    res = run_evaluation(rec, gt, "TestScene", traj_est=traj_est,
                         traj_gt=traj_gt, tau=0.05)
    assert res["fscore"] > 95.0


def _pose_at(center):
    T = np.eye(4)
    T[:3, 3] = center
    return T
