import os

import numpy as np

from gaussmart_tpu.eval.cull import cull_mesh_by_masks, load_K_Rt_from_P
from gaussmart_tpu.mesh.meshing import TriMesh


def test_load_K_Rt_roundtrip():
    K = np.array([[800.0, 0, 320], [0, 800, 240], [0, 0, 1]])
    ang = 0.4
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    t = np.array([0.3, -0.1, 2.0])
    w2c = np.eye(4)
    w2c[:3, :3] = R
    w2c[:3, 3] = t
    P = K @ w2c[:3]
    intr, pose = load_K_Rt_from_P(P)
    np.testing.assert_allclose(intr[:3, :3], K, atol=1e-6)
    np.testing.assert_allclose(np.linalg.inv(pose), w2c, atol=1e-6)


def test_cull_removes_out_of_mask(tmp_path):
    import cv2

    # camera at origin looking +z, 1600x1200, f=1000
    K = np.array([[1000.0, 0, 800, 0], [0, 1000, 600, 0], [0, 0, 1, 0],
                  [0, 0, 0, 1]])
    w2c = np.eye(4)
    world_mat = K @ w2c        # P convention: world_mat @ scale_mat
    np.savez(tmp_path / "cameras.npz",
             world_mat_0=world_mat.astype(np.float32),
             scale_mat_0=np.eye(4, dtype=np.float32))
    # mask: only left half of image
    mask = np.zeros((1200, 1600, 3), np.uint8)
    mask[:, :800] = 255
    os.makedirs(tmp_path / "mask")
    cv2.imwrite(str(tmp_path / "mask" / "000.png"), mask)

    # two triangles at z=5: one projecting left (x<0), one right (x>1)
    v = np.array([[-2.0, 0, 5], [-2.1, 0.1, 5], [-2.0, 0.1, 5],
                  [2.0, 0, 5], [2.1, 0.1, 5], [2.0, 0.1, 5]])
    f = np.array([[0, 1, 2], [3, 4, 5]])
    mesh = TriMesh(v, f)
    out = cull_mesh_by_masks(mesh, str(tmp_path / "cameras.npz"),
                             str(tmp_path / "mask"), dilation=2)
    assert len(out.faces) == 1
    assert (out.vertices[:, 0] < 0).all()  # left triangle survived
