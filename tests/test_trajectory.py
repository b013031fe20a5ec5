"""Novel-view trajectory + video export (utils/render_utils.py parity).

The reference writes H.264 via mediapy/ffmpeg (render_utils.py:203-268);
this build uses cv2 with an avc1 -> mp4v codec preference. The round-trip
test pins that the emitted .mp4 is decodable with the right frame count and
approximate content, whatever encoder the image provides.
"""
import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

from gaussmart_tpu.cameras import Camera
from gaussmart_tpu.trajectory import (create_video, generate_path,
                                      transform_poses_pca)


def ring_cameras(n=8, radius=3.0):
    cams = []
    for i in range(n):
        a = 2 * np.pi * i / n
        eye = np.array([radius * np.cos(a), 0.4, radius * np.sin(a)])
        fwd = -eye / np.linalg.norm(eye)
        up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        upn = np.cross(fwd, right)
        R_c2w = np.stack([right, upn, fwd], axis=1)
        R = R_c2w  # Camera takes world->cam rotation transposed internally
        T = -R_c2w.T @ eye
        cams.append(Camera(uid=i, colmap_id=i, image_name=f"r{i}",
                           R=R, T=T, fovx=0.9, fovy=0.7, width=64, height=48))
    return cams


def test_generate_path_count_and_validity():
    cams = ring_cameras()
    traj = generate_path(cams, n_frames=24)
    assert len(traj) == 24
    for c in traj:
        assert c.width == 64 and c.height == 48
        # valid rigid transform
        R = np.asarray(c.R)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)


def test_transform_poses_pca_recenters():
    from gaussmart_tpu.trajectory import cameras_c2w
    cams = ring_cameras()
    c2w = cameras_c2w(cams)[:, :3]
    poses, transform = transform_poses_pca(c2w)
    t = poses[:, :3, 3]
    # recentred: mean position ~0
    assert np.abs(t.mean(axis=0)).max() < 0.3
    # principal axes aligned to XYZ: the ring lies in a plane, so the
    # last axis (smallest eigenvalue) carries ~no variance
    var = t.var(axis=0)
    assert var[2] < 1e-6 * max(var[0], var[1])


def test_create_video_roundtrip(tmp_path):
    frames = [np.full((48, 64, 3), i / 10.0, np.float32) for i in range(10)]
    p = str(tmp_path / "traj.mp4")
    create_video(frames, p, fps=24)
    cap = cv2.VideoCapture(p)
    assert cap.isOpened()
    n = int(cap.get(cv2.CAP_PROP_FRAME_COUNT))
    ok, first = cap.read()
    cap.release()
    assert n == 10 and ok
    assert first.shape == (48, 64, 3)
    # first frame is black-ish, content preserved within codec loss
    assert first.mean() < 30
