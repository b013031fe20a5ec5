"""Rasterizer correctness: geometry, compositing, aux channels, gradients."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gaussmart_tpu.cameras import Camera
from gaussmart_tpu.render import raster_common
from gaussmart_tpu.render.raster_dense import rasterize_pixels
from gaussmart_tpu.ops.sh import rgb2sh


def make_camera(width=32, height=32, fov=0.8, z=0.0):
    """Camera at origin looking down +z (world axes = view axes)."""
    R = np.eye(3)
    T = np.array([0.0, 0.0, z])
    return Camera(uid=0, colmap_id=0, image_name="t", R=R, T=T,
                  fovx=fov, fovy=fov, width=width, height=height)


def make_scene(n, rng, depth_range=(2.0, 4.0), spread=0.6, scale=0.15,
               opacity=None):
    xyz = np.stack([
        rng.uniform(-spread, spread, n),
        rng.uniform(-spread, spread, n),
        rng.uniform(*depth_range, n)], axis=1).astype(np.float32)
    scales = np.full((n, 2), scale, np.float32) * rng.uniform(0.5, 1.5, (n, 2))
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    opac = (np.full(n, 0.8, np.float32) if opacity is None
            else np.full(n, opacity, np.float32))
    colors = rng.random((n, 3)).astype(np.float32)
    shs = np.zeros((n, 1, 3), np.float32)
    shs[:, 0] = rgb2sh(colors)
    return (jnp.asarray(xyz), jnp.asarray(scales), jnp.asarray(quats),
            jnp.asarray(opac), jnp.asarray(shs), colors)


def run_render(cam, xyz, scales, quats, opac, shs, bg=None, means2d=None,
               active=None, chunk=8):
    n = xyz.shape[0]
    if bg is None:
        bg = jnp.zeros(3)
    if active is None:
        active = jnp.ones(n, bool)
    prep = raster_common.preprocess(xyz, scales, quats, opac, shs, active,
                                    cam.params(), sh_degree=0)
    if means2d is None:
        means2d = jnp.zeros((n, 2), jnp.float32)
    out = rasterize_pixels(prep, means2d, bg, cam.width, cam.height, chunk=chunk)
    return prep, out


def test_single_splat_center_alpha(rng):
    cam = make_camera()
    xyz = jnp.array([[0.0, 0.0, 3.0]])
    scales = jnp.array([[0.5, 0.5]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.9])
    shs = jnp.asarray(rgb2sh(np.array([[[1.0, 0.2, 0.2]]], np.float32)).transpose(0, 2, 1).reshape(1, 1, 3))
    prep, out = run_render(cam, xyz, scales, quats, opac, shs)

    # center projects to image center
    np.testing.assert_allclose(np.asarray(prep.center2d[0]),
                               [(cam.width - 1) / 2, (cam.height - 1) / 2],
                               atol=1e-3)
    alpha = np.asarray(out["allmap"][1])
    cy, cx = cam.height // 2, cam.width // 2
    # at the exact center the ray hits the splat's center: alpha ~ opacity
    assert alpha[cy, cx] > 0.85
    assert alpha[0, 0] < alpha[cy, cx]
    # median + expected depth at center equal the flat splat's depth
    med = np.asarray(out["allmap"][5])
    exp_depth = np.asarray(out["allmap"][0]) / np.maximum(alpha, 1e-9)
    assert abs(med[cy, cx] - 3.0) < 1e-2
    assert abs(exp_depth[cy, cx] - 3.0) < 1e-2


@pytest.mark.slow
def test_background_blend(rng):
    cam = make_camera()
    xyz, scales, quats, opac, shs, _ = make_scene(1, rng, opacity=0.5)
    bg = jnp.array([0.0, 1.0, 0.0])
    _, out = run_render(cam, xyz, scales, quats, opac, shs, bg=bg)
    img = np.asarray(out["image"])
    alpha = np.asarray(out["allmap"][1])
    # wherever alpha ~ 0 the image equals the background
    mask = alpha < 1e-4
    assert mask.any()
    np.testing.assert_allclose(img[1][mask], 1.0, atol=1e-4)


def test_front_to_back_ordering(rng):
    """A fully opaque near splat must hide a far splat regardless of input order."""
    cam = make_camera()
    scales = jnp.array([[0.8, 0.8], [0.8, 0.8]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([0.99, 0.99])
    col = np.zeros((2, 1, 3), np.float32)
    col[0, 0] = rgb2sh(np.array([1.0, 0.0, 0.0]))   # near = red
    col[1, 0] = rgb2sh(np.array([0.0, 0.0, 1.0]))   # far = blue
    for order in ([0, 1], [1, 0]):
        xyz = jnp.array([[0, 0, 2.0], [0, 0, 5.0]], jnp.float32)[jnp.array(order)]
        shs = jnp.asarray(col[order])
        _, out = run_render(cam, xyz, scales, quats, opac[jnp.array(order)], shs)
        img = np.asarray(out["image"])
        cy, cx = cam.height // 2, cam.width // 2
        assert img[0, cy, cx] > 0.85, "near red splat should dominate"
        assert img[2, cy, cx] < 0.15


@pytest.mark.slow
def test_inactive_splats_ignored(rng):
    cam = make_camera()
    xyz, scales, quats, opac, shs, _ = make_scene(6, rng)
    active = jnp.array([True, True, True, False, False, False])
    _, out_masked = run_render(cam, xyz, scales, quats, opac, shs, active=active)
    _, out_small = run_render(cam, xyz[:3], scales[:3], quats[:3], opac[:3], shs[:3])
    np.testing.assert_allclose(np.asarray(out_masked["image"]),
                               np.asarray(out_small["image"]), atol=1e-5)


@pytest.mark.slow
def test_chunk_size_invariance(rng):
    """Compositing must not depend on the scan chunking."""
    cam = make_camera()
    xyz, scales, quats, opac, shs, _ = make_scene(37, rng)
    outs = []
    for chunk in (4, 16, 64):
        _, out = run_render(cam, xyz, scales, quats, opac, shs, chunk=chunk)
        outs.append(np.asarray(out["image"]))
    np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)
    np.testing.assert_allclose(outs[0], outs[2], atol=1e-5)


@pytest.mark.slow
def test_normal_faces_camera(rng):
    cam = make_camera()
    xyz = jnp.array([[0.0, 0.0, 3.0]])
    scales = jnp.array([[0.5, 0.5]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.95])
    shs = jnp.zeros((1, 1, 3))
    prep, out = run_render(cam, xyz, scales, quats, opac, shs)
    # view-space normal of a camera-facing surfel points toward camera (-z)
    n = np.asarray(prep.normal[0])
    assert n[2] < -0.9


def test_gradients_flow(rng):
    """Finite-difference check on a smooth configuration."""
    cam = make_camera(width=16, height=16)
    xyz, scales, quats, opac, shs, _ = make_scene(5, rng, scale=0.3)
    target = jnp.asarray(rng.random((3, 16, 16)).astype(np.float32))
    bg = jnp.zeros(3)

    def loss(xyz, scales, opac, shs, means2d):
        prep = raster_common.preprocess(
            xyz, scales, quats, opac, shs, jnp.ones(5, bool), cam.params(),
            sh_degree=0)
        out = rasterize_pixels(prep, means2d, bg, 16, 16, chunk=4)
        return jnp.sum((out["image"] - target) ** 2)

    means2d = jnp.zeros((5, 2))
    grads = jax.grad(loss, argnums=(0, 1, 2, 3, 4))(xyz, scales, opac, shs, means2d)
    for g in grads:
        assert np.isfinite(np.asarray(g)).all()
    # all splats visible => non-zero screen-space gradient signal
    assert np.abs(np.asarray(grads[4])).sum() > 0

    # numeric check against finite differences for opacity (smooth param)
    eps = 1e-3
    g_num = np.zeros(5)
    for i in range(5):
        up = opac.at[i].add(eps)
        dn = opac.at[i].add(-eps)
        g_num[i] = (float(loss(xyz, scales, up, shs, means2d))
                    - float(loss(xyz, scales, dn, shs, means2d))) / (2 * eps)
    # fp32 central differences are noisy near the alpha-cutoff
    # discontinuities; large components must match tightly.
    np.testing.assert_allclose(np.asarray(grads[2]), g_num, rtol=2e-2, atol=5e-2)


@pytest.mark.slow
def test_distortion_zero_for_single_splat(rng):
    """Distortion integral is zero when only one surfel contributes."""
    cam = make_camera()
    xyz = jnp.array([[0.0, 0.0, 3.0]])
    scales = jnp.array([[0.5, 0.5]])
    quats = jnp.array([[1.0, 0.0, 0.0, 0.0]])
    opac = jnp.array([0.9])
    shs = jnp.zeros((1, 1, 3))
    _, out = run_render(cam, xyz, scales, quats, opac, shs)
    dist = np.asarray(out["allmap"][6])
    np.testing.assert_allclose(dist, 0.0, atol=1e-6)


def test_two_depth_layers_distort(rng):
    """Two overlapping splats at different depths produce positive distortion."""
    cam = make_camera()
    xyz = jnp.array([[0.0, 0.0, 2.5], [0.0, 0.0, 5.0]])
    scales = jnp.array([[0.6, 0.6], [1.2, 1.2]])
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (2, 1))
    opac = jnp.array([0.5, 0.5])
    shs = jnp.zeros((2, 1, 3))
    _, out = run_render(cam, xyz, scales, quats, opac, shs)
    dist = np.asarray(out["allmap"][6])
    cy, cx = cam.height // 2, cam.width // 2
    assert dist[cy, cx] > 1e-5
