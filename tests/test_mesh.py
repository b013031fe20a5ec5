"""Mesh subsystem: marching tetrahedra, TSDF fusion, post-processing."""
import numpy as np
import jax.numpy as jnp
import pytest

from gaussmart_tpu.mesh.marching import (marching_tetrahedra,
                                         marching_cubes_with_contraction)
from gaussmart_tpu.mesh.meshing import (TriMesh, post_process_mesh,
                                        save_mesh_ply, load_mesh_ply)
from gaussmart_tpu.mesh.tsdf import TSDFVolume, contract, uncontract
from gaussmart_tpu.cameras import Camera


def sphere_sdf_grid(n=48, r=0.6):
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return np.linalg.norm(g, axis=-1) - r, xs


def test_marching_tet_sphere():
    vol, xs = sphere_sdf_grid()
    sp = xs[1] - xs[0]
    v, f = marching_tetrahedra(vol, 0.0, spacing=(sp, sp, sp),
                               origin=(-1, -1, -1))
    assert len(v) > 1000
    radii = np.linalg.norm(v, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.6, atol=0.01)
    assert radii.std() < 0.01
    # surface area of the welded mesh ~ 4*pi*r^2
    mesh = TriMesh(v, f).merge_vertices()
    tri = mesh.vertices[mesh.faces]
    area = 0.5 * np.linalg.norm(
        np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * 0.6**2, rtol=0.05)


def test_marching_blockwise_matches_single():
    def sdf(p):
        return np.linalg.norm(p, axis=-1) - 0.55

    mesh = marching_cubes_with_contraction(
        sdf, resolution=64, block=32,
        bounding_box_min=(-1, -1, -1), bounding_box_max=(1, 1, 1))
    radii = np.linalg.norm(mesh.vertices, axis=1)
    np.testing.assert_allclose(radii.mean(), 0.55, atol=0.02)


def test_contract_roundtrip(rng):
    x = jnp.asarray(rng.normal(scale=2.0, size=(100, 3)).astype(np.float32))
    y = contract(x)
    assert float(jnp.linalg.norm(y, axis=-1).max()) < 2.0
    back = uncontract(y)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-3)


def test_tsdf_plane():
    """Fuse synthetic depth maps of a fronto-parallel plane at z=2."""
    w = h = 48
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.9, width=w, height=h)
    depth = jnp.full((h, w), 2.0)
    rgb = jnp.full((3, h, w), 0.5)
    vol = TSDFVolume((-1.2, -1.2, 1.0), (1.2, 1.2, 3.0), voxel_size=0.08,
                     sdf_trunc=0.24)
    for _ in range(3):
        vol.integrate(depth, rgb, cam.params(), depth_trunc=4.0)
    mesh = vol.extract_mesh()
    assert len(mesh.vertices) > 50
    # extracted surface lies near z=2 (within a voxel)
    z = mesh.vertices[:, 2]
    assert np.abs(z - 2.0).max() < 0.1
    assert mesh.vertex_colors is not None
    np.testing.assert_allclose(mesh.vertex_colors.mean(), 0.5, atol=0.05)


def test_tsdf_chunked_matches_single(monkeypatch):
    """The lax.map chunked integration (big-grid path) must produce the
    same state as one unchunked pass."""
    import gaussmart_tpu.mesh.tsdf as tsdf_mod

    w = h = 32
    cam = Camera(uid=0, colmap_id=0, image_name="c", R=np.eye(3),
                 T=np.zeros(3), fovx=0.9, fovy=0.9, width=w, height=h)
    rng = np.random.default_rng(0)
    depth = jnp.asarray(2.0 + 0.2 * rng.random((h, w)), jnp.float32)
    rgb = jnp.asarray(rng.random((3, h, w)), jnp.float32)

    def fuse():
        vol = TSDFVolume((-1.2, -1.2, 1.0), (1.2, 1.2, 3.0),
                         voxel_size=0.1, sdf_trunc=0.3)
        vol.integrate(depth, rgb, cam.params(), depth_trunc=4.0)
        return (np.concatenate([np.asarray(t) for t in vol.tsdf]),
                np.concatenate([np.asarray(w) for w in vol.weight]),
                np.concatenate([np.asarray(c) for c in vol.color]))

    ref = fuse()
    monkeypatch.setattr(tsdf_mod, "CHUNK", 4096)  # grid is ~15k voxels
    chunked = fuse()
    for a, b, nm in zip(ref, chunked, ("tsdf", "weight", "color")):
        np.testing.assert_allclose(b, a, atol=1e-6, err_msg=nm)


def test_post_process_keeps_large_cluster():
    vol, xs = sphere_sdf_grid(n=32, r=0.6)
    sp = xs[1] - xs[0]
    v, f = marching_tetrahedra(vol, 0.0, spacing=(sp, sp, sp),
                               origin=(-1, -1, -1))
    mesh = TriMesh(v, f).merge_vertices()
    # add a tiny floater triangle far away
    nv = len(mesh.vertices)
    mesh.vertices = np.concatenate(
        [mesh.vertices, [[5, 5, 5], [5.1, 5, 5], [5, 5.1, 5]]])
    mesh.faces = np.concatenate([mesh.faces, [[nv, nv + 1, nv + 2]]])
    out = post_process_mesh(mesh, cluster_to_keep=1)
    assert (np.abs(out.vertices) < 2).all()   # floater removed


def test_mesh_ply_roundtrip(tmp_path):
    v = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1.0]])
    f = np.array([[0, 1, 2], [0, 2, 3]])
    c = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 0.0]])
    p = str(tmp_path / "m.ply")
    save_mesh_ply(p, TriMesh(v, f, c))
    m = load_mesh_ply(p)
    np.testing.assert_allclose(m.vertices, v, atol=1e-6)
    np.testing.assert_array_equal(m.faces, f)
    np.testing.assert_allclose(m.vertex_colors, c, atol=0.01)
