"""Native C++ marching-tetrahedra core vs the numpy oracle."""
import time

import numpy as np
import pytest

from gaussmart_tpu.mesh import native
from gaussmart_tpu.mesh.marching import marching_tetrahedra
from gaussmart_tpu.mesh.meshing import TriMesh


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("no C++ toolchain")
    return native.get_lib()


def sphere(n=40, r=0.6):
    xs = np.linspace(-1, 1, n)
    g = np.stack(np.meshgrid(xs, xs, xs, indexing="ij"), axis=-1)
    return (np.linalg.norm(g, axis=-1) - r).astype(np.float32), xs


def test_native_matches_numpy(lib):
    vol, xs = sphere()
    sp = (xs[1] - xs[0],) * 3
    v_np, f_np = marching_tetrahedra(vol.astype(np.float64), 0.0, sp,
                                     (-1, -1, -1), use_native=False)
    v_nat, f_nat = native.marching_tetrahedra_native(vol, 0.0, sp, (-1, -1, -1))
    assert len(v_nat) == len(v_np)
    # same triangle soup up to ordering: compare sorted centroids
    c_np = np.sort(v_np.reshape(-1, 3, 3).mean(1), axis=0)
    c_nat = np.sort(v_nat.reshape(-1, 3, 3).mean(1), axis=0)
    np.testing.assert_allclose(c_nat, c_np, atol=1e-5)


def test_native_nan_handling(lib):
    vol, xs = sphere(n=24)
    vol[:12] = np.nan  # unobserved half
    v, f = native.marching_tetrahedra_native(vol, 0.0)
    assert np.isfinite(v).all()
    v2, _ = marching_tetrahedra(vol.astype(np.float64), 0.0,
                                use_native=False)
    assert len(v) == len(v2)


def test_native_nan_isolated_corner(lib):
    """A NaN corner must drop only the TETS touching it, not the whole
    cube: the numpy oracle emits the other tets' triangles (a cube-level
    skip cuts holes along every observed/unobserved TSDF boundary)."""
    vol = np.full((2, 2, 2), 1.0, np.float32)
    vol[0, 0, 0] = -1.0
    vol[1, 0, 0] = np.nan       # corner (x=1,y=0,z=0): in 2 of the 6 tets
    v, f = native.marching_tetrahedra_native(vol, 0.0)
    v2, _ = marching_tetrahedra(vol.astype(np.float64), 0.0,
                                use_native=False)
    assert len(v2) > 0, "oracle must emit the NaN-free tets"
    assert len(v) == len(v2), (len(v), len(v2))
    assert np.isfinite(v).all()
    # same triangles modulo ordering
    a = np.sort(np.asarray(v).reshape(-1, 9), axis=0)
    b = np.sort(np.asarray(v2).reshape(-1, 9), axis=0)
    np.testing.assert_allclose(a, b, atol=1e-6)

    # random scattered-NaN volumes: triangle COUNT parity with the oracle
    rng = np.random.default_rng(3)
    for _ in range(3):
        vol = rng.normal(size=(6, 6, 6)).astype(np.float32)
        vol[rng.random((6, 6, 6)) < 0.15] = np.nan
        v, _ = native.marching_tetrahedra_native(vol, 0.0)
        v2, _ = marching_tetrahedra(vol.astype(np.float64), 0.0,
                                    use_native=False)
        assert len(v) == len(v2), (len(v), len(v2))


def test_native_speedup(lib):
    vol, xs = sphere(n=64)
    sp = (xs[1] - xs[0],) * 3
    t0 = time.perf_counter()
    marching_tetrahedra(vol.astype(np.float64), 0.0, sp, (-1, -1, -1),
                        use_native=False)
    t_np = time.perf_counter() - t0
    t0 = time.perf_counter()
    native.marching_tetrahedra_native(vol, 0.0, sp, (-1, -1, -1))
    t_nat = time.perf_counter() - t0
    print(f"numpy {t_np*1e3:.1f}ms native {t_nat*1e3:.1f}ms")
    assert t_nat < t_np
