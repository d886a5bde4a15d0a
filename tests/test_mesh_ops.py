"""Mesh query op tests (nearest point / winding inside / ray hit) against
analytically-known geometry. Mirrors the reference's
extensions/mesh_grid/test_mesh_grid.py, which compared against trimesh."""

import numpy as np
import pytest

from xrnerf_tpu.ops.mesh import (
    MeshSearcher,
    inside_mesh,
    nearest_points,
    ray_mesh_hit,
    winding_number,
)


def make_cube():
    """Unit cube [-1,1]^3 as 12 triangles with outward orientation."""
    v = np.array(
        [
            [-1, -1, -1], [1, -1, -1], [1, 1, -1], [-1, 1, -1],
            [-1, -1, 1], [1, -1, 1], [1, 1, 1], [-1, 1, 1],
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # z=-1 (normal -z)
            [4, 5, 6], [4, 6, 7],  # z=+1
            [0, 1, 5], [0, 5, 4],  # y=-1
            [2, 3, 7], [2, 7, 6],  # y=+1
            [0, 4, 7], [0, 7, 3],  # x=-1
            [1, 2, 6], [1, 6, 5],  # x=+1
        ],
        np.int32,
    )
    return v, f


def test_nearest_point_on_cube():
    v, f = make_cube()
    pts = np.array(
        [
            [0.0, 0.0, 2.0],   # above top face -> (0,0,1)
            [3.0, 0.0, 0.0],   # right of +x face -> (1,0,0)
            [2.0, 2.0, 2.0],   # outside corner -> (1,1,1)
            [0.5, 0.5, 0.5],   # inside, closest face pt
        ],
        np.float32,
    )
    best, idx, dist = nearest_points(pts, v, f, chunk=4)
    np.testing.assert_allclose(best[0], [0, 0, 1], atol=1e-5)
    np.testing.assert_allclose(best[1], [1, 0, 0], atol=1e-5)
    np.testing.assert_allclose(best[2], [1, 1, 1], atol=1e-5)
    np.testing.assert_allclose(dist[:3], [1.0, 2.0, np.sqrt(3)], atol=1e-5)
    assert dist[3] == pytest.approx(0.5, abs=1e-5)


def test_winding_inside_cube():
    v, f = make_cube()
    rng = np.random.RandomState(0)
    inside_pts = rng.uniform(-0.9, 0.9, (64, 3)).astype(np.float32)
    outside_pts = inside_pts + np.array([3.0, 0, 0], np.float32)
    w_in = np.asarray(winding_number(inside_pts, v, f, chunk=64))
    w_out = np.asarray(winding_number(outside_pts, v, f, chunk=64))
    np.testing.assert_allclose(w_in, 1.0, atol=1e-4)
    np.testing.assert_allclose(w_out, 0.0, atol=1e-4)
    s = np.asarray(inside_mesh(np.concatenate([inside_pts, outside_pts]), v, f))
    assert np.all(s[:64] == 1.0) and np.all(s[64:] == -1.0)


def test_ray_hit_cube():
    v, f = make_cube()
    o = np.array([[0, 0, 5.0], [0, 0, 5.0], [5.0, 5.0, 5.0]], np.float32)
    d = np.array([[0, 0, -1.0], [0, 0, 1.0], [-1.0, -1.0, -1.0]], np.float32)
    hit = np.asarray(ray_mesh_hit(o, d, v, f, chunk=4))
    assert hit.tolist() == [True, False, True]
    # t_max cuts off the distant hit (first wall at t=4)
    hit2 = np.asarray(ray_mesh_hit(o[:1], d[:1], v, f, t_max=3.0, chunk=4))
    assert hit2.tolist() == [False]


def test_mesh_searcher_api():
    v, f = make_cube()
    ms = MeshSearcher(v, f)
    best, idx = ms.nearest_points(np.array([[0, 0, 3.0]], np.float32))
    np.testing.assert_allclose(np.asarray(best)[0], [0, 0, 1], atol=1e-5)
    s = np.asarray(ms.inside_mesh(np.array([[0, 0, 0.0], [0, 0, 3.0]], np.float32)))
    assert s[0] == 1.0 and s[1] == -1.0


# ---------------------------------------------------------------------------
# Native (C++) uniform-grid searcher vs the jnp reference implementation
# ---------------------------------------------------------------------------
def test_native_mesh_searcher_matches_jnp():
    from xrnerf_tpu.native.mesh_grid_searcher import NativeMeshSearcher

    v, f = make_cube()
    ms = NativeMeshSearcher(v, f)
    assert ms.native, "native mesh_grid library failed to build"

    rng = np.random.RandomState(0)
    pts = rng.uniform(-2.5, 2.5, (200, 3)).astype(np.float32)

    best_n, idx_n = ms.nearest_points(pts)
    best_j, idx_j, dist_j = nearest_points(pts, v, f, chunk=256)
    # closest points must agree (face index may differ on edges/corners)
    np.testing.assert_allclose(best_n, np.asarray(best_j), atol=1e-4)

    s_n = ms.inside_mesh(pts)
    s_j = np.asarray(inside_mesh(pts, v, f, chunk=256))
    np.testing.assert_array_equal(s_n, s_j)

    o = rng.uniform(-3, 3, (100, 3)).astype(np.float32)
    o[np.all(np.abs(o) < 1.2, axis=1)] += 3.0  # keep origins outside
    d = rng.randn(100, 3).astype(np.float32)
    hit_n = ms.intersects(o, d)
    hit_j = np.asarray(ray_mesh_hit(o, d, v, f, chunk=128))
    assert (hit_n == hit_j).mean() > 0.98  # stepping walk can graze edges


def test_native_mesh_searcher_sphere():
    from xrnerf_tpu.datasets.load.synthetic import make_icosphere
    from xrnerf_tpu.native.mesh_grid_searcher import NativeMeshSearcher

    v, f = make_icosphere(2, 1.0)
    ms = NativeMeshSearcher(v, f)
    rng = np.random.RandomState(1)
    pts = rng.uniform(-1.5, 1.5, (100, 3)).astype(np.float32)
    best, idx = ms.nearest_points(pts)
    # nearest point on a unit sphere mesh is ~radially inward
    r = np.linalg.norm(best, axis=-1)
    np.testing.assert_allclose(r, 1.0, atol=0.08)  # subdiv-2 chords dip to ~0.94
    inside = ms.inside_mesh(pts)
    gt = np.where(np.linalg.norm(pts, axis=-1) < 0.98, 1.0, -1.0)
    sure = np.abs(np.linalg.norm(pts, axis=-1) - 1.0) > 0.05
    assert (inside[sure] == gt[sure]).all()
