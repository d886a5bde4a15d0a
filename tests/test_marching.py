"""Marching-tetrahedra isosurface extraction + smoothing tests, and the
GNR mesh-reconstruction driver on an analytic density field."""

import numpy as np
import pytest

from xrnerf_tpu.ops.marching import (
    laplacian_smooth,
    marching_tetrahedra,
    vertex_normals,
)


def sphere_volume(n=32, radius=10.0):
    lin = np.arange(n) - n / 2
    x, y, z = np.meshgrid(lin, lin, lin, indexing="ij")
    # occupancy-style field: 1 inside, 0 outside, smooth at the boundary
    d = radius - np.sqrt(x * x + y * y + z * z)
    return 1.0 / (1.0 + np.exp(-d)), n


def test_marching_tets_sphere():
    vol, n = sphere_volume()
    verts, faces = marching_tetrahedra(vol, level=0.5)
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts - n / 2, axis=-1)
    # all vertices near the radius-10 shell
    assert abs(r.mean() - 10.0) < 0.5
    assert r.std() < 0.5
    # closed surface: every edge shared by exactly two faces
    edges = {}
    for f in faces:
        for e in ((f[0], f[1]), (f[1], f[2]), (f[2], f[0])):
            k = tuple(sorted(e))
            edges[k] = edges.get(k, 0) + 1
    counts = np.asarray(list(edges.values()))
    assert (counts == 2).mean() > 0.99


def test_marching_tets_empty():
    vol = np.zeros((8, 8, 8))
    verts, faces = marching_tetrahedra(vol, 0.5)
    assert len(verts) == 0 and len(faces) == 0


def test_laplacian_smooth_shrinks_noise():
    vol, n = sphere_volume()
    verts, faces = marching_tetrahedra(vol, 0.5)
    rng = np.random.RandomState(0)
    noisy = verts + 0.2 * rng.randn(*verts.shape).astype(np.float32)
    sm = laplacian_smooth(noisy, faces, iterations=5)
    r_noisy = np.linalg.norm(noisy - n / 2, axis=-1)
    r_sm = np.linalg.norm(sm - n / 2, axis=-1)
    assert r_sm.std() < r_noisy.std()


def test_vertex_normals_point_outward():
    vol, n = sphere_volume()
    verts, faces = marching_tetrahedra(vol, 0.5)
    vn = vertex_normals(verts, faces)
    radial = (verts - n / 2) / np.linalg.norm(verts - n / 2, axis=-1, keepdims=True)
    dots = np.abs(np.sum(vn * radial, -1))
    # normals are radial (sign may flip with winding, magnitude must align)
    assert dots.mean() > 0.9


def test_reconstruct_gnr_driver():
    import jax.numpy as jnp

    from xrnerf_tpu.models.renders.gnr_render import reconstruct_gnr

    center = np.array([0.3, -0.2, 0.1], np.float32)
    spatial_freq = 64.0  # world extent = load_size/2/freq = 0.5
    world_r = 0.25

    def density(pts):
        d = world_r - jnp.linalg.norm(pts - center, axis=-1)
        return 1.0 / (1.0 + jnp.exp(-d * 200.0))

    def color(pts, normals):
        return jnp.clip(0.5 * (normals + 1.0), 0, 1)

    verts, faces, rgbs = reconstruct_gnr(
        density, color, center, spatial_freq, load_size=64, n_grid=32,
        chunk=8192, laplacian=2,
    )
    assert len(verts) > 50
    r = np.linalg.norm(verts - center, axis=-1)
    assert abs(r.mean() - world_r) < 0.05
    assert rgbs.shape == (len(verts), 3)
    assert np.all(rgbs >= 0) and np.all(rgbs <= 1)
