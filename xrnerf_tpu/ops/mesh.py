"""Mesh queries: nearest point on mesh, inside test, ray any-hit.

TPU-native replacement for the reference's ``extensions/mesh_grid`` CUDA
module (``/root/reference/extensions/mesh_grid/mesh_grid.cpp:4-27``,
``mesh_grid_kernel.cu``: ``search_nearest_point`` :242-357,
``search_inside_mesh`` :516-590, ``search_intersect`` :977-1180) and its
``MeshGridSearcher`` python wrapper (``mesh_grid_searcher.py:6-59``).

TPU-first design: instead of a uniform-grid acceleration structure walked
with data-dependent loops (a bad fit for the VPU), every query is a dense
[P_chunk, T] computation — point-triangle distances are pure
elementwise/reduction work that XLA tiles onto the VPU, and at SMPL scale
(~13.8k triangles) a [4096, 13776] tile is a few hundred MB-flops, far
cheaper than the divergent traversal it replaces. The inside test uses
the generalized winding number (sum of signed solid angles), which is
watertight-robust and embarrassingly parallel, where the reference walks
a grid ray and counts crossings.

All entry points are jit-compatible and chunk over query points with
``lax.map`` to bound VMEM.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _pad_chunk(x: jnp.ndarray, chunk: int) -> Tuple[jnp.ndarray, int]:
    n = x.shape[0]
    pad = (-n) % chunk
    if pad:
        x = jnp.concatenate([x, jnp.broadcast_to(x[-1:], (pad,) + x.shape[1:])], 0)
    return x, n


def closest_point_triangle(
    p: jnp.ndarray,  # [..., 3]
    a: jnp.ndarray,  # [..., 3] triangle vertices (broadcastable)
    b: jnp.ndarray,
    c: jnp.ndarray,
) -> jnp.ndarray:
    """Closest point on triangle abc to p (Ericson RTCD 5.1.5, branchless)."""
    ab = b - a
    ac = c - a
    ap = p - a

    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    # face region barycentrics
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom = va + vb + vc
    v_face = vb / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
    w_face = vc / jnp.where(jnp.abs(denom) > 1e-20, denom, 1e-20)
    face = a + v_face[..., None] * ab + w_face[..., None] * ac

    # edge/vertex regions override, innermost-first selection
    v_ab = d1 / jnp.where(jnp.abs(d1 - d3) > 1e-20, d1 - d3, 1e-20)
    on_ab = a + jnp.clip(v_ab, 0.0, 1.0)[..., None] * ab
    w_ac = d2 / jnp.where(jnp.abs(d2 - d6) > 1e-20, d2 - d6, 1e-20)
    on_ac = a + jnp.clip(w_ac, 0.0, 1.0)[..., None] * ac
    t_bc = (d4 - d3) / jnp.where(
        jnp.abs((d4 - d3) + (d5 - d6)) > 1e-20, (d4 - d3) + (d5 - d6), 1e-20
    )
    on_bc = b + jnp.clip(t_bc, 0.0, 1.0)[..., None] * (c - b)

    out = face
    out = jnp.where((vc <= 0)[..., None] & (d1 >= 0)[..., None] & (d3 <= 0)[..., None], on_ab, out)
    out = jnp.where((vb <= 0)[..., None] & (d2 >= 0)[..., None] & (d6 <= 0)[..., None], on_ac, out)
    out = jnp.where(
        (va <= 0)[..., None] & ((d4 - d3) >= 0)[..., None] & ((d5 - d6) >= 0)[..., None],
        on_bc,
        out,
    )
    out = jnp.where((d1 <= 0)[..., None] & (d2 <= 0)[..., None], a, out)
    out = jnp.where((d3 >= 0)[..., None] & (d4 <= d3)[..., None], b, out)
    out = jnp.where((d6 >= 0)[..., None] & (d5 <= d6)[..., None], c, out)
    return out


@partial(jax.jit, static_argnames=("chunk",))
def nearest_points(
    pts: jnp.ndarray,  # [P, 3]
    verts: jnp.ndarray,  # [V, 3]
    faces: jnp.ndarray,  # [T, 3] int
    chunk: int = 2048,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """-> (closest point [P,3], face index [P], distance [P])."""
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]

    def one_chunk(p):
        cp = closest_point_triangle(p[:, None, :], a[None], b[None], c[None])
        d2 = jnp.sum((p[:, None, :] - cp) ** 2, -1)  # [chunk, T]
        idx = jnp.argmin(d2, -1)
        best = jnp.take_along_axis(cp, idx[:, None, None], 1)[:, 0]
        return best, idx, jnp.sqrt(jnp.take_along_axis(d2, idx[:, None], 1)[:, 0])

    padded, n = _pad_chunk(pts, chunk)
    best, idx, dist = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    return (
        best.reshape(-1, 3)[:n],
        idx.reshape(-1)[:n].astype(jnp.int32),
        dist.reshape(-1)[:n],
    )


@partial(jax.jit, static_argnames=("chunk",))
def winding_number(
    pts: jnp.ndarray,  # [P, 3]
    verts: jnp.ndarray,  # [V, 3]
    faces: jnp.ndarray,  # [T, 3]
    chunk: int = 2048,
) -> jnp.ndarray:
    """Generalized winding number per point (~1 inside, ~0 outside).

    Sum over triangles of the signed solid angle (van Oosterom–Strackee),
    normalized by 4pi.
    """
    a = verts[faces[:, 0]]
    b = verts[faces[:, 1]]
    c = verts[faces[:, 2]]

    def one_chunk(p):
        ra = a[None] - p[:, None]
        rb = b[None] - p[:, None]
        rc = c[None] - p[:, None]
        la = jnp.linalg.norm(ra, axis=-1)
        lb = jnp.linalg.norm(rb, axis=-1)
        lc = jnp.linalg.norm(rc, axis=-1)
        num = jnp.sum(ra * jnp.cross(rb, rc), -1)
        den = (
            la * lb * lc
            + jnp.sum(ra * rb, -1) * lc
            + jnp.sum(rb * rc, -1) * la
            + jnp.sum(rc * ra, -1) * lb
        )
        return jnp.sum(jnp.arctan2(num, den), -1) / (2.0 * jnp.pi)

    padded, n = _pad_chunk(pts, chunk)
    w = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 3))
    return w.reshape(-1)[:n]


def inside_mesh(pts, verts, faces, chunk: int = 2048) -> jnp.ndarray:
    """+1 inside / -1 outside, matching the reference's sign convention
    (``search_inside_mesh``; consumed as ``(signs+1)/2`` by gnr_render)."""
    w = winding_number(pts, verts, faces, chunk=chunk)
    return jnp.where(w > 0.5, 1.0, -1.0)


@partial(jax.jit, static_argnames=("chunk",))
def ray_mesh_hit(
    origins: jnp.ndarray,  # [R, 3]
    dirs: jnp.ndarray,  # [R, 3] (need not be normalized)
    verts: jnp.ndarray,
    faces: jnp.ndarray,
    t_max: float = jnp.inf,
    chunk: int = 1024,
) -> jnp.ndarray:
    """Any-hit ray-mesh test in t in (eps, t_max) -> bool [R]
    (Moeller-Trumbore; parity of ``search_intersect``)."""
    a = verts[faces[:, 0]]
    e1 = verts[faces[:, 1]] - a
    e2 = verts[faces[:, 2]] - a

    def one_chunk(od):
        o, d = od[:, :3], od[:, 3:]
        pvec = jnp.cross(d[:, None], e2[None])  # [chunk, T, 3]
        det = jnp.sum(e1[None] * pvec, -1)
        inv = 1.0 / jnp.where(jnp.abs(det) > 1e-12, det, 1e-12)
        tvec = o[:, None] - a[None]
        u = jnp.sum(tvec * pvec, -1) * inv
        qvec = jnp.cross(tvec, e1[None])
        v = jnp.sum(d[:, None] * qvec, -1) * inv
        t = jnp.sum(e2[None] * qvec, -1) * inv
        hit = (
            (jnp.abs(det) > 1e-12)
            & (u >= 0)
            & (v >= 0)
            & (u + v <= 1)
            & (t > 1e-6)
            & (t < t_max)
        )
        return jnp.any(hit, -1)

    od = jnp.concatenate([origins, dirs], -1)
    padded, n = _pad_chunk(od, chunk)
    hit = jax.lax.map(one_chunk, padded.reshape(-1, chunk, 6))
    return hit.reshape(-1)[:n]


class MeshSearcher:
    """Stateful wrapper mirroring the reference's ``MeshGridSearcher``
    (``extensions/mesh_grid/mesh_grid_searcher.py:6-59``) API."""

    def __init__(self, verts=None, faces=None):
        self.verts = None
        self.faces = None
        if verts is not None:
            self.set_mesh(verts, faces)

    def set_mesh(self, verts, faces):
        self.verts = jnp.asarray(verts, jnp.float32)
        self.faces = jnp.asarray(faces, jnp.int32)

    def nearest_points(self, pts):
        best, idx, _ = nearest_points(jnp.asarray(pts), self.verts, self.faces)
        return best, idx

    def inside_mesh(self, pts):
        return inside_mesh(jnp.asarray(pts), self.verts, self.faces)

    def intersects(self, origins, dirs, t_max=jnp.inf):
        return ray_mesh_hit(
            jnp.asarray(origins), jnp.asarray(dirs), self.verts, self.faces, t_max
        )
