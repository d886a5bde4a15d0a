"""Python wrapper over the native uniform-grid mesh searcher.

API parity with the reference's ``MeshGridSearcher``
(``/root/reference/extensions/mesh_grid/mesh_grid_searcher.py:6-59``),
including the density-derived grid resolution. Falls back to the jnp
brute-force queries (ops/mesh.py) when the native library cannot be
built, so callers never need to branch.
"""

from __future__ import annotations

import ctypes
from typing import Optional

import numpy as np

from . import load_mesh_grid


def _c(arr, typ):
    return arr.ctypes.data_as(ctypes.POINTER(typ))


class NativeMeshSearcher:
    """Host-side mesh queries over a uniform triangle grid."""

    def __init__(self, verts=None, faces=None, resolution: int = 0):
        self._lib = load_mesh_grid()
        self._handle = None
        self.resolution = resolution
        self._fallback = None
        if verts is not None:
            self.set_mesh(verts, faces)

    @property
    def native(self) -> bool:
        return self._lib is not None

    def set_mesh(self, verts, faces):
        verts = np.ascontiguousarray(verts, np.float32)
        faces = np.ascontiguousarray(faces, np.int32)
        self.verts, self.faces = verts, faces
        if self._lib is None:
            from ..ops.mesh import MeshSearcher

            self._fallback = MeshSearcher(verts, faces)
            return
        if self._handle is not None:
            self._lib.mg_destroy(self._handle)
        res = self.resolution
        if not res:
            # cell size ~ vertex density (mesh_grid_searcher.py:24-33)
            res = int(np.clip(round(len(verts) ** (1.0 / 3.0)), 4, 64))
        self._res = res
        self._handle = self._lib.mg_create(
            _c(verts, ctypes.c_float), len(verts),
            _c(faces, ctypes.c_int), len(faces), res,
        )

    def nearest_points(self, pts):
        pts = np.ascontiguousarray(pts, np.float32)
        if self._lib is None:
            best, idx = self._fallback.nearest_points(pts)
            return np.asarray(best), np.asarray(idx)
        n = len(pts)
        out_p = np.empty((n, 3), np.float32)
        out_i = np.empty(n, np.int32)
        out_d = np.empty(n, np.float32)
        self._lib.mg_nearest(
            self._handle, _c(pts, ctypes.c_float), n,
            _c(out_p, ctypes.c_float), _c(out_i, ctypes.c_int),
            _c(out_d, ctypes.c_float),
        )
        return out_p, out_i

    def inside_mesh(self, pts):
        pts = np.ascontiguousarray(pts, np.float32)
        if self._lib is None:
            return np.asarray(self._fallback.inside_mesh(pts))
        n = len(pts)
        out = np.empty(n, np.float32)
        self._lib.mg_inside(self._handle, _c(pts, ctypes.c_float), n, _c(out, ctypes.c_float))
        return out

    def intersects(self, origins, dirs, t_max: Optional[np.ndarray] = None):
        origins = np.ascontiguousarray(origins, np.float32)
        dirs = np.ascontiguousarray(dirs, np.float32)
        n = len(origins)
        if t_max is None:
            t_max = np.full(n, np.inf, np.float32)
        t_max = np.ascontiguousarray(np.broadcast_to(t_max, (n,)), np.float32)
        if self._lib is None:
            return np.asarray(self._fallback.intersects(origins, dirs, t_max[0]))
        out = np.empty(n, np.uint8)
        self._lib.mg_intersect(
            self._handle, _c(origins, ctypes.c_float), _c(dirs, ctypes.c_float),
            n, _c(t_max, ctypes.c_float), _c(out, ctypes.c_uint8),
        )
        return out.astype(bool)

    def __del__(self):
        if self._lib is not None and self._handle is not None:
            try:
                self._lib.mg_destroy(self._handle)
            except Exception:
                pass
