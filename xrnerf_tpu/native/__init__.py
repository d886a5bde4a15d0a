"""Native (C++) host-side runtime components.

Built on demand with the system toolchain and bound via ctypes (no
pybind11 in this environment). Importing this package never fails: if the
compiler or library is unavailable, ``load_mesh_grid()`` returns None and
callers fall back to the jnp implementations in ``ops/mesh.py``.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "mesh_grid.cpp")
_LIB = os.path.join(_DIR, "libmesh_grid.so")

_lib = None
_tried = False


def build(force: bool = False) -> Optional[str]:
    """Compile libmesh_grid.so if missing/stale. Returns the path or None."""
    try:
        if (
            force
            or not os.path.exists(_LIB)
            or os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", _LIB, _SRC],
                check=True,
                capture_output=True,
                timeout=300,
            )
        return _LIB
    except Exception:
        return None


def load_mesh_grid() -> Optional[ctypes.CDLL]:
    """ctypes handle to the mesh-grid library (compiled on first use)."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    path = build()
    if path is None:
        return None
    lib = ctypes.CDLL(path)
    f32p = ctypes.POINTER(ctypes.c_float)
    i32p = ctypes.POINTER(ctypes.c_int)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    lib.mg_create.restype = ctypes.c_void_p
    lib.mg_create.argtypes = [f32p, ctypes.c_int, i32p, ctypes.c_int, ctypes.c_int]
    lib.mg_destroy.argtypes = [ctypes.c_void_p]
    lib.mg_nearest.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p, i32p, f32p]
    lib.mg_inside.argtypes = [ctypes.c_void_p, f32p, ctypes.c_int, f32p]
    lib.mg_intersect.argtypes = [ctypes.c_void_p, f32p, f32p, ctypes.c_int, f32p, u8p]
    _lib = lib
    return _lib
