"""Native (C++) host-side components.

The reference's runtime outside the physics hot path is C++ too (MJCF
importer, TinyRenderer); here the TPU compute path is JAX/Pallas and the
host-side renderer is a small C++ ray tracer compiled on first use with
the system toolchain and loaded via ctypes (no pybind11 dependency).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_DIR = os.path.dirname(__file__)
_SRC = os.path.join(_DIR, "render.cpp")
_LIB_CACHE = None


def _build(out_path: str) -> None:
    subprocess.run(
        ["g++", "-O2", "-shared", "-fPIC", "-o", out_path, _SRC],
        check=True, capture_output=True,
    )


def load_render_lib():
    """Compile (once) and load librender.so. Returns None when no C++
    toolchain is available — callers fall back to the numpy renderer."""
    global _LIB_CACHE
    if _LIB_CACHE is not None:
        return _LIB_CACHE or None
    so = os.path.join(_DIR, "librender.so")
    try:
        if (not os.path.exists(so)
                or os.path.getmtime(so) < os.path.getmtime(_SRC)):
            # build into a temp file then atomically move into place, so
            # concurrent imports never load a half-written .so
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
            os.close(fd)
            try:
                _build(tmp)
                os.replace(tmp, so)
            finally:
                if os.path.exists(tmp):
                    os.unlink(tmp)
        lib = ctypes.CDLL(so)
        lib.render_rgb.argtypes = [
            ctypes.POINTER(ctypes.c_float), ctypes.c_int,
            ctypes.POINTER(ctypes.c_float), ctypes.c_float,
            ctypes.c_float, ctypes.c_float,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
        ]
        lib.render_rgb.restype = None
        _LIB_CACHE = lib
        return lib
    except Exception:
        _LIB_CACHE = False
        return None
