"""Shared build/load helpers for the native C++ oracle libraries.

Both ctypes bindings (``native_qp.py``, ``native_nlp.py``) compile their sources on
demand with g++ into ``native/build/`` and cache by source mtime; this module keeps
that logic in one place so build flags and staleness rules cannot drift apart.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

NATIVE_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
)


def build_native_lib(lib_name: str, sources: tuple[str, ...]) -> str:
    """Compile ``sources`` (paths relative to ``native/``) into
    ``native/build/<lib_name>`` unless the .so is newer than every source."""
    lib_path = os.path.join(NATIVE_DIR, "build", lib_name)
    srcs = [os.path.join(NATIVE_DIR, s) for s in sources]
    os.makedirs(os.path.dirname(lib_path), exist_ok=True)
    stale = not os.path.exists(lib_path) or any(
        os.path.getmtime(lib_path) < os.path.getmtime(s) for s in srcs
    )
    if stale:
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-o", lib_path, *srcs],
            check=True,
            capture_output=True,
        )
    return lib_path


def load_native_lib(lib_name: str, sources: tuple[str, ...]) -> ctypes.CDLL:
    return ctypes.CDLL(build_native_lib(lib_name, sources))


def ptr(a: np.ndarray):
    """Raw double* for a contiguous float64 array."""
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def c64(a) -> np.ndarray:
    """Contiguous float64 view/copy of any array-like."""
    return np.ascontiguousarray(np.asarray(a, dtype=np.float64))
