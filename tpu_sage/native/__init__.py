"""ctypes bindings for the native ETL core, with transparent fallback.

``load()`` compiles ``graph_builder.cpp`` with g++ on first use (cached next
to the source; rebuilt when the source is newer) and exposes:

- ``build_padded_adjacency(edges, n_nodes, max_degree, seed, symmetrize)``
- ``random_walks(adj, degrees, starts, n_walks, walk_len, seed)``

If no C++ toolchain is available the callers fall back to the numpy
implementations (``tpu_sage.graph.graph_data`` / on-device walks) — the
native path is a host-ETL accelerator, never a correctness dependency.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Optional, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "graph_builder.cpp")
_LIB = os.path.join(_HERE, "libtpusage_native.so")

_lib: Optional[ctypes.CDLL] = None
_load_failed = False


def _compile() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
             _SRC, "-o", _LIB],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """Load (compiling if needed); returns None when unavailable."""
    global _lib, _load_failed
    if _lib is not None:
        return _lib
    if _load_failed:
        return None
    needs_build = (not os.path.exists(_LIB)) or (
        os.path.getmtime(_SRC) > os.path.getmtime(_LIB)
    )
    if needs_build and not _compile():
        _load_failed = True
        return None
    try:
        lib = ctypes.CDLL(_LIB)
    except OSError:
        _load_failed = True
        return None

    lib.build_padded_adjacency.restype = ctypes.c_int
    lib.build_padded_adjacency.argtypes = [
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
    ]
    lib.random_walks.restype = ctypes.c_int
    lib.random_walks.argtypes = [
        ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int32,
        ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
        ctypes.c_int32, ctypes.c_int32, ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_int32),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return load() is not None


def _ptr(a: np.ndarray, ct):
    return a.ctypes.data_as(ctypes.POINTER(ct))


def build_padded_adjacency(
    edges: np.ndarray, n_nodes: int, max_degree: int,
    seed: int = 0, symmetrize: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Native padded-adjacency build; raises RuntimeError if lib missing
    (callers should check ``available()`` or use the numpy builder)."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable; use the numpy builder")
    edges = np.ascontiguousarray(np.asarray(edges, dtype=np.int64).reshape(-1, 2))
    adj = np.empty((n_nodes, max_degree), dtype=np.int32)
    deg = np.empty((n_nodes,), dtype=np.int32)
    rc = lib.build_padded_adjacency(
        _ptr(edges, ctypes.c_int64), edges.shape[0], n_nodes,
        max_degree, int(symmetrize), seed,
        _ptr(adj, ctypes.c_int32), _ptr(deg, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError(f"build_padded_adjacency failed with code {rc}")
    return adj, deg


def random_walks(
    adj: np.ndarray, degrees: np.ndarray, starts: np.ndarray,
    n_walks: int, walk_len: int, seed: int = 0,
) -> np.ndarray:
    """Native walk corpus: (n_starts, n_walks, walk_len+1) int32."""
    lib = load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    adj = np.ascontiguousarray(adj, dtype=np.int32)
    degrees = np.ascontiguousarray(degrees, dtype=np.int32)
    starts = np.ascontiguousarray(np.asarray(starts, dtype=np.int64))
    out = np.empty((len(starts), n_walks, walk_len + 1), dtype=np.int32)
    rc = lib.random_walks(
        _ptr(adj, ctypes.c_int32), _ptr(degrees, ctypes.c_int32),
        adj.shape[0], adj.shape[1],
        _ptr(starts, ctypes.c_int64), len(starts),
        n_walks, walk_len, seed, _ptr(out, ctypes.c_int32),
    )
    if rc != 0:
        raise ValueError(f"random_walks failed with code {rc}")
    return out
