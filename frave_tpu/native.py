"""ctypes bindings for the native host library (csrc/libfrave_host.so).

The native library accelerates host-side components whose reference
counterparts are native Rust (SURVEY.md section 2: the entire reference is
Rust): currently the fractal-geometry builder. Loading is best-effort —
every native entry point has a pure-Python fallback, so the package works
without a toolchain; `make -C csrc` enables it.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

_LIB_PATHS = (
    os.path.join(os.path.dirname(__file__), "..", "csrc", "build", "libfrave_host.so"),
)

_lib: Optional[ctypes.CDLL] = None
_load_attempted = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _lib, _load_attempted
    if _load_attempted:
        return _lib
    _load_attempted = True
    for p in _LIB_PATHS:
        p = os.path.abspath(p)
        if os.path.exists(p):
            try:
                lib = ctypes.CDLL(p)
                lib.fg_num_tiles.restype = ctypes.c_int64
                lib.fg_num_tiles.argtypes = [ctypes.c_int] * 3
                lib.fg_layer_waves.restype = ctypes.c_int
                lib.fg_layer_waves.argtypes = [
                    ctypes.c_int64,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                ]
                lib.fg_build.restype = ctypes.c_int
                lib.fg_build.argtypes = [
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int,
                    ctypes.c_int64,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                    ctypes.c_void_p,
                ]
                _lib = lib
                break
            except OSError:
                continue
    return _lib


def have_native() -> bool:
    return get_lib() is not None


def build_geometry_native(height: int, width: int, depth: int):
    """Native geometry build; returns a FractalGeometry or None if the
    library is unavailable (caller falls back to the numpy builder)."""
    lib = get_lib()
    if lib is None:
        return None

    import numpy as np

    from .fractal import geometry as G

    T = int(lib.fg_num_tiles(height, width, depth))
    if T < 0:
        raise ValueError(f"native geometry plan failed for {height}x{width}")
    n = 1 << depth

    centers = np.empty((T, 2), dtype=np.int32)
    pixel_gather = np.empty((T, n), dtype=np.int32)
    coef_mask = np.empty((T, n), dtype=np.uint8)
    nbr_idx = np.empty((T * n, 6), dtype=np.int32)
    nbr_par = np.empty((T * n, 6), dtype=np.int32)
    tile_nbr = np.empty((T, 6), dtype=np.int32)
    level_slots_flat = np.empty(T * n, dtype=np.int32)

    rc = lib.fg_build(
        height,
        width,
        depth,
        T,
        centers.ctypes.data,
        pixel_gather.ctypes.data,
        coef_mask.ctypes.data,
        nbr_idx.ctypes.data,
        nbr_par.ctypes.data,
        tile_nbr.ctypes.data,
        level_slots_flat.ctypes.data,
    )
    if rc != 0:
        raise AssertionError(f"native geometry build failed (rc={rc})")

    level_slots = []
    o = 0
    level_slots.append(level_slots_flat[o : o + T].copy())
    o += T
    for L in range(1, depth):
        cnt = T * (1 << L)
        level_slots.append(level_slots_flat[o : o + cnt].copy())
        o += cnt

    level_of_haar = np.zeros(n, dtype=np.int32)
    if n > 1:
        level_of_haar[1:] = np.floor(np.log2(np.arange(1, n))).astype(np.int32)

    off = G.tree_offsets(depth).astype(np.int32)
    return G.FractalGeometry(
        height=height,
        width=width,
        depth=depth,
        num_tiles=T,
        centers=centers,
        offsets=off,
        pixel_gather=pixel_gather,
        coef_mask=coef_mask.astype(bool),
        nbr_idx=nbr_idx,
        nbr_par=nbr_par,
        level_of_haar=level_of_haar,
        level_slots=level_slots,
        tile_nbr=tile_nbr,
    )


def layer_waves_native(deps):
    """Native Kahn longest-path layering; deps [n, 3] int32 (-1 absent).
    Returns int32 waves or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    import numpy as np

    d = np.ascontiguousarray(deps, dtype=np.int32)
    n = d.shape[0]
    assert d.shape == (n, 3)
    out = np.empty(n, dtype=np.int32)
    rc = lib.fg_layer_waves(n, d.ctypes.data, out.ctypes.data)
    if rc != 0:
        raise AssertionError("cycle in causal dependency graph")
    return out
