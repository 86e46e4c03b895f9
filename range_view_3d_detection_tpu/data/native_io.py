"""ctypes bindings for the native data-path library (native/rangeview_io.cpp).

Falls back to the pure-numpy implementations in ``ops.projection`` when the
shared library has not been built. Build with ``bash native/build.sh``.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

import numpy as np

_LIB_PATH = (
    Path(__file__).resolve().parent.parent.parent / "native" / "librangeview_io.so"
)
_lib: Optional[ctypes.CDLL] = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.is_file():
        return None
    lib = ctypes.CDLL(str(_LIB_PATH))
    i64 = ctypes.c_int64
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.z_buffer.argtypes = [
        ctypes.POINTER(i64),
        ctypes.POINTER(i64),
        f32p,
        f32p,
        i64,
        i64,
        i64,
        i64,
        ctypes.c_float,
        f32p,
        f32p,
    ]
    lib.columns_to_image.argtypes = [
        ctypes.POINTER(f32p),
        i64,
        i64,
        i64,
        f32p,
        ctypes.POINTER(ctypes.c_uint8),
    ]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def z_buffer_native(
    row: np.ndarray,
    col: np.ndarray,
    distances: np.ndarray,
    values: np.ndarray,
    *,
    height: int,
    width: int,
    min_distance: float = 1.0,
) -> np.ndarray:
    """Native nearest-return-wins rasterization; numpy-fallback compatible
    with ``ops.projection.z_buffer_numpy``."""
    lib = _load()
    if lib is None:
        from range_view_3d_detection_tpu.ops.projection import z_buffer_numpy

        return z_buffer_numpy(
            row, col, distances, values,
            height=height, width=width, min_distance=min_distance,
        )
    n, c = values.shape
    row = np.ascontiguousarray(row, np.int64)
    col = np.ascontiguousarray(col, np.int64)
    distances = np.ascontiguousarray(distances, np.float32)
    values = np.ascontiguousarray(values, np.float32)
    out = np.zeros((height * width, c), np.float32)
    depth = np.full(height * width, np.inf, np.float32)
    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.z_buffer(
        row.ctypes.data_as(i64p),
        col.ctypes.data_as(i64p),
        distances.ctypes.data_as(f32p),
        values.ctypes.data_as(f32p),
        n,
        height,
        width,
        c,
        ctypes.c_float(min_distance),
        out.ctypes.data_as(f32p),
        depth.ctypes.data_as(f32p),
    )
    return out.reshape(height, width, c)


def columns_to_image_native(
    columns: list[np.ndarray],
    *,
    height: int,
    width: int,
    range_index: int = -1,
) -> tuple[np.ndarray, np.ndarray]:
    """Fuse per-column buffers into a channel-last image + validity mask."""
    lib = _load()
    num_pixels = height * width
    cols32 = [np.ascontiguousarray(c, np.float32) for c in columns]
    if lib is None:
        img = np.stack(cols32, axis=-1).reshape(height, width, -1)
        mask = (
            (cols32[range_index].reshape(height, width) > 0)
            if range_index >= 0
            else np.ones((height, width), bool)
        )
        return img, mask
    n_cols = len(cols32)
    f32p = ctypes.POINTER(ctypes.c_float)
    ptrs = (f32p * n_cols)(*[c.ctypes.data_as(f32p) for c in cols32])
    out = np.empty((num_pixels, n_cols), np.float32)
    mask = np.empty(num_pixels, np.uint8)
    lib.columns_to_image(
        ptrs,
        n_cols,
        num_pixels,
        range_index,
        out.ctypes.data_as(f32p),
        mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
    )
    return out.reshape(height, width, n_cols), mask.reshape(height, width) > 0
