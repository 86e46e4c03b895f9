"""Spherical projection / z-buffer rasterization.

Capability parity with the reference's numba ``z_buffer``
(``math/numpy/conversions.py:106-128``) and
``build_range_view_coordinates`` (9-43): nearest-return-wins scatter of N
points into an (H, W, C) range image.

Two implementations:
- :func:`z_buffer_numpy` — host-side (converters, synthetic data); a
  vectorized sort + unique formulation instead of the reference's
  sequential numba loop.
- :func:`z_buffer_jax` — on-device ``segment_min`` formulation used by the
  end-to-end on-device pipeline (projection -> ... -> NMS), the north-star
  path of BASELINE.json.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

MIN_DISTANCE = 1.0  # reference z_buffer min_distance (conversions.py:113)


def range_view_coordinates(
    xyz: np.ndarray,
    laser_numbers: np.ndarray,
    *,
    height: int,
    width: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Points -> (row, col, range) image coordinates.

    Rows come from the laser index (sensor geometry), columns from azimuth
    binning over [-pi, pi) — mirroring ``build_range_view_coordinates``.
    """
    az = np.arctan2(xyz[:, 1], xyz[:, 0])
    rng = np.linalg.norm(xyz, axis=-1)
    col = ((az + np.pi) / (2 * np.pi) * width).astype(np.int64) % width
    row = np.clip(laser_numbers.astype(np.int64), 0, height - 1)
    return row, col, rng


def z_buffer_numpy(
    row: np.ndarray,
    col: np.ndarray,
    distances: np.ndarray,
    values: np.ndarray,
    *,
    height: int,
    width: int,
    min_distance: float = MIN_DISTANCE,
) -> np.ndarray:
    """Nearest-return-wins rasterization (host side).

    Args:
        row/col: (N,) pixel coordinates.
        distances: (N,) ranges used for the depth test.
        values: (N, C) per-point features to scatter.

    Returns:
        (H, W, C) image; empty pixels are zero.
    """
    keep = distances >= min_distance
    row, col, distances, values = (
        row[keep],
        col[keep],
        distances[keep],
        values[keep],
    )
    flat = row * width + col
    # Sort by (pixel, distance); the first hit per pixel is the nearest.
    order = np.lexsort((distances, flat))
    flat_sorted = flat[order]
    first = np.ones(len(flat_sorted), dtype=bool)
    first[1:] = flat_sorted[1:] != flat_sorted[:-1]
    img = np.zeros((height * width, values.shape[1]), dtype=values.dtype)
    img[flat_sorted[first]] = values[order][first]
    return img.reshape(height, width, values.shape[1])


def z_buffer_jax_sorted(
    row: Array,
    col: Array,
    distances: Array,
    values: Array,
    *,
    height: int,
    width: int,
    min_distance: float = MIN_DISTANCE,
) -> Array:
    """Sort-based on-device z-buffer (no scatter at all).

    TPU scatters serialize (XLA lowers ``segment_min`` to scatter-min HLO,
    which updates one window per step); sorts are heavily optimized. This
    formulation is pure sort + gather:

    1. lexicographic sort of (pixel, distance, point-index) — the first
       entry of each pixel's run is the nearest return with the
       reference's first-wins tie-break (``conversions.py:106-128``);
    2. ``searchsorted`` of every pixel id into the sorted pixel column
       finds each run's start;
    3. a gather pulls the winning point's features.

    Identical results to :func:`z_buffer_jax`; pick per backend by
    measured cost (see BENCH_NOTES.md).
    """
    n = distances.shape[0]
    valid = distances >= min_distance
    flat = jnp.where(valid, row * width + col, height * width).astype(
        jnp.int32
    )
    dist_masked = jnp.where(valid, distances, jnp.inf).astype(jnp.float32)
    idx = jnp.arange(n, dtype=jnp.int32)
    flat_s, _, idx_s = jax.lax.sort(
        (flat, dist_masked, idx), num_keys=2
    )
    # idx participates as payload only: ties in (pixel, distance) keep
    # sort stability -> smallest original index first, matching the
    # sequential reference's first-wins rule (lax.sort is stable).
    pixels = jnp.arange(height * width, dtype=jnp.int32)
    start = jnp.searchsorted(flat_s, pixels, side="left").astype(jnp.int32)
    start = jnp.minimum(start, n - 1)
    has = flat_s[start] == pixels
    winner = idx_s[start]
    img = jnp.where(has[:, None], values[winner], 0.0)
    return img.reshape(height, width, values.shape[1])


def z_buffer_jax(
    row: Array,
    col: Array,
    distances: Array,
    values: Array,
    *,
    height: int,
    width: int,
    min_distance: float = MIN_DISTANCE,
) -> Array:
    """On-device z-buffer via ``segment_min`` over raveled pixel indices.

    Static-shape: invalid points (below ``min_distance``) are routed to a
    dummy pixel. Winner selection uses a packed (distance, index) key so a
    single segment_min picks both the depth and the winning point.
    """
    n = distances.shape[0]
    valid = distances >= min_distance
    flat = jnp.where(valid, row * width + col, height * width).astype(jnp.int32)
    num_segments = height * width + 1

    # Pass 1: per-pixel minimum distance.
    dist_masked = jnp.where(valid, distances, jnp.inf)
    seg_min = jax.ops.segment_min(dist_masked, flat, num_segments=num_segments)
    # Pass 2: among min-distance points per pixel, the smallest index wins
    # (deterministic tie-break; the sequential reference keeps the first).
    is_min = valid & (distances <= seg_min[flat])
    big = jnp.iinfo(jnp.int32).max
    idx = jnp.where(is_min, jnp.arange(n, dtype=jnp.int32), big)
    winner = jax.ops.segment_min(idx, flat, num_segments=num_segments)
    has = winner < big
    safe = jnp.where(has, winner, 0)
    img = jnp.where(has[:, None], values[safe], 0.0)
    return img[: height * width].reshape(height, width, values.shape[1])
