"""Spherical projection / z-buffer rasterization.

Capability parity with the reference's numba ``z_buffer``
(``math/numpy/conversions.py:106-128``) and
``build_range_view_coordinates`` (9-43): nearest-return-wins scatter of N
points into an (H, W, C) range image.

Implementations:
- :func:`z_buffer_numpy` — host-side (converters, synthetic data); a
  vectorized sort + unique formulation instead of the reference's
  sequential numba loop.
- :func:`z_buffer_jax` — on-device ``segment_min`` formulation.
- :func:`z_buffer_jax_sorted` / :func:`z_buffer_winner_map` — on-device
  sort + searchsorted + gather formulation, no scatter HLO at all.
- :func:`rasterize_points_jax` — the full device twin of the data layer's
  ``load_sweep`` + ``_pad_and_stride``: raw points -> (features, cart,
  mask) network inputs, jit-fusable in front of the serving forward so
  the whole projection -> ... -> NMS pipeline (the BASELINE.json
  north-star path) is ONE device program.

On the north star's "Pallas scatter kernel": a Pallas z-buffer was
considered and rejected — scatter-by-pixel is the one primitive the TPU
vector unit cannot express (8x128 lanes write disjoint tiles, so
colliding pixel updates serialize no matter who emits them), and a
dense per-row candidate matrix costs H*W*N/H comparisons (~10^8/frame).
The TPU-native answer is the same one the stem kernel found for its
unfold: reformulate around the MXU/sort units. One ``lax.sort`` of
(pixel, range) keys resolves every collision in O(N log N) with no
serialization; at AV2 scale (N~10^5) the rasterization is a small
fraction of the serving forward (measured per-stage by
``tools/benchmark.py``'s projection rows; BENCH_NOTES.md round-4).
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


def z_buffer_winner_map(
    row: Array,
    col: Array,
    distances: Array,
    *,
    height: int,
    width: int,
    min_distance: float = MIN_DISTANCE,
) -> Tuple[Array, Array]:
    """Sort-based winner resolution: (winner point index, occupancy).

    TPU scatters serialize (XLA lowers ``segment_min`` to scatter-min HLO,
    which updates one window per step); sorts are heavily optimized. This
    formulation is pure sort + gather:

    1. lexicographic sort of (pixel, distance, point-index) — the first
       entry of each pixel's run is the nearest return with the
       reference's first-wins tie-break (``conversions.py:106-128``);
    2. ``searchsorted`` of every pixel id into the sorted pixel column
       finds each run's start.

    Returns ``(winner, has)``, each flat ``(height * width,)``: the index
    of the winning point per pixel (undefined where ``has`` is False) and
    the occupancy mask. Factored out of :func:`z_buffer_jax_sorted` so
    multi-channel rasterization resolves winners ONCE and gathers every
    feature channel from the same map (``rasterize_points_jax``).
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
    return idx_s[start], has


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

    Winner resolution via :func:`z_buffer_winner_map`, then one gather
    pulls the winning point's features. Identical results to
    :func:`z_buffer_jax`; pick per backend by measured cost (see
    BENCH_NOTES.md).
    """
    winner, has = z_buffer_winner_map(
        row,
        col,
        distances,
        height=height,
        width=width,
        min_distance=min_distance,
    )
    img = jnp.where(has[:, None], values[winner], 0.0)
    return img.reshape(height, width, values.shape[1])


def range_view_coordinates_jax(
    xyz: Array, laser_numbers: Array, *, height: int, width: int
) -> Tuple[Array, Array, Array]:
    """Device twin of :func:`range_view_coordinates` (jnp, jit-safe)."""
    az = jnp.arctan2(xyz[:, 1], xyz[:, 0])
    rng = jnp.linalg.norm(xyz, axis=-1)
    col = ((az + jnp.pi) / (2 * jnp.pi) * width).astype(jnp.int32) % width
    row = jnp.clip(laser_numbers.astype(jnp.int32), 0, height - 1)
    return row, col, rng


def rasterize_points_jax(
    xyz: Array,
    laser_number: Array,
    point_features: dict,
    *,
    height: int,
    width: int,
    feature_names: Tuple[str, ...],
    dataset_name: str = "av2",
    x_stride: int = 1,
    pad: int = 0,
    padding_mode: str = "circular",
    min_distance: float = MIN_DISTANCE,
) -> Tuple[Array, Array, Array]:
    """Raw points -> (features, cart, mask) network inputs, on device.

    The jit-fusable twin of ``data/dataset.py::load_sweep`` +
    ``_pad_and_stride`` (reference: ``prototype/loader.py:556-621`` sweep
    image assembly + ``792-815`` subsample): spherical projection, one
    nearest-return z-buffer shared by every channel, the per-dataset
    normalizations (Waymo tanh(intensity), timedelta seconds, the laser
    ``view`` channel), empty-pixel masking, circular width padding and
    column decimation. Composing this in front of the serving forward
    makes projection -> backbone -> decode -> NMS one device program.

    Not reproduced: the converter-side ROI multiply (``load_sweep``'s
    ``is_within_roi`` flags come from offline map rasters; a raw-points
    server has no map) and the optional 3x3 range median filter.

    Args:
        xyz: (N, 3) sensor-frame points; pad invalid rows with zeros
            (range 0 < ``min_distance`` drops them).
        laser_number: (N,) row index per point (sensor geometry).
        point_features: name -> (N,) extra per-point channels
            ("intensity", "elongation", "timedelta_ns", ... as the
            dataset's ``feature_column_names`` demand).
        feature_names: channel order of the returned feature image.
        pad: per-side column padding (``data.dataset.width_padding``).

    Returns:
        features (H, Wp, C), cart (H, Wp, 3), mask (H, Wp) — Wp =
        (width + 2 * pad) / x_stride, exactly the shapes the data layer
        emits.
    """
    row, col, rng = range_view_coordinates_jax(
        xyz, laser_number, height=height, width=width
    )
    winner, has = z_buffer_winner_map(
        row, col, rng, height=height, width=width, min_distance=min_distance
    )

    per_point = {
        "range": rng.astype(jnp.float32),
        "x": xyz[:, 0].astype(jnp.float32),
        "y": xyz[:, 1].astype(jnp.float32),
        "z": xyz[:, 2].astype(jnp.float32),
        "view": laser_number.astype(jnp.float32),
    }
    for k, v in point_features.items():
        per_point[k] = v.astype(jnp.float32)

    # ONE gather for every channel: stack the per-point columns (N, C')
    # and pull the winning row per pixel once. Per-channel gathers cost
    # C' separate random-access passes over the same winner map; the
    # combined gather moves contiguous (C' * 4)-byte rows instead.
    chan_names = ["range", "x", "y", "z"] + [
        n for n in feature_names if n not in ("range", "x", "y", "z")
    ]
    stacked = jnp.stack([per_point[n] for n in chan_names], axis=-1)
    gathered = jnp.where(has[:, None], stacked[winner], 0.0).reshape(
        height, width, len(chan_names)
    )
    chan = {n: gathered[..., i] for i, n in enumerate(chan_names)}

    mask = chan["range"] > 0.0

    planes = []
    for name in feature_names:
        if name == "view":
            # Laser -> sensor-view channel (loader.py:605-621): 2 for the
            # upper 32-beam LiDAR, 1 for the lower, 0 for empty pixels.
            plane = jnp.where(mask, jnp.where(chan["view"] <= 32, 2.0, 1.0), 0.0)
        else:
            plane = chan[name]
            if name == "intensity" and dataset_name == "waymo":
                plane = jnp.tanh(plane)
            elif name == "timedelta_ns":
                plane = plane * 1e-9
        planes.append(plane)
    feats = jnp.stack(planes, axis=-1)
    cart = jnp.stack([chan["x"], chan["y"], chan["z"]], axis=-1)

    feats = feats * mask[..., None]
    mode = "wrap" if padding_mode == "circular" else "constant"
    spec = ((0, 0), (pad, pad), (0, 0))
    feats = jnp.pad(feats, spec, mode=mode)[:, ::x_stride]
    cart = jnp.pad(cart, spec, mode=mode)[:, ::x_stride]
    mask = jnp.pad(mask, spec[:2], mode=mode)[:, ::x_stride]
    return feats.astype(jnp.float32), cart.astype(jnp.float32), mask


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
