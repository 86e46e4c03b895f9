"""Azimuth-invariant box coding.

Capability parity with ``src/torchbox3d/math/ops/coding.py`` (111-144,
``egovehicle_from_azimuth`` 80-107) and the encoder side of
``src/torchbox3d/nn/heads/detection_head.py::encode_regression_targets``
(452-493) — re-designed as pure fp32 JAX over channel-last pixel tensors.

Regressand layout (8 channels, last axis):
    [0:3]  offset from the pixel's LiDAR return to the box center
           (rotated into the pixel-azimuth frame when azimuth-invariant)
    [3:6]  log(length, width, height)
    [6:8]  sin / cos of (yaw - pixel azimuth) when azimuth-invariant,
           else sin / cos of yaw.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

NUM_REGRESSANDS = 8


def pixel_azimuth(cart: Array) -> Array:
    """Azimuth of each pixel's Cartesian return. ``cart (..., 3)`` -> ``(...,)``."""
    return jnp.arctan2(cart[..., 1], cart[..., 0])


def encode_boxes(
    boxes: Array, cart: Array, *, azimuth_invariant: bool = True
) -> Array:
    """Encode boxes relative to per-pixel LiDAR returns.

    Args:
        boxes: ``(..., 7)`` (x, y, z, l, w, h, yaw) — one box per pixel
            (already gathered by the target assigner).
        cart: ``(..., 3)`` per-pixel Cartesian returns.
        azimuth_invariant: rotate offsets into the pixel-azimuth frame and
            make yaw azimuth-relative (``encode_regression_targets`` parity).

    Returns:
        ``(..., 8)`` regression targets.
    """
    offset = boxes[..., 0:3] - cart
    yaw = boxes[..., 6]

    if azimuth_invariant:
        az = pixel_azimuth(cart)
        cos, sin = jnp.cos(az), jnp.sin(az)
        # World -> azimuth frame (R(-az) applied to the offset).
        ox = cos * offset[..., 0] + sin * offset[..., 1]
        oy = -sin * offset[..., 0] + cos * offset[..., 1]
        offset = jnp.stack([ox, oy, offset[..., 2]], axis=-1)
        yaw = yaw - az

    log_dims = jnp.log(jnp.maximum(boxes[..., 3:6], 1e-6))
    return jnp.concatenate(
        [
            offset,
            log_dims,
            jnp.sin(yaw)[..., None],
            jnp.cos(yaw)[..., None],
        ],
        axis=-1,
    )


def decode_boxes(
    regressands: Array, cart: Array, *, azimuth_invariant: bool = True
) -> Array:
    """Decode per-pixel regressands into cuboids ``(..., 7)``.

    Inverse of :func:`encode_boxes`; parity with ``decode_range_view``
    (``coding.py:111-144``). The reference promotes to fp64 internally;
    on TPU we stay fp32 — the quantities are O(100 m) offsets with O(mm)
    required precision, well within fp32.
    """
    regressands = regressands.astype(jnp.float32)
    cart = cart.astype(jnp.float32)

    offset = regressands[..., 0:3]
    lwh = jnp.exp(regressands[..., 3:6])
    yaw = jnp.arctan2(regressands[..., 6], regressands[..., 7])

    if azimuth_invariant:
        az = pixel_azimuth(cart)
        cos, sin = jnp.cos(az), jnp.sin(az)
        # Azimuth frame -> world (R(+az)): inverse of the encode rotation
        # (``egovehicle_from_azimuth``, coding.py:80-107).
        ox = cos * offset[..., 0] - sin * offset[..., 1]
        oy = sin * offset[..., 0] + cos * offset[..., 1]
        offset = jnp.stack([ox, oy, offset[..., 2]], axis=-1)
        yaw = yaw + az

    ctr = cart + offset
    return jnp.concatenate([ctr, lwh, yaw[..., None]], axis=-1)
