"""Geometry primitives: spherical coordinates, rotations, cuboids.

Capability parity (re-designed, not translated) with the reference's
``src/torchbox3d/math/numpy/conversions.py`` (cart/sph conversions),
``src/torchbox3d/math/linalg/lie/SO3.py`` (quat <-> yaw) and
``src/torchbox3d/math/polytope.py`` (interior-point tests, vertices).

All functions are pure ``jnp`` (fp32), shape-polymorphic over leading batch
dims, and safe to ``jit``/``vmap``. Where the reference runs fp64
(``coding.py:126-128``, ``detection_head.py:535``), we use fp32 with
compensated formulations: TPUs have no fp64 ALU worth using.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

Pi = 3.14159265358979323846
Tau = 2.0 * Pi


# ---------------------------------------------------------------------------
# Spherical <-> Cartesian
# ---------------------------------------------------------------------------


def cart_to_sph(xyz: Array) -> Array:
    """Cartesian ``(..., 3)`` -> spherical ``(..., 3)`` = (azimuth, inclination, radius).

    Matches the spherical convention of the reference converter
    (``math/numpy/conversions.py:46-67``): azimuth = atan2(y, x),
    inclination = atan2(z, hypot(x, y)), radius = |xyz|.
    """
    x, y, z = xyz[..., 0], xyz[..., 1], xyz[..., 2]
    hxy = jnp.hypot(x, y)
    radius = jnp.hypot(hxy, z)
    azimuth = jnp.arctan2(y, x)
    inclination = jnp.arctan2(z, hxy)
    return jnp.stack([azimuth, inclination, radius], axis=-1)


def sph_to_cart(sph: Array) -> Array:
    """Spherical ``(..., 3)`` (azimuth, inclination, radius) -> Cartesian."""
    az, incl, r = sph[..., 0], sph[..., 1], sph[..., 2]
    rcos = r * jnp.cos(incl)
    return jnp.stack(
        [rcos * jnp.cos(az), rcos * jnp.sin(az), r * jnp.sin(incl)], axis=-1
    )


# ---------------------------------------------------------------------------
# Yaw-only SO(3) helpers
# ---------------------------------------------------------------------------


def yaw_to_quat(yaw: Array) -> Array:
    """Yaw ``(...,)`` -> unit quaternion ``(..., 4)`` in wxyz order.

    Parity with ``SO3.py`` ``yaw_to_quat`` (rotation about +z only).
    """
    half = yaw * 0.5
    w = jnp.cos(half)
    z = jnp.sin(half)
    zeros = jnp.zeros_like(w)
    return jnp.stack([w, zeros, zeros, z], axis=-1)


def quat_to_yaw(quat_wxyz: Array) -> Array:
    """Unit quaternion ``(..., 4)`` wxyz -> yaw ``(...,)``.

    Tait-Bryan zyx yaw extraction, matching ``SO3.py`` ``quat_to_yaw``.
    """
    w, x, y, z = (
        quat_wxyz[..., 0],
        quat_wxyz[..., 1],
        quat_wxyz[..., 2],
        quat_wxyz[..., 3],
    )
    return jnp.arctan2(2.0 * (w * z + x * y), 1.0 - 2.0 * (y * y + z * z))


def wrap_angle(theta: Array) -> Array:
    """Wrap angles to ``[-pi, pi)``."""
    return theta - jnp.floor(theta / Tau + 0.5) * Tau


# ---------------------------------------------------------------------------
# Cuboids
# ---------------------------------------------------------------------------

# Unit cube corner signs, same ordering as the reference's
# ``polytope.py::cuboids_to_vertices`` (AV2 convention).
_UNIT_VERTS = jnp.array(
    [
        [+1.0, +1.0, +1.0],
        [+1.0, -1.0, +1.0],
        [+1.0, -1.0, -1.0],
        [+1.0, +1.0, -1.0],
        [-1.0, +1.0, +1.0],
        [-1.0, -1.0, +1.0],
        [-1.0, -1.0, -1.0],
        [-1.0, +1.0, -1.0],
    ]
)


def boxes_to_vertices(boxes: Array) -> Array:
    """Cuboid params ``(..., 7)`` = (x, y, z, l, w, h, yaw) -> vertices ``(..., 8, 3)``.

    Yaw-only rotation about +z (the only rotation the detector regresses).
    """
    ctr = boxes[..., None, 0:3]
    half = boxes[..., None, 3:6] * 0.5
    yaw = boxes[..., 6]
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)

    local = _UNIT_VERTS * half  # (..., 8, 3)
    lx, ly, lz = local[..., 0], local[..., 1], local[..., 2]
    wx = cos[..., None] * lx - sin[..., None] * ly
    wy = sin[..., None] * lx + cos[..., None] * ly
    rotated = jnp.stack([wx, wy, lz], axis=-1)
    return rotated + ctr


def points_in_boxes(points: Array, boxes: Array, *, inclusive: bool = True) -> Array:
    """Interior test of ``points (P, 3)`` against yaw-only cuboids ``boxes (K, 7)``.

    Returns a ``(K, P)`` boolean mask. Mathematically equivalent to the
    reference's projection-onto-edge-axes test
    (``polytope.py::compute_interior_points_mask``) for yaw-only cuboids, but
    formulated directly: rotate the point into the box frame and compare with
    half-dims. The reference's test is edge-inclusive (``<=``); we keep that.

    Designed to be cheap enough to recompute in streamed chunks instead of
    materializing a full (K, H*W) mask in fp64 like the reference
    (``detection_head.py:534-536``).
    """
    ctr = boxes[:, 0:3]  # (K, 3)
    half = boxes[:, 3:6] * 0.5  # (K, 3)
    yaw = boxes[:, 6]  # (K,)
    cos, sin = jnp.cos(yaw), jnp.sin(yaw)

    dx = points[None, :, 0] - ctr[:, None, 0]  # (K, P)
    dy = points[None, :, 1] - ctr[:, None, 1]
    dz = points[None, :, 2] - ctr[:, None, 2]

    local_x = cos[:, None] * dx + sin[:, None] * dy
    local_y = -sin[:, None] * dx + cos[:, None] * dy

    if inclusive:
        inside = (
            (jnp.abs(local_x) <= half[:, None, 0])
            & (jnp.abs(local_y) <= half[:, None, 1])
            & (jnp.abs(dz) <= half[:, None, 2])
        )
    else:
        inside = (
            (jnp.abs(local_x) < half[:, None, 0])
            & (jnp.abs(local_y) < half[:, None, 1])
            & (jnp.abs(dz) < half[:, None, 2])
        )
    return inside
