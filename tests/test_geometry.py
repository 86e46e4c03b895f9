"""Unit tests for geometry primitives against brute-force numpy oracles."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops import geometry as g


def test_cart_sph_roundtrip():
    rng = np.random.default_rng(0)
    xyz = rng.normal(size=(256, 3)).astype(np.float32) * 50.0
    sph = g.cart_to_sph(jnp.asarray(xyz))
    back = np.asarray(g.sph_to_cart(sph))
    np.testing.assert_allclose(back, xyz, atol=1e-3)


def test_sph_convention():
    # A point on +x axis: azimuth 0, inclination 0.
    sph = np.asarray(g.cart_to_sph(jnp.array([[10.0, 0.0, 0.0]])))
    np.testing.assert_allclose(sph, [[0.0, 0.0, 10.0]], atol=1e-6)
    # +y axis: azimuth pi/2.
    sph = np.asarray(g.cart_to_sph(jnp.array([[0.0, 5.0, 0.0]])))
    np.testing.assert_allclose(sph[0, 0], np.pi / 2, atol=1e-6)
    # up: inclination pi/2.
    sph = np.asarray(g.cart_to_sph(jnp.array([[0.0, 0.0, 2.0]])))
    np.testing.assert_allclose(sph[0, 1], np.pi / 2, atol=1e-6)


def test_yaw_quat_roundtrip():
    yaws = jnp.linspace(-3.0, 3.0, 41)
    quats = g.yaw_to_quat(yaws)
    back = g.quat_to_yaw(quats)
    np.testing.assert_allclose(np.asarray(back), np.asarray(yaws), atol=1e-5)


def test_wrap_angle():
    np.testing.assert_allclose(
        np.asarray(g.wrap_angle(jnp.array([0.0, np.pi, -np.pi, 2 * np.pi + 0.1]))),
        [0.0, -np.pi, -np.pi, 0.1],
        atol=1e-5,
    )


def _brute_force_interior(points, boxes):
    """Numpy oracle: rotate each point into each box frame."""
    K, P = boxes.shape[0], points.shape[0]
    out = np.zeros((K, P), dtype=bool)
    for k in range(K):
        x, y, z, l, w, h, yaw = boxes[k]
        c, s = np.cos(yaw), np.sin(yaw)
        d = points - np.array([x, y, z])
        lx = c * d[:, 0] + s * d[:, 1]
        ly = -s * d[:, 0] + c * d[:, 1]
        out[k] = (
            (np.abs(lx) <= l / 2) & (np.abs(ly) <= w / 2) & (np.abs(d[:, 2]) <= h / 2)
        )
    return out


def test_points_in_boxes_vs_oracle():
    rng = np.random.default_rng(1)
    points = rng.uniform(-10, 10, size=(512, 3)).astype(np.float32)
    boxes = np.stack(
        [
            rng.uniform(-8, 8, 16),
            rng.uniform(-8, 8, 16),
            rng.uniform(-2, 2, 16),
            rng.uniform(1, 6, 16),
            rng.uniform(1, 4, 16),
            rng.uniform(1, 3, 16),
            rng.uniform(-np.pi, np.pi, 16),
        ],
        axis=-1,
    ).astype(np.float32)
    got = np.asarray(g.points_in_boxes(jnp.asarray(points), jnp.asarray(boxes)))
    want = _brute_force_interior(points, boxes)
    # fp32 boundary ties can differ on exact-edge points; random points are
    # almost surely not on a boundary.
    assert (got == want).mean() > 0.999


def test_boxes_to_vertices_interior_consistency():
    """All 8 vertices of a shrunk box must be interior to the box itself."""
    rng = np.random.default_rng(2)
    boxes = np.stack(
        [
            rng.uniform(-5, 5, 8),
            rng.uniform(-5, 5, 8),
            rng.uniform(-1, 1, 8),
            rng.uniform(2, 5, 8),
            rng.uniform(1, 3, 8),
            rng.uniform(1, 2, 8),
            rng.uniform(-np.pi, np.pi, 8),
        ],
        axis=-1,
    ).astype(np.float32)
    shrunk = boxes.copy()
    shrunk[:, 3:6] *= 0.99
    verts = np.asarray(g.boxes_to_vertices(jnp.asarray(shrunk)))  # (8, 8, 3)
    for k in range(8):
        inside = np.asarray(
            g.points_in_boxes(jnp.asarray(verts[k]), jnp.asarray(boxes[k : k + 1]))
        )
        assert inside.all(), f"box {k} vertices not interior"


def test_vertices_match_dims():
    box = jnp.array([[1.0, 2.0, 3.0, 4.0, 2.0, 1.0, 0.3]])
    verts = np.asarray(g.boxes_to_vertices(box))[0]
    # Edge lengths along the three principal directions.
    assert np.isclose(np.linalg.norm(verts[0] - verts[4]), 4.0, atol=1e-5)  # length
    assert np.isclose(np.linalg.norm(verts[0] - verts[1]), 2.0, atol=1e-5)  # width
    assert np.isclose(np.linalg.norm(verts[0] - verts[3]), 1.0, atol=1e-5)  # height
    assert np.allclose(verts.mean(axis=0), [1.0, 2.0, 3.0], atol=1e-5)
