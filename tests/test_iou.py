"""Rotated IoU tests vs analytic and Monte-Carlo oracles."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops import iou as iou_ops


def test_identical_boxes():
    b = jnp.array([[1.0, 2.0, 4.0, 2.0, 0.7]])
    got = np.asarray(iou_ops.iou_rotated_bev(b, b))
    np.testing.assert_allclose(got, [[1.0]], atol=1e-4)


def test_disjoint_boxes():
    a = jnp.array([[0.0, 0.0, 2.0, 2.0, 0.3]])
    b = jnp.array([[10.0, 10.0, 2.0, 2.0, -0.8]])
    got = np.asarray(iou_ops.iou_rotated_bev(a, b))
    np.testing.assert_allclose(got, [[0.0]], atol=1e-6)


def test_axis_aligned_analytic():
    # Two axis-aligned boxes, overlap computable by hand.
    a = jnp.array([[0.0, 0.0, 4.0, 2.0, 0.0]])  # x in [-2,2], y in [-1,1]
    b = jnp.array([[1.0, 0.5, 2.0, 2.0, 0.0]])  # x in [0,2], y in [-0.5,1.5]
    inter = 2.0 * 1.5
    union = 8.0 + 4.0 - inter
    got = np.asarray(iou_ops.iou_rotated_bev(a, b))
    np.testing.assert_allclose(got, [[inter / union]], atol=1e-4)


def test_rotated_45_analytic():
    # Unit square vs same square rotated 45 deg about its center:
    # intersection is a regular octagon with area 2*(sqrt(2)-1).
    a = jnp.array([[0.0, 0.0, 1.0, 1.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 1.0, np.pi / 4]])
    inter = 2.0 * (np.sqrt(2) - 1.0)
    union = 2.0 - inter
    got = np.asarray(iou_ops.iou_rotated_bev(a, b))
    np.testing.assert_allclose(got, [[inter / union]], atol=1e-3)


def _mc_iou(a, b, n=200_000, seed=0):
    """Monte-Carlo IoU oracle for two rotated rects."""
    rng = np.random.default_rng(seed)
    boxes = np.stack([a, b])
    lo = (boxes[:, :2] - boxes[:, 2:4].max() * 1.5).min(axis=0)
    hi = (boxes[:, :2] + boxes[:, 2:4].max() * 1.5).max(axis=0)
    pts = rng.uniform(lo, hi, size=(n, 2))
    area_bbox = np.prod(hi - lo)

    def inside(box):
        c, s = np.cos(box[4]), np.sin(box[4])
        d = pts - box[:2]
        px = c * d[:, 0] + s * d[:, 1]
        py = -s * d[:, 0] + c * d[:, 1]
        return (np.abs(px) <= box[2] / 2) & (np.abs(py) <= box[3] / 2)

    ia, ib = inside(a), inside(b)
    inter = (ia & ib).mean() * area_bbox
    union = (ia | ib).mean() * area_bbox
    return inter / union if union > 0 else 0.0


def test_random_vs_monte_carlo():
    rng = np.random.default_rng(5)
    for i in range(8):
        a = np.array(
            [
                rng.uniform(-2, 2),
                rng.uniform(-2, 2),
                rng.uniform(1, 5),
                rng.uniform(1, 4),
                rng.uniform(-np.pi, np.pi),
            ]
        )
        b = a + np.array(
            [
                rng.uniform(-2, 2),
                rng.uniform(-2, 2),
                rng.uniform(-0.5, 0.5),
                rng.uniform(-0.5, 0.5),
                rng.uniform(-1, 1),
            ]
        )
        want = _mc_iou(a, b, seed=i)
        got = float(
            iou_ops.iou_rotated_bev(
                jnp.asarray(a[None].astype(np.float32)),
                jnp.asarray(b[None].astype(np.float32)),
            )[0, 0]
        )
        assert abs(got - want) < 0.01, f"pair {i}: got {got}, mc {want}"


def test_iou_3d_identical():
    c = jnp.array([[0.0, 0.0, 1.0, 4.0, 2.0, 1.5, 0.4]])
    got = np.asarray(iou_ops.iou_3d_aligned(c, c))
    np.testing.assert_allclose(got, [1.0], atol=1e-4)


def test_iou_3d_vertical_offset():
    # Same BEV footprint, half vertical overlap.
    a = jnp.array([[0.0, 0.0, 0.0, 2.0, 2.0, 2.0, 0.0]])
    b = jnp.array([[0.0, 0.0, 1.0, 2.0, 2.0, 2.0, 0.0]])
    # inter = 4 * 1 = 4; union = 8 + 8 - 4 = 12.
    got = np.asarray(iou_ops.iou_3d_aligned(a, b))
    np.testing.assert_allclose(got, [4.0 / 12.0], atol=1e-3)


def test_numpy_iou_matches_jax():
    from range_view_3d_detection_tpu.evaluation.iou_np import iou_rotated_bev_np

    rng = np.random.default_rng(8)
    a = np.stack(
        [
            rng.uniform(-10, 10, 24),
            rng.uniform(-10, 10, 24),
            rng.uniform(1, 6, 24),
            rng.uniform(1, 4, 24),
            rng.uniform(-np.pi, np.pi, 24),
        ],
        axis=-1,
    ).astype(np.float32)
    b = a + rng.normal(0, 1.0, a.shape).astype(np.float32)
    want = np.asarray(iou_ops.iou_rotated_bev(jnp.asarray(a), jnp.asarray(b)))
    got = iou_rotated_bev_np(a, b)
    np.testing.assert_allclose(got, want, atol=2e-3)
    # self-IoU of identical boxes is 1
    np.testing.assert_allclose(
        np.diag(iou_rotated_bev_np(a, a)), 1.0, atol=1e-3
    )


def test_degenerate_shared_boundaries():
    """Tangent boxes ~0, identical boxes 1, shared-edge-line overlap exact
    (the asymmetric-epsilon formulation scored tangent boxes IoU 0.33)."""
    import jax.numpy as jnp

    from range_view_3d_detection_tpu.evaluation.iou_np import (
        iou_rotated_bev_np,
    )
    from range_view_3d_detection_tpu.ops.iou import iou_rotated_bev

    a = np.array([[1, 0.5, 2, 1, 0]], np.float32)
    tangent = np.array([[1, 1.5, 2, 1, 0]], np.float32)
    shifted = np.array([[2, 0.5, 2, 1, 0]], np.float32)
    for fn in (
        lambda x, y: np.asarray(iou_rotated_bev(jnp.asarray(x), jnp.asarray(y))),
        iou_rotated_bev_np,
    ):
        assert fn(a, tangent)[0, 0] < 1e-3
        np.testing.assert_allclose(fn(a, a)[0, 0], 1.0, atol=1e-4)
        np.testing.assert_allclose(fn(a, shifted)[0, 0], 1 / 3, atol=1e-3)
