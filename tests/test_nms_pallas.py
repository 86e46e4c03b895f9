"""Pallas NMS-scan kernel vs the lax reference implementation
(interpret mode on the CPU test mesh)."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops.nms import multiclass_nms


def _random_boxes(n, seed=0, spread=12.0):
    rng = np.random.default_rng(seed)
    boxes = np.stack(
        [
            rng.uniform(-spread, spread, n),
            rng.uniform(-spread, spread, n),
            rng.uniform(-2, 2, n),
            rng.uniform(2, 6, n),
            rng.uniform(1, 3, n),
            rng.uniform(1, 2, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    cats = rng.integers(0, 3, n).astype(np.int32)
    return boxes, scores, cats


def test_pallas_matches_lax_weighted():
    boxes, scores, cats = _random_boxes(128, seed=4)
    kw = dict(cap=128, block=32, iou_threshold=0.3, min_confidence=0.1)
    ref = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        backend="lax", **kw,
    )
    got = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        backend="pallas_interpret", **kw,
    )
    np.testing.assert_array_equal(np.asarray(got.keep), np.asarray(ref.keep))
    keep = np.asarray(ref.keep)
    np.testing.assert_allclose(
        np.asarray(got.cuboids)[keep], np.asarray(ref.cuboids)[keep], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.scores)[keep], np.asarray(ref.scores)[keep], atol=1e-5
    )


def test_pallas_matches_lax_hard():
    boxes, scores, cats = _random_boxes(64, seed=9)
    kw = dict(cap=64, block=16, mode="HARD")
    ref = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        backend="lax", **kw,
    )
    got = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        backend="pallas_interpret", **kw,
    )
    np.testing.assert_array_equal(np.asarray(got.keep), np.asarray(ref.keep))
    keep = np.asarray(ref.keep)
    np.testing.assert_allclose(
        np.asarray(got.cuboids)[keep], np.asarray(ref.cuboids)[keep], atol=1e-4
    )


def test_pallas_row_blocked_matches_lax():
    """cap=2048 streams the IoU matrix in row blocks through the grid
    (row_block=256, 8 grid steps) — the flagship nms_cap=2048 now takes
    the Pallas path. State must persist across grid steps exactly."""
    from range_view_3d_detection_tpu.kernels.nms_pallas import _pick_row_block

    assert _pick_row_block(2048) == 256
    assert _pick_row_block(1024) == 512
    assert _pick_row_block(64) == 64

    boxes, scores, cats = _random_boxes(2048, seed=11, spread=40.0)
    kw = dict(cap=2048, block=128, iou_threshold=0.3, min_confidence=0.1)
    ref = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        backend="lax", **kw,
    )
    got = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        backend="pallas_interpret", **kw,
    )
    np.testing.assert_array_equal(np.asarray(got.keep), np.asarray(ref.keep))
    keep = np.asarray(ref.keep)
    np.testing.assert_allclose(
        np.asarray(got.cuboids)[keep], np.asarray(ref.cuboids)[keep], atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(got.scores)[keep], np.asarray(ref.scores)[keep], atol=1e-5
    )
