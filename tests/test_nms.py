"""NMS tests vs numpy greedy oracles."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops import iou as iou_ops
from range_view_3d_detection_tpu.ops.nms import multiclass_nms


def _np_iou_bev(a, b):
    return np.asarray(
        iou_ops.iou_rotated_bev(
            jnp.asarray(a, jnp.float32), jnp.asarray(b, jnp.float32)
        )
    )


def _oracle_weighted_nms(boxes, scores, iou_thr, merge_thr, min_conf):
    """Greedy weighted NMS oracle (single class)."""
    bev = boxes[:, [0, 1, 3, 4, 6]]
    order = np.argsort(-scores, kind="stable")
    iou = _np_iou_bev(bev, bev)
    alive = scores >= min_conf
    kept, merged, mscores = [], [], []
    for i in order:
        if not alive[i]:
            continue
        cluster = alive & (iou[i] >= merge_thr)
        w = scores * cluster
        payload = np.concatenate(
            [
                boxes[:, :6],
                np.sin(boxes[:, 6:7]),
                np.cos(boxes[:, 6:7]),
                scores[:, None],
            ],
            axis=1,
        )
        m = (w[:, None] * payload).sum(0) / w.sum()
        kept.append(i)
        merged.append(np.concatenate([m[:6], [np.arctan2(m[6], m[7])]]))
        mscores.append(m[8])
        alive = alive & ~(iou[i] > iou_thr)
    return kept, np.array(merged), np.array(mscores)


def _random_boxes(n, seed=0, spread=20.0):
    rng = np.random.default_rng(seed)
    return np.stack(
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


def test_weighted_nms_vs_oracle():
    n = 64
    boxes = _random_boxes(n, seed=1, spread=10.0)
    rng = np.random.default_rng(2)
    scores = rng.uniform(0, 1, n).astype(np.float32)
    cats = np.zeros(n, np.int32)

    res = multiclass_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(cats),
        cap=64,
        block=16,
        iou_threshold=0.3,
        merge_threshold=0.5,
        min_confidence=0.1,
        mode="WEIGHTED",
    )
    keep = np.asarray(res.keep)
    got_boxes = np.asarray(res.cuboids)[keep]
    got_scores = np.asarray(res.scores)[keep]

    kept, merged, mscores = _oracle_weighted_nms(boxes, scores, 0.3, 0.5, 0.1)
    assert keep.sum() == len(kept)
    # multiclass_nms sorts by score internally; sort oracle outputs too.
    o = np.argsort(-mscores, kind="stable")
    g = np.argsort(-got_scores, kind="stable")
    np.testing.assert_allclose(got_scores[g], mscores[o], atol=1e-4)
    np.testing.assert_allclose(got_boxes[g][:, :6], merged[o][:, :6], atol=1e-3)


def test_hard_nms_keeps_highest():
    # Two overlapping boxes + one far box.
    boxes = np.array(
        [
            [0, 0, 0, 4, 2, 1, 0.0],
            [0.2, 0.1, 0, 4, 2, 1, 0.05],
            [50, 50, 0, 4, 2, 1, 0.3],
        ],
        dtype=np.float32,
    )
    scores = np.array([0.9, 0.8, 0.7], np.float32)
    cats = np.zeros(3, np.int32)
    res = multiclass_nms(
        jnp.asarray(boxes),
        jnp.asarray(scores),
        jnp.asarray(cats),
        cap=3,
        block=3,
        mode="HARD",
    )
    keep = np.asarray(res.keep)
    assert keep.sum() == 2
    kept_scores = sorted(np.asarray(res.scores)[keep].tolist(), reverse=True)
    np.testing.assert_allclose(kept_scores, [0.9, 0.7], atol=1e-6)
    # HARD mode must not merge: kept box 0 unchanged.
    got = np.asarray(res.cuboids)[np.asarray(res.scores) == np.float32(0.9)][0]
    np.testing.assert_allclose(got, boxes[0], atol=1e-5)


def test_multiclass_no_cross_suppression():
    # Identical overlapping boxes in different classes must both survive.
    boxes = np.array(
        [[0, 0, 0, 4, 2, 1, 0.0], [0, 0, 0, 4, 2, 1, 0.0]], dtype=np.float32
    )
    scores = np.array([0.9, 0.8], np.float32)
    cats = np.array([0, 1], np.int32)
    res = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats), cap=2, block=2
    )
    assert np.asarray(res.keep).sum() == 2


def test_min_confidence_filter():
    boxes = _random_boxes(8, seed=3, spread=100.0)
    scores = np.full(8, 0.05, np.float32)
    cats = np.zeros(8, np.int32)
    res = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats), cap=8, block=4
    )
    assert np.asarray(res.keep).sum() == 0


def test_post_nms_cap():
    boxes = _random_boxes(32, seed=11, spread=200.0)  # all disjoint
    scores = np.linspace(0.9, 0.2, 32).astype(np.float32)
    cats = np.zeros(32, np.int32)
    res = multiclass_nms(
        jnp.asarray(boxes), jnp.asarray(scores), jnp.asarray(cats),
        cap=32, block=8, num_post_nms=5,
    )
    keep = np.asarray(res.keep)
    assert keep.sum() == 5
    # The survivors are the 5 highest-scoring boxes.
    np.testing.assert_allclose(
        np.sort(np.asarray(res.scores)[keep])[::-1], scores[:5], atol=1e-5
    )
