"""Target-generation tests vs a numpy oracle of the reference semantics.

Oracle reimplements ``detection_head.py::compute_targets`` (496-665):
stable ascending sort by strided interior count, min-instance-id overlap
resolution, background = num_categories.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from range_view_3d_detection_tpu.ops import coding, targets as tgt_ops


def _make_scene(seed=0, H=8, W=32, K=6):
    rng = np.random.default_rng(seed)
    # Simple synthetic "range image": pixels on rays with increasing azimuth.
    az = np.linspace(-np.pi, np.pi, W, endpoint=False)
    incl = np.linspace(-0.3, 0.1, H)
    r = rng.uniform(5, 30, size=(H, W)).astype(np.float32)
    cart = np.stack(
        [
            r * np.cos(incl[:, None]) * np.cos(az[None, :]),
            r * np.cos(incl[:, None]) * np.sin(az[None, :]),
            r * np.sin(incl[:, None]),
        ],
        axis=-1,
    ).astype(np.float32)
    valid = rng.uniform(size=(H, W)) > 0.1

    n_real = 4
    # Center boxes on randomly chosen valid pixels so they contain points.
    ys, xs = np.nonzero(valid)
    pick = rng.choice(len(ys), n_real, replace=False)
    ctrs = cart[ys[pick], xs[pick]]
    boxes = np.zeros((K, 7), dtype=np.float32)
    boxes[:n_real, :3] = ctrs + rng.normal(0, 0.3, size=(n_real, 3))
    boxes[:n_real, 3:6] = rng.uniform(2, 12, size=(n_real, 3))
    boxes[:n_real, 6] = rng.uniform(-np.pi, np.pi, n_real)
    box_valid = np.zeros(K, bool)
    box_valid[:n_real] = True
    box_task = np.zeros(K, np.int32)
    box_offset = rng.integers(0, 3, K).astype(np.int32)
    return cart, valid, boxes, box_valid, box_task, box_offset


def _oracle(cart, valid, boxes, box_valid, box_offset, num_categories, stride):
    """Numpy reimplementation of the reference's per-task target loop."""
    H, W, _ = cart.shape
    K = boxes.shape[0]
    inside = np.zeros((K, H, W), bool)
    for k in range(K):
        if not box_valid[k]:
            continue
        x, y, z, l, w, h, yaw = boxes[k]
        c, s = np.cos(yaw), np.sin(yaw)
        d = cart - np.array([x, y, z])
        lx = c * d[..., 0] + s * d[..., 1]
        ly = -s * d[..., 0] + c * d[..., 1]
        inside[k] = (
            (np.abs(lx) <= l / 2)
            & (np.abs(ly) <= w / 2)
            & (np.abs(d[..., 2]) <= h / 2)
            & valid
        )
    inside_s = inside[:, :, ::stride]
    counts = inside_s.sum(axis=(1, 2))

    # Stable ascending sort (fewest points first).
    order = np.argsort(counts[box_valid], kind="stable")
    sel_idx = np.nonzero(box_valid)[0][order]

    Hs, Ws = inside_s.shape[1:]
    labels = np.full((Hs, Ws), num_categories, np.int64)
    winner = np.full((Hs, Ws), -1, np.int64)
    ppo = np.zeros((Hs, Ws), np.int64)
    # Instance ids assigned in sorted order; min id wins => iterate sorted
    # descending and let earlier (smaller id) overwrite.
    # Iterate descending priority; later (higher-priority = fewest-points)
    # writes overwrite earlier ones, replicating min-instance-id resolution.
    for k in sel_idx[::-1]:
        m = inside_s[k]
        labels[m] = box_offset[k]
        winner[m] = k
        ppo[m] = counts[k]
    return labels, winner, ppo, len(np.unique(winner[winner >= 0]))


def test_targets_match_oracle():
    for seed in range(4):
        cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(seed)
        got = tgt_ops.compute_targets_single(
            jnp.asarray(cart),
            jnp.asarray(valid),
            jnp.asarray(boxes),
            jnp.asarray(box_valid),
            jnp.asarray(box_task),
            jnp.asarray(box_offset),
            task_id=0,
            num_categories=3,
            stride=1,
        )
        labels, winner, ppo, num_obj = _oracle(
            cart, valid, boxes, box_valid, box_offset, 3, 1
        )
        np.testing.assert_array_equal(np.asarray(got.labels), labels)
        np.testing.assert_array_equal(np.asarray(got.winner_index), winner)
        np.testing.assert_array_equal(np.asarray(got.points_per_obj), ppo)
        assert int(got.num_objects) == num_obj


def test_targets_strided():
    cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(9, W=32)
    got = tgt_ops.compute_targets_single(
        jnp.asarray(cart),
        jnp.asarray(valid),
        jnp.asarray(boxes),
        jnp.asarray(box_valid),
        jnp.asarray(box_task),
        jnp.asarray(box_offset),
        task_id=0,
        num_categories=3,
        stride=2,
    )
    labels, winner, ppo, num_obj = _oracle(
        cart, valid, boxes, box_valid, box_offset, 3, 2
    )
    assert got.labels.shape == (8, 16)
    np.testing.assert_array_equal(np.asarray(got.labels), labels)
    np.testing.assert_array_equal(np.asarray(got.winner_index), winner)


def test_regression_targets_decode_back():
    """Decoding the regression target at a fg pixel must recover the box."""
    cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(3)
    got = tgt_ops.compute_targets_single(
        jnp.asarray(cart),
        jnp.asarray(valid),
        jnp.asarray(boxes),
        jnp.asarray(box_valid),
        jnp.asarray(box_task),
        jnp.asarray(box_offset),
        task_id=0,
        num_categories=3,
        stride=1,
    )
    winner = np.asarray(got.winner_index)
    reg = np.asarray(got.regression_targets)
    dec = np.asarray(coding.decode_boxes(jnp.asarray(reg), jnp.asarray(cart)))
    fg = winner >= 0
    assert fg.sum() > 0
    want = boxes[winner[fg]]
    np.testing.assert_allclose(dec[fg][:, :6], want[:, :6], atol=1e-2)


def test_task_filtering():
    cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(4)
    box_task = box_task.copy()
    box_task[:] = 1  # no boxes in task 0
    got = tgt_ops.compute_targets_single(
        jnp.asarray(cart),
        jnp.asarray(valid),
        jnp.asarray(boxes),
        jnp.asarray(box_valid),
        jnp.asarray(box_task),
        jnp.asarray(box_offset),
        task_id=0,
        num_categories=3,
        stride=1,
    )
    assert (np.asarray(got.winner_index) == -1).all()
    assert (np.asarray(got.labels) == 3).all()
    assert int(got.num_objects) == 0


@pytest.mark.slow
def test_batched_api():
    cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(5)
    B = 2
    out = tgt_ops.compute_targets(
        jnp.asarray(np.stack([cart] * B)),
        jnp.asarray(np.stack([valid] * B)),
        jnp.asarray(np.stack([boxes] * B)),
        jnp.asarray(np.stack([box_valid] * B)),
        jnp.asarray(np.stack([box_task] * B)),
        jnp.asarray(np.stack([box_offset] * B)),
        tasks={0: ["A", "B", "C"]},
        fpn_strides=[1, 2],
    )
    assert out[1][0].labels.shape == (B, 8, 32)
    assert out[2][0].labels.shape == (B, 8, 16)
    np.testing.assert_array_equal(
        np.asarray(out[1][0].labels[0]), np.asarray(out[1][0].labels[1])
    )


def test_range_fpn_assignment():
    """RANGE mode gates boxes by center range per FPN stride."""
    cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(6)
    dists = np.linalg.norm(boxes[:, :3], axis=-1)
    # Partition excluding every real box -> no assignments.
    got = tgt_ops.compute_targets_single(
        jnp.asarray(cart), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(box_valid), jnp.asarray(box_task), jnp.asarray(box_offset),
        task_id=0, num_categories=3, stride=1,
        fpn_assignment_method="RANGE",
        range_partition=(1000.0, 2000.0),
    )
    assert int(got.num_objects) == 0
    # Partition covering all boxes == unfiltered result.
    got_all = tgt_ops.compute_targets_single(
        jnp.asarray(cart), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(box_valid), jnp.asarray(box_task), jnp.asarray(box_offset),
        task_id=0, num_categories=3, stride=1,
        fpn_assignment_method="RANGE",
        range_partition=(0.0, float("inf")),
    )
    base = tgt_ops.compute_targets_single(
        jnp.asarray(cart), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(box_valid), jnp.asarray(box_task), jnp.asarray(box_offset),
        task_id=0, num_categories=3, stride=1,
    )
    np.testing.assert_array_equal(
        np.asarray(got_all.winner_index), np.asarray(base.winner_index)
    )
    # Partial gate keeps only in-range boxes.
    mid = float(np.median(dists[box_valid]))
    got_mid = tgt_ops.compute_targets_single(
        jnp.asarray(cart), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(box_valid), jnp.asarray(box_task), jnp.asarray(box_offset),
        task_id=0, num_categories=3, stride=1,
        fpn_assignment_method="RANGE",
        range_partition=(0.0, mid),
    )
    winners = np.unique(np.asarray(got_mid.winner_index))
    for w in winners[winners >= 0]:
        assert dists[w] <= mid


def test_points_fpn_assignment():
    """POINTS mode gates boxes by full-res interior count."""
    cart, valid, boxes, box_valid, box_task, box_offset = _make_scene(7)
    base = tgt_ops.compute_targets_single(
        jnp.asarray(cart), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(box_valid), jnp.asarray(box_task), jnp.asarray(box_offset),
        task_id=0, num_categories=3, stride=1,
    )
    counts = {}
    win = np.asarray(base.winner_index)
    ppo = np.asarray(base.points_per_obj)
    for w in np.unique(win[win >= 0]):
        counts[int(w)] = int(ppo[win == w].max())
    if not counts:
        return
    thresh = float(np.median(list(counts.values())))
    got = tgt_ops.compute_targets_single(
        jnp.asarray(cart), jnp.asarray(valid), jnp.asarray(boxes),
        jnp.asarray(box_valid), jnp.asarray(box_task), jnp.asarray(box_offset),
        task_id=0, num_categories=3, stride=1,
        fpn_assignment_method="POINTS",
        point_interval=(thresh, float("inf")),
    )
    win2 = np.unique(np.asarray(got.winner_index))
    for w in win2[win2 >= 0]:
        assert counts.get(int(w), 0) > thresh
