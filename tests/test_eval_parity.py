"""Cross-validation of the evaluation protocol clones.

The official ``av2`` / ``waymo_open_dataset`` evaluators cannot be
installed in this image (zero egress), so recorded official fixtures are
impossible. Instead each protocol is implemented here a SECOND time as a
deliberately naive, loop-based oracle (different structure: per-detection
python loops, exhaustive assignment enumeration instead of scipy
Hungarian) and the production evaluators are required to agree with it on
randomized scenes. This catches vectorization and bookkeeping bugs in the
production code; the protocol definitions themselves are documented
against the reference (``nn/arch/detector.py:547-616``,
``evaluation/evaluate.py:289-348``).
"""

import itertools

import numpy as np
import pytest

from range_view_3d_detection_tpu.evaluation import av2_eval, waymo_eval
from range_view_3d_detection_tpu.evaluation.iou_np import iou_rotated_bev_np


# ---------------------------------------------------------------------------
# AV2 oracle: nearest-GT assignment + per-GT dedupe, loop-based.
# ---------------------------------------------------------------------------


def _av2_oracle_assign(dt_xyz, scores, gt_xyz, threshold):
    """Per-detection loop version of the devkit rule: each GT is claimed
    by its highest-scoring assigned detection REGARDLESS of distance
    (dedupe precedes thresholding); the claim is a TP only when within
    the threshold."""
    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    claimed = set()
    tp = [False] * len(scores)
    match = [-1] * len(scores)
    for i in order:
        if len(gt_xyz) == 0:
            break
        dists = [float(np.linalg.norm(dt_xyz[i] - g)) for g in gt_xyz]
        j = int(np.argmin(dists))
        match[i] = j
        if j not in claimed:
            claimed.add(j)
            if dists[j] < threshold:
                tp[i] = True
    return tp, match


def _av2_oracle_ap(tp_by_score_order, num_gt):
    """100-sample interpolated AP, loop-based."""
    if num_gt == 0 or not tp_by_score_order:
        return 0.0
    precisions, recalls = [], []
    n_tp = 0
    for i, t in enumerate(tp_by_score_order):
        n_tp += int(t)
        precisions.append(n_tp / (i + 1))
        recalls.append(n_tp / num_gt)
    # Envelope: p(r) = max precision at recall >= r.
    out = 0.0
    for r in np.linspace(0, 1, 100):
        best = 0.0
        for p_i, r_i in zip(precisions, recalls):
            if r_i >= r - 1e-12:
                best = max(best, p_i)
        # Mimic np.interp(right=0.0) with a left-plateau: below the first
        # achieved recall the envelope equals the best precision overall.
        if r <= recalls[0]:
            best = max(precisions)
        if r > recalls[-1] + 1e-12:
            best = 0.0
        out += best
    return out / 100


def _rand_scene(rng, n_gt, n_dt, n_sweeps=3, spread=60.0):
    ts = rng.integers(0, n_sweeps, n_gt) * 10**9
    gts = {
        "tx_m": rng.uniform(-spread, spread, n_gt),
        "ty_m": rng.uniform(-spread, spread, n_gt),
        "tz_m": rng.uniform(-1, 1, n_gt),
        "length_m": rng.uniform(3, 6, n_gt),
        "width_m": rng.uniform(1.5, 2.2, n_gt),
        "height_m": rng.uniform(1.3, 2.0, n_gt),
        "qw": np.ones(n_gt),
        "qx": np.zeros(n_gt),
        "qy": np.zeros(n_gt),
        "qz": np.zeros(n_gt),
        "category": np.asarray(["VEHICLE"] * n_gt),
        "log_id": np.asarray(["log"] * n_gt),
        "timestamp_ns": ts.astype(np.int64),
        "num_interior_pts": rng.integers(1, 50, n_gt),
    }
    dt = rng.integers(0, n_sweeps, n_dt) * 10**9
    dts = {
        "tx_m": rng.uniform(-spread, spread, n_dt),
        "ty_m": rng.uniform(-spread, spread, n_dt),
        "tz_m": rng.uniform(-1, 1, n_dt),
        "length_m": rng.uniform(3, 6, n_dt),
        "width_m": rng.uniform(1.5, 2.2, n_dt),
        "height_m": rng.uniform(1.3, 2.0, n_dt),
        "qw": np.ones(n_dt),
        "qx": np.zeros(n_dt),
        "qy": np.zeros(n_dt),
        "qz": np.zeros(n_dt),
        "score": rng.uniform(0.05, 1.0, n_dt),
        "category": np.asarray(["VEHICLE"] * n_dt),
        "log_id": np.asarray(["log"] * n_dt),
        "timestamp_ns": dt.astype(np.int64),
    }
    # Make half the detections noisy GT copies so TPs exist.
    n_copy = min(n_dt // 2, n_gt)
    for k in ("tx_m", "ty_m", "tz_m"):
        dts[k][:n_copy] = gts[k][:n_copy] + rng.normal(0, 0.5, n_copy)
    dts["timestamp_ns"][:n_copy] = gts["timestamp_ns"][:n_copy]
    return dts, gts


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_av2_assignment_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    n_dt, n_gt = 14, 9
    dt_xyz = rng.uniform(-10, 10, (n_dt, 3))
    gt_xyz = rng.uniform(-10, 10, (n_gt, 3))
    scores = rng.uniform(size=n_dt)
    order = np.argsort(-scores, kind="stable")
    tp, _ = av2_eval.assign_sweep(dt_xyz[order], gt_xyz)
    for ti, thr in enumerate(av2_eval.AFFINITY_THRESHOLDS_M):
        otp, _ = _av2_oracle_assign(dt_xyz, scores, gt_xyz, thr)
        np.testing.assert_array_equal(
            tp[:, ti], np.asarray(otp)[order], err_msg=f"thr={thr}"
        )


@pytest.mark.parametrize("seed", [0, 5])
def test_av2_ap_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    dts, gts = _rand_scene(rng, n_gt=20, n_dt=30)
    res = av2_eval.evaluate(dts, gts, ["VEHICLE"])
    # Oracle AP: per sweep oracle assignment, global score sort.
    uuid_d = dts["timestamp_ns"]
    uuid_g = gts["timestamp_ns"]
    aps = []
    for thr in av2_eval.AFFINITY_THRESHOLDS_M:
        recs = []
        for sid in np.unique(np.concatenate([uuid_d, uuid_g])):
            ds = np.flatnonzero(uuid_d == sid)
            gs = np.flatnonzero(uuid_g == sid)
            d_xyz = np.stack(
                [dts["tx_m"][ds], dts["ty_m"][ds], dts["tz_m"][ds]], -1
            )
            g_xyz = np.stack(
                [gts["tx_m"][gs], gts["ty_m"][gs], gts["tz_m"][gs]], -1
            )
            otp, _ = _av2_oracle_assign(d_xyz, dts["score"][ds], g_xyz, thr)
            for i, t in enumerate(otp):
                recs.append((dts["score"][ds][i], t))
        recs.sort(key=lambda x: -x[0])
        aps.append(
            _av2_oracle_ap([t for _, t in recs], len(gts["tx_m"]))
        )
    np.testing.assert_allclose(
        res["VEHICLE"]["AP"], np.mean(aps), atol=1e-6
    )


def test_av2_dedupe_and_uuid_join(tmp_path):
    rng = np.random.default_rng(3)
    dts, gts = _rand_scene(rng, n_gt=8, n_dt=12, n_sweeps=2)
    # Duplicate every prediction row (simulates a re-written shard) and
    # add predictions on a sweep with no GT.
    dts2 = {k: np.concatenate([v, v]) for k, v in dts.items()}
    ghost = {k: np.asarray(v[:3]) for k, v in dts.items()}
    ghost["timestamp_ns"] = np.full(3, 77 * 10**9, np.int64)
    dts3 = {k: np.concatenate([dts2[k], ghost[k]]) for k in dts2}

    deduped = av2_eval.dedupe_predictions(dts3)
    assert len(deduped["score"]) == len(dts["score"]) + 3

    joined_d, joined_g = av2_eval._join_valid_uuids(deduped, gts)
    assert not np.isin(77 * 10**9, joined_d["timestamp_ns"])

    base = av2_eval.evaluate(dts, gts, ["VEHICLE"])
    after = av2_eval.evaluate(joined_d, joined_g, ["VEHICLE"])
    np.testing.assert_allclose(
        base["VEHICLE"]["AP"], after["VEHICLE"]["AP"], atol=1e-9
    )


def test_av2_roi_filtering():
    rng = np.random.default_rng(9)
    dts, gts = _rand_scene(rng, n_gt=10, n_dt=10)
    gts["is_within_roi"] = np.zeros(10, bool)  # nothing evaluable
    res = av2_eval.evaluate(dts, gts, ["VEHICLE"])
    assert res["VEHICLE"]["num_gts"] == 0
    res2 = av2_eval.evaluate(
        dts, gts, ["VEHICLE"], eval_only_roi_instances=False
    )
    assert res2["VEHICLE"]["num_gts"] == 10


# ---------------------------------------------------------------------------
# Waymo oracle: per-cutoff exhaustive max-IoU assignment (tiny sweeps).
# ---------------------------------------------------------------------------


def _best_assignment(iou, thr):
    """Exhaustively maximize total IoU over one-to-one assignments."""
    n_d, n_g = iou.shape
    best, best_pairs = -1.0, []
    gt_slots = list(range(n_g)) + [-1] * n_d  # -1 = unassigned
    for perm in itertools.permutations(gt_slots, n_d):
        if len(set(p for p in perm if p >= 0)) != sum(
            1 for p in perm if p >= 0
        ):
            continue
        tot = sum(iou[i, j] for i, j in enumerate(perm) if j >= 0)
        if tot > best:
            best = tot
            best_pairs = [
                (i, j) for i, j in enumerate(perm) if j >= 0 and iou[i, j] >= thr
            ]
    return best_pairs


def _waymo_oracle(dts, gts, cat="VEHICLE", mode="bev"):
    """Loop-based per-cutoff evaluation, all-range LEVEL_2 only."""
    thr = waymo_eval.IOU_THRESHOLDS[cat]
    uuids = np.unique(
        np.concatenate([dts["timestamp_ns"], gts["timestamp_ns"]])
    )
    num_gt = int((gts["category"] == cat).sum())
    precisions, recalls = [], []
    for c in np.linspace(0, 1, waymo_eval.NUM_SCORE_CUTOFFS):
        n_tp = n_det = 0
        for sid in uuids:
            ds = np.flatnonzero(
                (dts["category"] == cat)
                & (dts["timestamp_ns"] == sid)
                & (dts["score"] >= c)
            )
            gs = np.flatnonzero(
                (gts["category"] == cat) & (gts["timestamp_ns"] == sid)
            )
            dbox = waymo_eval._boxes(dts, ds)
            gbox = waymo_eval._boxes(gts, gs)
            n_det += len(ds)
            if len(ds) == 0 or len(gs) == 0:
                continue
            iou = iou_rotated_bev_np(
                dbox[:, [0, 1, 3, 4, 6]], gbox[:, [0, 1, 3, 4, 6]]
            )
            n_tp += len(_best_assignment(iou, thr))
        precisions.append(n_tp / n_det if n_det else 1.0)
        recalls.append(n_tp / num_gt if num_gt else 0.0)
    return waymo_eval._ap_from_pr(
        np.asarray(precisions), np.asarray(recalls)
    )


@pytest.mark.parametrize("seed", [0, 4])
def test_waymo_percutoff_matches_oracle(seed):
    rng = np.random.default_rng(seed)
    # Tiny sweeps so exhaustive assignment is tractable (<=5 dts/sweep).
    dts, gts = _rand_scene(rng, n_gt=6, n_dt=8, n_sweeps=4, spread=25.0)
    res = waymo_eval.evaluate_waymo(dts, gts, ["VEHICLE"], mode="bev")
    oracle = _waymo_oracle(dts, gts, "VEHICLE", mode="bev")
    np.testing.assert_allclose(
        res["VEHICLE/L2/0-inf/AP_bev"], oracle, atol=1e-6
    )


def test_waymo_eval_workers_identical():
    """The process-pool path returns bit-identical metrics to serial."""
    rng = np.random.default_rng(7)
    dts, gts = _rand_scene(rng, n_gt=10, n_dt=14, n_sweeps=6, spread=40.0)
    serial = waymo_eval.evaluate_waymo(dts, gts, ["VEHICLE"], mode="bev")
    par = waymo_eval.evaluate_waymo(
        dts, gts, ["VEHICLE"], mode="bev", workers=2
    )
    assert serial.keys() == par.keys()
    for k in serial:
        np.testing.assert_allclose(serial[k], par[k], atol=0)


def test_waymo_rematching_changes_low_score_fate():
    """A low-score TP displaced by a high-score near-duplicate must become
    a TP again at cutoffs that exclude the high-score detection's rival —
    the distinguishing behavior of per-cutoff re-matching."""
    gts = {
        "tx_m": np.asarray([0.0]),
        "ty_m": np.asarray([0.0]),
        "tz_m": np.asarray([0.0]),
        "length_m": np.asarray([4.0]),
        "width_m": np.asarray([2.0]),
        "height_m": np.asarray([1.8]),
        "qw": np.ones(1),
        "qx": np.zeros(1),
        "qy": np.zeros(1),
        "qz": np.zeros(1),
        "category": np.asarray(["VEHICLE"]),
        "log_id": np.asarray(["log"]),
        "timestamp_ns": np.asarray([0], np.int64),
        "num_interior_pts": np.asarray([50]),
    }
    # Two detections on the same GT: a perfect one at score 0.4 and a
    # shifted (IoU ~0.72) one at score 0.9.
    dts = {
        "tx_m": np.asarray([0.0, 0.35]),
        "ty_m": np.asarray([0.0, 0.0]),
        "tz_m": np.asarray([0.0, 0.0]),
        "length_m": np.asarray([4.0, 4.0]),
        "width_m": np.asarray([2.0, 2.0]),
        "height_m": np.asarray([1.8, 1.8]),
        "qw": np.ones(2),
        "qx": np.zeros(2),
        "qy": np.zeros(2),
        "qz": np.zeros(2),
        "score": np.asarray([0.4, 0.9]),
        "category": np.asarray(["VEHICLE"] * 2),
        "log_id": np.asarray(["log"] * 2),
        "timestamp_ns": np.asarray([0, 0], np.int64),
    }
    # Penalty disabled: the subject here is per-cutoff re-matching, and
    # a 1-GT scene's 0->1 recall leap would otherwise clip to 0.05 and
    # mask whether the low-score detection became a TP at all.
    res = waymo_eval.evaluate_waymo(
        dts, gts, ["VEHICLE"], mode="bev", max_recall_delta=None
    )
    # At every cutoff the single kept/matched detection is a TP (both
    # boxes exceed 0.7 IoU), so precision = 1 everywhere => AP == 1.
    np.testing.assert_allclose(res["VEHICLE/L2/0-inf/AP_bev"], 1.0, atol=1e-6)


def test_waymo_level1_ignores_hard_matches():
    gts = {
        "tx_m": np.asarray([0.0, 20.0]),
        "ty_m": np.asarray([0.0, 0.0]),
        "tz_m": np.asarray([0.0, 0.0]),
        "length_m": np.asarray([4.0, 4.0]),
        "width_m": np.asarray([2.0, 2.0]),
        "height_m": np.asarray([1.8, 1.8]),
        "qw": np.ones(2),
        "qx": np.zeros(2),
        "qy": np.zeros(2),
        "qz": np.zeros(2),
        "category": np.asarray(["VEHICLE"] * 2),
        "log_id": np.asarray(["log"] * 2),
        "timestamp_ns": np.asarray([0, 0], np.int64),
        "num_interior_pts": np.asarray([50, 2]),  # second is LEVEL_2
    }
    dts = {
        k: (v.copy() if isinstance(v, np.ndarray) else v)
        for k, v in gts.items()
        if k != "num_interior_pts"
    }
    dts["score"] = np.asarray([0.9, 0.8])
    # Penalty off: the subject is LEVEL ignore semantics, and tiny-scene
    # recall leaps would clip every AP to ~0.05 regardless of matching.
    res = waymo_eval.evaluate_waymo(
        dts, gts, ["VEHICLE"], mode="bev", max_recall_delta=None
    )
    # L1: one counted GT, its detection TP; the L2 match is ignored (not
    # an FP), so precision stays 1 => AP 1. L2: both TPs => AP 1.
    np.testing.assert_allclose(res["VEHICLE/L1/0-inf/AP_bev"], 1.0, atol=1e-6)
    np.testing.assert_allclose(res["VEHICLE/L2/0-inf/AP_bev"], 1.0, atol=1e-6)


def test_av2_dedupe_precedes_thresholding():
    """Devkit semantics: a GT claimed by a far, high-scoring detection is
    NOT matched by a closer low-scoring duplicate — both are FP at small
    thresholds."""
    gt = np.asarray([[0.0, 0.0, 0.0]])
    dts = np.asarray([[3.0, 0.0, 0.0], [0.4, 0.0, 0.0]])  # far A, near B
    scores = np.asarray([0.9, 0.5])
    order = np.argsort(-scores)
    tp, _ = av2_eval.assign_sweep(dts[order], gt)
    # t = 0.5, 1.0, 2.0: A (winner) outside, B blocked => no TPs.
    assert not tp[:, 0].any() and not tp[:, 1].any() and not tp[:, 2].any()
    # t = 4.0: A (winner) within => TP; B still FP.
    np.testing.assert_array_equal(tp[:, 3], [True, False])


def test_evaluate_predictions_waymo_dispatch(tmp_path):
    """Shard-file entry dispatches to the WOD protocol for waymo datasets
    (reference detector.py:457-535 dispatch)."""
    from range_view_3d_detection_tpu.utils.feather import write_feather

    rng = np.random.default_rng(11)
    dts, gts = _rand_scene(rng, n_gt=6, n_dt=8, n_sweeps=2, spread=25.0)
    gt_dir = tmp_path / "val" / "log"
    write_feather(
        gt_dir / "annotations.feather",
        {k: v for k, v in gts.items() if k != "log_id"},
    )
    pred_dir = tmp_path / "preds"
    write_feather(pred_dir / "shard0.feather", dts)

    res = av2_eval.evaluate_predictions(
        pred_dir,
        tmp_path / "val",
        ["VEHICLE"],
        dataset_name="waymo",
        eval_only_roi_instances=False,
        max_range_m=float("inf"),
    )
    assert "mAP_L2" in res["AVERAGE_METRICS"]
    assert "L2/0-inf/AP_3d" in res["VEHICLE"]
