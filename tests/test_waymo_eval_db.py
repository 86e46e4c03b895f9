"""Waymo-protocol eval tests + GT-database build/sample round trip."""

import numpy as np
import pytest

from range_view_3d_detection_tpu.evaluation import waymo_eval


def _frame(xyz, dims, yaw, cats, scores=None, pts=None, log="l", ts=1):
    n = len(xyz)
    out = {
        "tx_m": np.asarray([p[0] for p in xyz], float),
        "ty_m": np.asarray([p[1] for p in xyz], float),
        "tz_m": np.asarray([p[2] for p in xyz], float),
        "length_m": np.asarray([d[0] for d in dims], float),
        "width_m": np.asarray([d[1] for d in dims], float),
        "height_m": np.asarray([d[2] for d in dims], float),
        "qw": np.cos(np.asarray(yaw, float) / 2),
        "qx": np.zeros(n),
        "qy": np.zeros(n),
        "qz": np.sin(np.asarray(yaw, float) / 2),
        "category": np.asarray(cats),
        "log_id": np.asarray([log] * n),
        "timestamp_ns": np.full(n, ts, np.int64),
    }
    if scores is not None:
        out["score"] = np.asarray(scores, float)
    if pts is not None:
        out["num_interior_pts"] = np.asarray(pts, np.int64)
    return out


def test_waymo_perfect():
    gts = _frame(
        [(10, 0, 1), (40, 5, 1)],
        [(4.5, 2, 1.8)] * 2,
        [0.2, 1.0],
        ["VEHICLE"] * 2,
        pts=[100, 100],
    )
    dts = _frame(
        [(10, 0, 1), (40, 5, 1)],
        [(4.5, 2, 1.8)] * 2,
        [0.2, 1.0],
        ["VEHICLE"] * 2,
        scores=[0.9, 0.8],
    )
    # max_recall_delta=None: these sanity tests target matching/level
    # semantics; with 1-2 GTs the official recall-gap penalty clips any
    # AP to ~0.05-0.1 no matter how good the detector (the penalty
    # itself is goldened in test_eval_golden.py).
    res = waymo_eval.evaluate_waymo(
        dts, gts, ["VEHICLE"], max_recall_delta=None
    )
    assert res["VEHICLE/L2/0-inf/AP_3d"] > 0.95
    assert res["VEHICLE/L1/0-inf/AP_3d"] > 0.95
    # range breakdowns: one GT in 0-30, one in 30-50
    assert res["VEHICLE/L2/0-30/AP_3d"] > 0.95
    assert res["VEHICLE/L2/30-50/AP_3d"] > 0.95
    assert waymo_eval.mean_ap(res) > 0.95


def test_waymo_level_split():
    # A 3-point GT is LEVEL_2 only: L1 has no counted GTs.
    gts = _frame(
        [(10, 0, 1)], [(4.5, 2, 1.8)], [0.0], ["VEHICLE"], pts=[3]
    )
    dts = _frame(
        [(10, 0, 1)], [(4.5, 2, 1.8)], [0.0], ["VEHICLE"], scores=[0.9]
    )
    res = waymo_eval.evaluate_waymo(
        dts, gts, ["VEHICLE"], max_recall_delta=None
    )
    assert res["VEHICLE/L2/0-inf/AP_3d"] > 0.95
    assert res["VEHICLE/L1/0-inf/AP_3d"] == 0.0


def test_waymo_iou_threshold():
    # Vehicle offset enough to be below 0.7 IoU -> FP.
    gts = _frame([(10, 0, 1)], [(4, 2, 1.8)], [0.0], ["VEHICLE"], pts=[50])
    dts = _frame(
        [(10, 1.5, 1)], [(4, 2, 1.8)], [0.0], ["VEHICLE"], scores=[0.9]
    )
    res = waymo_eval.evaluate_waymo(dts, gts, ["VEHICLE"])
    assert res["VEHICLE/L2/0-inf/AP_3d"] < 0.1


def test_database_build_and_sample(tmp_path):
    from range_view_3d_detection_tpu.data.database import (
        DatabaseSampler,
        build_database,
    )
    from range_view_3d_detection_tpu.data.synthetic import generate_dataset

    root = tmp_path / "sensor"
    generate_dataset(
        root,
        splits={"train": 1},
        sweeps_per_log=2,
        height=8,
        width=56,
        num_boxes=4,
        num_bg_points=800,
        seed=3,
    )
    db = tmp_path / "db"
    build_database(
        root,
        db,
        height=8,
        width=56,
        feature_columns=("intensity", "range", "x", "y", "z"),
        min_interior_pts=1,
    )
    assert (db / "db.feather").is_file()

    sampler = DatabaseSampler(db)
    assert len(sampler.catalog["row_nr"]) > 0

    H, W = 8, 56
    sweep = {
        "features": np.zeros((H, W, 5), np.float32),
        "cart": np.zeros((H, W, 3), np.float32),
        "range": np.zeros((H, W), np.float32),
        "mask": np.zeros((H, W), bool),
    }
    rng = np.random.default_rng(0)
    sweep, boxes, cats = sampler.sample(
        sweep,
        np.zeros((0, 7), np.float32),
        np.zeros(0, dtype="<U32"),
        {"REGULAR_VEHICLE": 2, "PEDESTRIAN": 2},
        rng,
        feature_columns=("intensity", "range", "x", "y", "z"),
    )
    assert len(boxes) > 0
    assert sweep["mask"].sum() > 0
    # Pasted pixels carry consistent cart/range.
    ys, xs = np.nonzero(sweep["mask"])
    np.testing.assert_allclose(
        np.linalg.norm(sweep["cart"][ys, xs], axis=-1),
        sweep["range"][ys, xs],
        rtol=1e-4,
    )
