"""AV2-protocol metric tests on hand-constructed scenarios."""

import numpy as np

from range_view_3d_detection_tpu.evaluation import av2_eval


def _frame(xyz, dims, yaw, cats, scores=None, log="l0", ts=1):
    n = len(xyz)
    out = {
        "tx_m": np.asarray([p[0] for p in xyz], float),
        "ty_m": np.asarray([p[1] for p in xyz], float),
        "tz_m": np.asarray([p[2] for p in xyz], float),
        "length_m": np.asarray([d[0] for d in dims], float),
        "width_m": np.asarray([d[1] for d in dims], float),
        "height_m": np.asarray([d[2] for d in dims], float),
        "qw": np.cos(np.asarray(yaw) / 2),
        "qx": np.zeros(n),
        "qy": np.zeros(n),
        "qz": np.sin(np.asarray(yaw) / 2),
        "category": np.asarray(cats),
        "log_id": np.asarray([log] * n),
        "timestamp_ns": np.full(n, ts, np.int64),
    }
    if scores is not None:
        out["score"] = np.asarray(scores, float)
    else:
        out["num_interior_pts"] = np.full(n, 10, np.int64)
    return out


def test_perfect_detections():
    gts = _frame(
        [(10, 0, 0), (0, 20, 1)], [(4, 2, 1.5)] * 2, [0.3, -0.5], ["CAR"] * 2
    )
    dts = _frame(
        [(10, 0, 0), (0, 20, 1)],
        [(4, 2, 1.5)] * 2,
        [0.3, -0.5],
        ["CAR"] * 2,
        scores=[0.9, 0.8],
    )
    res = av2_eval.evaluate(dts, gts, ["CAR"])
    assert res["CAR"]["AP"] > 0.99
    assert res["CAR"]["ATE"] < 1e-6
    assert res["CAR"]["ASE"] < 1e-6
    assert res["CAR"]["AOE"] < 1e-6
    assert res["CAR"]["CDS"] > 0.99


def test_missed_and_false_positive():
    gts = _frame([(10, 0, 0), (30, 0, 0)], [(4, 2, 1.5)] * 2, [0, 0], ["CAR"] * 2)
    # One perfect match + one FP far away; one GT missed.
    dts = _frame(
        [(10, 0, 0), (-40, 0, 0)],
        [(4, 2, 1.5)] * 2,
        [0, 0],
        ["CAR"] * 2,
        scores=[0.9, 0.5],
    )
    res = av2_eval.evaluate(dts, gts, ["CAR"])
    # Max recall 0.5, precision at that recall 1.0 then drops.
    assert 0.2 < res["CAR"]["AP"] < 0.6


def test_translation_error_measured():
    gts = _frame([(10, 0, 0)], [(4, 2, 1.5)], [0], ["CAR"])
    dts = _frame(
        [(10, 1.0, 0)], [(4, 2, 1.5)], [0], ["CAR"], scores=[0.9]
    )
    res = av2_eval.evaluate(dts, gts, ["CAR"])
    np.testing.assert_allclose(res["CAR"]["ATE"], 1.0, atol=1e-6)
    # matched at 2m/4m but not 0.5m/1.0m (1.0 <= 1.0 matches)
    assert 0.4 < res["CAR"]["AP"] <= 0.8


def test_range_filter():
    gts = _frame([(200, 0, 0)], [(4, 2, 1.5)], [0], ["CAR"])
    dts = _frame([(10, 0, 0)], [(4, 2, 1.5)], [0], ["CAR"], scores=[0.9])
    res = av2_eval.evaluate(dts, gts, ["CAR"])
    # GT out of range -> no gts -> AP 0, excluded from average presence.
    assert res["CAR"]["num_gts"] == 0


def test_category_separation():
    gts = _frame([(10, 0, 0)], [(4, 2, 1.5)], [0], ["CAR"])
    dts = _frame([(10, 0, 0)], [(4, 2, 1.5)], [0], ["PED"], scores=[0.9])
    res = av2_eval.evaluate(dts, gts, ["CAR", "PED"])
    assert res["CAR"]["AP"] == 0.0


def test_orientation_error():
    gts = _frame([(10, 0, 0)], [(4, 2, 1.5)], [0.0], ["CAR"])
    dts = _frame(
        [(10, 0, 0)], [(4, 2, 1.5)], [np.pi / 2], ["CAR"], scores=[0.9]
    )
    res = av2_eval.evaluate(dts, gts, ["CAR"])
    np.testing.assert_allclose(res["CAR"]["AOE"], np.pi / 2, atol=1e-5)
