"""Golden-number tests for the evaluation protocol clones.

Two tiers:
- Frozen-scene DRIFT pins (first two tests): deterministic random scenes
  whose outputs are pinned; they catch unintended protocol changes but
  certify nothing (a "fix" can legitimately move them — update with care).
- Hand-computable MICRO-SCENES (``*_by_hand``): every expected number is
  derived in the docstring from the protocol definition alone, so a
  protocol regression cannot be hidden by re-pinning.
"""

import numpy as np

from range_view_3d_detection_tpu.evaluation import av2_eval, waymo_eval


def _scene(seed=0, n_gt=40, n_extra_fp=10):
    rng = np.random.default_rng(seed)
    cats = rng.choice(["VEHICLE", "PEDESTRIAN"], n_gt)
    xyz = np.stack(
        [
            rng.uniform(-80, 80, n_gt),
            rng.uniform(-80, 80, n_gt),
            rng.uniform(-1, 1, n_gt),
        ],
        -1,
    )
    dims = np.stack(
        [
            rng.uniform(3.5, 5.5, n_gt),
            rng.uniform(1.6, 2.2, n_gt),
            rng.uniform(1.4, 2.0, n_gt),
        ],
        -1,
    )
    yaw = rng.uniform(-np.pi, np.pi, n_gt)
    ts = rng.integers(1, 4, n_gt) * 1_000_000_000

    def frame(xyz, dims, yaw, cats, ts, scores=None, pts=None):
        out = {
            "tx_m": xyz[:, 0],
            "ty_m": xyz[:, 1],
            "tz_m": xyz[:, 2],
            "length_m": dims[:, 0],
            "width_m": dims[:, 1],
            "height_m": dims[:, 2],
            "qw": np.cos(yaw / 2),
            "qx": np.zeros(len(yaw)),
            "qy": np.zeros(len(yaw)),
            "qz": np.sin(yaw / 2),
            "category": cats,
            "log_id": np.asarray(["log"] * len(yaw)),
            "timestamp_ns": ts.astype(np.int64),
        }
        if scores is not None:
            out["score"] = scores
        if pts is not None:
            out["num_interior_pts"] = pts
        return out

    gts = frame(xyz, dims, yaw, cats, ts, pts=rng.integers(1, 200, n_gt))

    # Detections: noisy copies of 80% of GTs + FPs.
    keep = rng.uniform(size=n_gt) < 0.8
    d_xyz = xyz[keep] + rng.normal(0, 0.4, (keep.sum(), 3))
    d_dims = dims[keep] * rng.uniform(0.9, 1.1, (keep.sum(), 3))
    d_yaw = yaw[keep] + rng.normal(0, 0.1, keep.sum())
    d_cats = cats[keep]
    d_ts = ts[keep]
    fp_xyz = np.stack(
        [
            rng.uniform(-80, 80, n_extra_fp),
            rng.uniform(-80, 80, n_extra_fp),
            rng.uniform(-1, 1, n_extra_fp),
        ],
        -1,
    )
    dts = frame(
        np.concatenate([d_xyz, fp_xyz]),
        np.concatenate([d_dims, dims[:n_extra_fp]]),
        np.concatenate([d_yaw, yaw[:n_extra_fp]]),
        np.concatenate([d_cats, cats[:n_extra_fp]]),
        np.concatenate([d_ts, ts[:n_extra_fp]]),
        scores=rng.uniform(0.3, 1.0, keep.sum() + n_extra_fp),
    )
    return dts, gts


def test_av2_protocol_golden():
    dts, gts = _scene(seed=42)
    res = av2_eval.evaluate(dts, gts, ["VEHICLE", "PEDESTRIAN"])
    avg = res["AVERAGE_METRICS"]
    np.testing.assert_allclose(avg["AP"], 0.4279, atol=2e-3)
    np.testing.assert_allclose(avg["ATE"], 0.6580, atol=2e-3)
    np.testing.assert_allclose(avg["CDS"], 0.3588, atol=2e-3)


def test_waymo_protocol_golden():
    dts, gts = _scene(seed=7)
    res = waymo_eval.evaluate_waymo(dts, gts, ["VEHICLE", "PEDESTRIAN"])
    m = waymo_eval.mean_ap(res, level=2)
    np.testing.assert_allclose(m, 0.1013, atol=2e-3)


# ---------------------------------------------------------------------------
# Hand-computable micro-scenes: every expected number below is derived in
# the docstring from the protocol definition alone, so a protocol
# regression cannot be "fixed" by re-pinning (the frozen-scene pins above
# only catch drift; these certify absolute values).
# ---------------------------------------------------------------------------


def _frame(rows, *, scores=None, pts=None):
    rows = np.asarray(rows, np.float64)  # x, y, z, l, w, h, yaw, ts
    out = {
        "tx_m": rows[:, 0],
        "ty_m": rows[:, 1],
        "tz_m": rows[:, 2],
        "length_m": rows[:, 3],
        "width_m": rows[:, 4],
        "height_m": rows[:, 5],
        "qw": np.cos(rows[:, 6] / 2),
        "qx": np.zeros(len(rows)),
        "qy": np.zeros(len(rows)),
        "qz": np.sin(rows[:, 6] / 2),
        "category": np.asarray(["VEHICLE"] * len(rows)),
        "log_id": np.asarray(["log"] * len(rows)),
        "timestamp_ns": rows[:, 7].astype(np.int64),
    }
    if scores is not None:
        out["score"] = np.asarray(scores, np.float64)
    if pts is not None:
        out["num_interior_pts"] = np.asarray(pts, np.int64)
    return out


def test_av2_micro_scene_by_hand():
    """2 GTs, 1 TP det (0.1 m offset, exact dims, +0.2 rad yaw), 1 far FP.

    Hand derivation (protocol: av2_eval module docstring):
    - Sorted by score: TP (0.9) then FP (0.8). At every affinity
      threshold (0.5/1/2/4 m): P/R points (1, 0.5) then (0.5, 0.5).
    - Interpolated precision on the 100-point recall grid
      linspace(0, 1, 100): grid points i/99 < 0.5 <=> i <= 49, i.e. 50
      points at precision 1, the rest 0 (right=0 beyond max recall; no
      grid point hits 0.5 exactly) -> AP = 50/100 = 0.5 per threshold,
      mean AP = 0.5.
    - TP metrics at 2 m: ATE = 0.1; ASE = 1 - aligned-scale IoU = 0
      (exact dims); AOE = 0.2.
    - CDS = AP * mean(1 - ATE/2, 1 - ASE, 1 - AOE/pi)
          = 0.5 * mean(0.95, 1.0, 1 - 0.2/pi) = 0.5 * (2.88634.../3).
    """
    ts = 1_000_000_000
    gts = _frame(
        [
            [0.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, ts],
            [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, ts],
        ],
        pts=[50, 50],
    )
    dts = _frame(
        [
            [0.1, 0.0, 0.0, 4.0, 2.0, 1.5, 0.2, ts],
            [50.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, ts],
        ],
        scores=[0.9, 0.8],
    )
    res = av2_eval.evaluate(dts, gts, ["VEHICLE"])["VEHICLE"]
    np.testing.assert_allclose(res["AP"], 0.5, atol=1e-9)
    np.testing.assert_allclose(res["ATE"], 0.1, atol=1e-9)
    np.testing.assert_allclose(res["ASE"], 0.0, atol=1e-9)
    np.testing.assert_allclose(res["AOE"], 0.2, atol=1e-9)
    want_cds = 0.5 * np.mean([1 - 0.1 / 2.0, 1.0, 1 - 0.2 / np.pi])
    np.testing.assert_allclose(res["CDS"], want_cds, atol=1e-9)


def test_waymo_micro_scene_by_hand():
    """1 detected L1 GT at 10 m + 1 undetected L2 GT (3 pts) at 40 m.

    Hand derivation (protocol: waymo_eval module docstring):
    - The single det (score 0.8) exactly equals GT1 -> IoU 1 >= 0.7.
    - Cutoffs linspace(0, 1, 101): c <= 0.8 -> matched, (P, R as below);
      c > 0.8 -> no detections, P = 1 (convention), R = 0.
    - L1 (GT1 only, GT2 ignored): R = 1 for c <= 0.8; envelope P = 1;
      trapezoid over R in [0, 1] -> AP = 1.0.
    - L2 all-range (2 GTs): R = 0.5 for c <= 0.8, P = 1 everywhere ->
      integral over observed recall [0, 0.5] of 1 -> AP = 0.5.
    - Range bands: GT1 in [0, 30): band num_gt = 1, R = 1 -> AP = 1.0;
      GT2 in [30, 50): no TP and the det buckets into [0, 30), so
      P = 1, R = 0 at every cutoff -> zero-width integral -> AP = 0.0.
    """
    ts = 1_000_000_000
    gts = _frame(
        [
            [10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, ts],
            [40.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, ts],
        ],
        pts=[50, 3],
    )
    dts = _frame(
        [[10.0, 0.0, 0.0, 4.0, 2.0, 1.5, 0.0, ts]], scores=[0.8]
    )
    res = waymo_eval.evaluate_waymo(dts, gts, ["VEHICLE"])
    np.testing.assert_allclose(res["VEHICLE/L1/0-inf/AP_3d"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["VEHICLE/L2/0-inf/AP_3d"], 0.5, atol=1e-9)
    np.testing.assert_allclose(res["VEHICLE/L2/0-30/AP_3d"], 1.0, atol=1e-9)
    np.testing.assert_allclose(res["VEHICLE/L2/30-50/AP_3d"], 0.0, atol=1e-9)
