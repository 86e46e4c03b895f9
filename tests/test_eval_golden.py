"""Golden-number regression pins for the evaluation protocol clones.

Pure-numpy evaluators are deterministic; these frozen values catch
unintended protocol drift across refactors (they do NOT certify parity
with the official av2/WOD implementations — that needs real-data fixtures,
tracked in NEXT.md).
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
