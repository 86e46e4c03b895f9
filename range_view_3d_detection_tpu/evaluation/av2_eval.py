"""AV2-protocol 3D detection metrics, dependency-free numpy.

The reference delegates AV2 evaluation to the external ``av2`` package
(``nn/arch/detector.py:19,472``; config via ``datasets/__init__.py:15-47``).
That package is not in this image, so the protocol is reimplemented here:

- Per (sweep, category): greedy score-ordered matching on 3D center
  distance at thresholds (0.5, 1.0, 2.0, 4.0) m.
- AP: 100-point interpolated precision over a uniform recall grid,
  averaged over the four thresholds.
- True-positive errors at the 2.0 m threshold: ATE (center distance),
  ASE (1 - aligned 3D IoU of dims), AOE (wrapped yaw difference).
- CDS = AP * mean(1 - ATE/2.0, 1 - ASE, 1 - AOE/pi).
- GT filtering: range <= 150 m, num_interior_pts > 0
  (``detection_cfg_factory`` AV2 settings, ``datasets/__init__.py:27-34``).

Exact numerical parity with the ``av2`` package is tracked as a follow-up
gate; the protocol (matching rule, thresholds, normalizations) follows the
AV2 sensor benchmark definition.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, List, Sequence, Tuple

import numpy as np

from range_view_3d_detection_tpu.utils.feather import read_feather

AFFINITY_THRESHOLDS_M = (0.5, 1.0, 2.0, 4.0)
TP_THRESHOLD_M = 2.0
MAX_RANGE_M = 150.0
MAX_NORMALIZED_ATE = 2.0
MAX_NORMALIZED_AOE = np.pi
N_RECALL_SAMPLES = 100


def _quat_to_yaw(qw, qx, qy, qz):
    return np.arctan2(2.0 * (qw * qz + qx * qy), 1.0 - 2.0 * (qy**2 + qz**2))


def _wrap_pi(a):
    return np.abs(np.arctan2(np.sin(a), np.cos(a)))


def _aligned_scale_iou(dims_a: np.ndarray, dims_b: np.ndarray) -> np.ndarray:
    """3D IoU of dimension-aligned, co-centered boxes."""
    mins = np.minimum(dims_a, dims_b).prod(axis=-1)
    va = dims_a.prod(axis=-1)
    vb = dims_b.prod(axis=-1)
    return mins / np.maximum(va + vb - mins, 1e-8)


def match_sweep(
    dt_xyz: np.ndarray,
    dt_scores: np.ndarray,
    gt_xyz: np.ndarray,
    threshold: float,
) -> Tuple[np.ndarray, np.ndarray]:
    """Greedy score-ordered matching.

    Returns:
        tp: (N_dt,) bool in score order given.
        gt_idx: (N_dt,) matched gt index or -1.
    """
    n_dt, n_gt = len(dt_xyz), len(gt_xyz)
    tp = np.zeros(n_dt, bool)
    gt_idx = np.full(n_dt, -1, np.int64)
    if n_gt == 0 or n_dt == 0:
        return tp, gt_idx
    dist = np.linalg.norm(dt_xyz[:, None] - gt_xyz[None], axis=-1)
    taken = np.zeros(n_gt, bool)
    order = np.argsort(-dt_scores, kind="stable")
    for i in order:
        d = np.where(taken, np.inf, dist[i])
        j = int(np.argmin(d))
        if d[j] <= threshold:
            tp[i] = True
            gt_idx[i] = j
            taken[j] = True
    return tp, gt_idx


def _interp_ap(tp_sorted: np.ndarray, num_gts: int) -> float:
    """Interpolated AP over a uniform recall grid."""
    if num_gts == 0 or len(tp_sorted) == 0:
        return 0.0
    cum_tp = np.cumsum(tp_sorted)
    cum_fp = np.cumsum(~tp_sorted)
    precision = cum_tp / np.maximum(cum_tp + cum_fp, 1)
    recall = cum_tp / num_gts
    # Monotone non-increasing interpolated precision.
    precision = np.maximum.accumulate(precision[::-1])[::-1]
    grid = np.linspace(0, 1, N_RECALL_SAMPLES + 1)[1:]
    interp = np.interp(grid, recall, precision, right=0.0)
    return float(interp.mean())


def evaluate(
    dts: Dict[str, np.ndarray],
    gts: Dict[str, np.ndarray],
    categories: Sequence[str],
    *,
    max_range_m: float = MAX_RANGE_M,
) -> Dict[str, Dict[str, float]]:
    """Evaluate flat prediction columns against flat GT columns.

    Both dicts carry columns: tx_m ty_m tz_m length_m width_m height_m
    qw qx qy qz category log_id timestamp_ns (+ dts: score,
    gts: num_interior_pts).

    Returns per-category metrics + ``AVERAGE_METRICS``.
    """
    gt_rng = np.linalg.norm(
        np.stack([gts["tx_m"], gts["ty_m"], gts["tz_m"]], -1), axis=-1
    )
    gt_keep = gt_rng <= max_range_m
    if "num_interior_pts" in gts:
        gt_keep &= gts["num_interior_pts"] > 0
    gts = {k: v[gt_keep] for k, v in gts.items()}

    if len(dts.get("tx_m", [])) > 0:
        dt_rng = np.linalg.norm(
            np.stack([dts["tx_m"], dts["ty_m"], dts["tz_m"]], -1), axis=-1
        )
        dt_keep = dt_rng <= max_range_m
        dts = {k: v[dt_keep] for k, v in dts.items()}

    dt_uuid = _uuid_codes(dts)
    gt_uuid = _uuid_codes(gts)

    results: Dict[str, Dict[str, float]] = {}
    for cat in categories:
        dm = dts["category"] == cat if len(dt_uuid) else np.zeros(0, bool)
        gm = gts["category"] == cat
        num_gts = int(gm.sum())

        cat_scores: List[np.ndarray] = []
        cat_tp: Dict[float, List[np.ndarray]] = {
            t: [] for t in AFFINITY_THRESHOLDS_M
        }
        ate_l, ase_l, aoe_l = [], [], []

        sweep_ids = np.unique(np.concatenate([dt_uuid[dm], gt_uuid[gm]])) if (
            dm.any() or gm.any()
        ) else []
        for sid in sweep_ids:
            dsel = dm & (dt_uuid == sid)
            gsel = gm & (gt_uuid == sid)
            d_xyz = np.stack(
                [dts["tx_m"][dsel], dts["ty_m"][dsel], dts["tz_m"][dsel]], -1
            )
            g_xyz = np.stack(
                [gts["tx_m"][gsel], gts["ty_m"][gsel], gts["tz_m"][gsel]], -1
            )
            scores = dts["score"][dsel]
            cat_scores.append(scores)
            for t in AFFINITY_THRESHOLDS_M:
                tp, gi = match_sweep(d_xyz, scores, g_xyz, t)
                cat_tp[t].append(tp)
                if t == TP_THRESHOLD_M and tp.any():
                    mi = tp
                    gi_m = gi[mi]
                    ate_l.append(
                        np.linalg.norm(d_xyz[mi] - g_xyz[gi_m], axis=-1)
                    )
                    d_dims = np.stack(
                        [
                            dts["length_m"][dsel][mi],
                            dts["width_m"][dsel][mi],
                            dts["height_m"][dsel][mi],
                        ],
                        -1,
                    )
                    g_dims = np.stack(
                        [
                            gts["length_m"][gsel][gi_m],
                            gts["width_m"][gsel][gi_m],
                            gts["height_m"][gsel][gi_m],
                        ],
                        -1,
                    )
                    ase_l.append(1.0 - _aligned_scale_iou(d_dims, g_dims))
                    d_yaw = _quat_to_yaw(
                        dts["qw"][dsel][mi],
                        dts["qx"][dsel][mi],
                        dts["qy"][dsel][mi],
                        dts["qz"][dsel][mi],
                    )
                    g_yaw = _quat_to_yaw(
                        gts["qw"][gsel][gi_m],
                        gts["qx"][gsel][gi_m],
                        gts["qy"][gsel][gi_m],
                        gts["qz"][gsel][gi_m],
                    )
                    aoe_l.append(_wrap_pi(d_yaw - g_yaw))

        if cat_scores:
            all_scores = np.concatenate(cat_scores)
            order = np.argsort(-all_scores, kind="stable")
            aps = []
            for t in AFFINITY_THRESHOLDS_M:
                tp_all = np.concatenate(cat_tp[t])[order]
                aps.append(_interp_ap(tp_all, num_gts))
            ap = float(np.mean(aps))
        else:
            ap = 0.0

        ate = float(np.concatenate(ate_l).mean()) if ate_l else MAX_NORMALIZED_ATE
        ase = float(np.concatenate(ase_l).mean()) if ase_l else 1.0
        aoe = float(np.concatenate(aoe_l).mean()) if aoe_l else MAX_NORMALIZED_AOE

        cds = ap * float(
            np.mean(
                [
                    1.0 - min(ate / MAX_NORMALIZED_ATE, 1.0),
                    1.0 - min(ase, 1.0),
                    1.0 - min(aoe / MAX_NORMALIZED_AOE, 1.0),
                ]
            )
        )
        results[cat] = {
            "AP": ap,
            "ATE": ate,
            "ASE": ase,
            "AOE": aoe,
            "CDS": cds,
            "num_gts": float(num_gts),
        }

    present = [c for c in categories if results[c]["num_gts"] > 0]
    avg = {
        k: float(np.mean([results[c][k] for c in present])) if present else 0.0
        for k in ("AP", "ATE", "ASE", "AOE", "CDS")
    }
    results["AVERAGE_METRICS"] = avg
    return results


def _uuid_codes(frame: Dict[str, np.ndarray]) -> np.ndarray:
    if len(frame.get("log_id", [])) == 0:
        return np.zeros(0, dtype="<U64")
    return np.char.add(
        np.asarray(frame["log_id"], dtype=str),
        np.char.add("_", np.asarray(frame["timestamp_ns"], dtype=str)),
    )


def load_ground_truth(split_dir: Path) -> Dict[str, np.ndarray]:
    """Load and concatenate all logs' annotations with log_id columns."""
    cols: Dict[str, List[np.ndarray]] = {}
    for log_path in sorted(Path(split_dir).glob("*")):
        ann_path = log_path / "annotations.feather"
        if not ann_path.is_file():
            continue
        ann = read_feather(ann_path)
        n = len(ann["timestamp_ns"])
        ann["log_id"] = np.asarray([log_path.stem] * n)
        for k, v in ann.items():
            cols.setdefault(k, []).append(v)
    return {k: np.concatenate(v) for k, v in cols.items()}


def load_predictions(pred_dir: Path) -> Dict[str, np.ndarray]:
    cols: Dict[str, List[np.ndarray]] = {}
    for shard in sorted(Path(pred_dir).glob("*.feather")):
        data = read_feather(shard)
        for k, v in data.items():
            cols.setdefault(k, []).append(v)
    if not cols:
        return {}
    return {k: np.concatenate(v) for k, v in cols.items()}


def evaluate_predictions(
    pred_dir: Path, gt_split_dir: Path, categories: Sequence[str]
) -> Dict[str, Dict[str, float]]:
    """Shard-file evaluation entry (``on_validation_end`` flow,
    detector.py:407-535)."""
    dts = load_predictions(pred_dir)
    gts = load_ground_truth(gt_split_dir)
    if not dts:
        dts = {
            k: np.zeros(0)
            for k in (
                "tx_m",
                "ty_m",
                "tz_m",
                "length_m",
                "width_m",
                "height_m",
                "qw",
                "qx",
                "qy",
                "qz",
                "score",
            )
        }
        dts["category"] = np.zeros(0, dtype=str)
        dts["log_id"] = np.zeros(0, dtype=str)
        dts["timestamp_ns"] = np.zeros(0, np.int64)
    return evaluate(dts, gts, categories)
