"""Waymo-protocol detection metrics, dependency-free numpy/scipy.

The reference wraps the official TF ``WODDetectionEvaluator``
(``src/torchbox3d/evaluation/evaluate.py``: GPU-disabled TF 9-17, config
289-319, difficulty derivation 322-348, breakdowns 425-466). That stack
(TensorFlow + waymo_open_dataset C++ ops) is not in this image; this module
reimplements the protocol:

- Hungarian assignment on IoU (scipy ``linear_sum_assignment``), per
  (sweep, category), BEV or 3D IoU, thresholds 0.7 (VEHICLE) / 0.5
  (PEDESTRIAN / CYCLIST / SIGN).
- LEVEL_2 difficulty for GTs with ``num_interior_pts <= 5`` or labeled
  difficulty 2 (``evaluate.py:322-348``); LEVEL_1 metrics exclude LEVEL_2
  GTs from the denominator, LEVEL_2 includes all.
- AP over 101 score cutoffs (``evaluate.py:289-319``), range breakdowns
  0-30 / 30-50 / 50-inf m; SIGN excluded from the mean AP
  (``tools/benchmark.py:188-204`` semantics).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

IOU_THRESHOLDS = {
    "VEHICLE": 0.7,
    "PEDESTRIAN": 0.5,
    "CYCLIST": 0.5,
    "SIGN": 0.5,
}
RANGE_BREAKDOWNS = (
    (0.0, float("inf")),
    (0.0, 30.0),
    (30.0, 50.0),
    (50.0, float("inf")),
)
NUM_SCORE_CUTOFFS = 101
LEVEL2_MAX_POINTS = 5


def _bev_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # Pure numpy: per-sweep shapes vary constantly; a jitted IoU would
    # recompile per shape.
    from range_view_3d_detection_tpu.evaluation.iou_np import iou_rotated_bev_np

    return iou_rotated_bev_np(a[:, [0, 1, 3, 4, 6]], b[:, [0, 1, 3, 4, 6]])


def _iou3d(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    bev = _bev_iou(a, b)
    inter_area = bev / np.maximum(1.0 + bev, 1e-8) * (
        (a[:, None, 3] * a[:, None, 4]) + (b[None, :, 3] * b[None, :, 4])
    )
    top = np.minimum(
        a[:, None, 2] + a[:, None, 5] / 2, b[None, :, 2] + b[None, :, 5] / 2
    )
    btm = np.maximum(
        a[:, None, 2] - a[:, None, 5] / 2, b[None, :, 2] - b[None, :, 5] / 2
    )
    inter = inter_area * np.maximum(top - btm, 0.0)
    va = a[:, 3] * a[:, 4] * a[:, 5]
    vb = b[:, 3] * b[:, 4] * b[:, 5]
    return np.clip(
        inter / np.maximum(va[:, None] + vb[None] - inter, 1e-8), 0, 1
    )


def _boxes(frame: Dict[str, np.ndarray], sel) -> np.ndarray:
    yaw = np.arctan2(
        2 * (frame["qw"][sel] * frame["qz"][sel]),
        1 - 2 * frame["qz"][sel] ** 2,
    )
    return np.stack(
        [
            frame["tx_m"][sel],
            frame["ty_m"][sel],
            frame["tz_m"][sel],
            frame["length_m"][sel],
            frame["width_m"][sel],
            frame["height_m"][sel],
            yaw,
        ],
        axis=-1,
    ).astype(np.float32)


def _match_hungarian(
    iou: np.ndarray, threshold: float
) -> List[Tuple[int, int]]:
    from scipy.optimize import linear_sum_assignment

    if iou.size == 0:
        return []
    r, c = linear_sum_assignment(-iou)
    return [(i, j) for i, j in zip(r, c) if iou[i, j] >= threshold]


def evaluate_waymo(
    dts: Dict[str, np.ndarray],
    gts: Dict[str, np.ndarray],
    categories: Sequence[str] = ("VEHICLE", "PEDESTRIAN", "CYCLIST"),
    *,
    mode: str = "3d",  # "3d" | "bev"
) -> Dict[str, float]:
    """Compute WOD-style AP per category x level x range breakdown.

    dts columns: box params + score + category + log_id + timestamp_ns.
    gts columns: box params + category + num_interior_pts
    (+ difficulty_level) + log_id + timestamp_ns.
    """
    iou_fn = _iou3d if mode == "3d" else _bev_iou

    gt_level2 = gts.get(
        "difficulty_level", np.zeros(len(gts["tx_m"]), np.int64)
    ) == 2
    if "num_interior_pts" in gts:
        gt_level2 |= gts["num_interior_pts"] <= LEVEL2_MAX_POINTS

    def uuid(frame):
        return np.char.add(
            np.asarray(frame["log_id"], str),
            np.asarray(frame["timestamp_ns"], str),
        )

    dt_uuid, gt_uuid = uuid(dts), uuid(gts)
    out: Dict[str, float] = {}

    for cat in categories:
        thr = IOU_THRESHOLDS.get(cat, 0.5)
        for lo, hi in RANGE_BREAKDOWNS:
            for level in (1, 2):
                scores_all: List[np.ndarray] = []
                tp_all: List[np.ndarray] = []
                ignore_all: List[np.ndarray] = []
                num_gt = 0
                sweep_ids = np.unique(np.concatenate([dt_uuid, gt_uuid]))
                for sid in sweep_ids:
                    dsel = (dts["category"] == cat) & (dt_uuid == sid)
                    gsel = (gts["category"] == cat) & (gt_uuid == sid)
                    dbox = _boxes(dts, dsel)
                    gbox = _boxes(gts, gsel)
                    drange = np.linalg.norm(dbox[:, :2], axis=-1)
                    grange = np.linalg.norm(gbox[:, :2], axis=-1)
                    din = (drange > lo) & (drange <= hi) if lo else (
                        drange <= hi
                    )
                    gin = (grange > lo) & (grange <= hi) if lo else (
                        grange <= hi
                    )
                    g_l2 = gt_level2[gsel]
                    # LEVEL_1 counts only easy GTs; LEVEL_2 counts all.
                    g_counted = gin & (~g_l2 if level == 1 else np.ones_like(g_l2))
                    num_gt += int(g_counted.sum())

                    if not din.any():
                        continue
                    dbox_i = dbox[din]
                    scores = dts["score"][dsel][din]
                    iou = iou_fn(dbox_i, gbox) if len(gbox) else np.zeros(
                        (len(dbox_i), 0)
                    )
                    matches = _match_hungarian(iou, thr)
                    tp = np.zeros(len(dbox_i), bool)
                    ignore = np.zeros(len(dbox_i), bool)
                    for i, j in matches:
                        if g_counted[j]:
                            tp[i] = True
                        elif gin[j]:
                            # matched to an uncounted (harder-level) GT:
                            # neither TP nor FP at this level.
                            ignore[i] = True
                        else:
                            ignore[i] = True  # matched out-of-range GT
                    scores_all.append(scores)
                    tp_all.append(tp)
                    ignore_all.append(ignore)

                ap = _ap_from_cutoffs(
                    np.concatenate(scores_all) if scores_all else np.zeros(0),
                    np.concatenate(tp_all) if tp_all else np.zeros(0, bool),
                    np.concatenate(ignore_all)
                    if ignore_all
                    else np.zeros(0, bool),
                    num_gt,
                )
                hi_s = "inf" if np.isinf(hi) else f"{hi:g}"
                out[f"{cat}/L{level}/{lo:g}-{hi_s}/AP_{mode}"] = ap

    return out


def _ap_from_cutoffs(
    scores: np.ndarray, tp: np.ndarray, ignore: np.ndarray, num_gt: int
) -> float:
    """AP via precision/recall at 101 score cutoffs (evaluate.py:289-319)."""
    if num_gt == 0:
        return 0.0
    cutoffs = np.linspace(0.0, 1.0, NUM_SCORE_CUTOFFS)
    precisions, recalls = [], []
    counted = ~ignore
    for c in cutoffs:
        sel = (scores >= c) & counted
        n_tp = int((tp & sel).sum())
        n = int(sel.sum())
        precisions.append(n_tp / n if n else 1.0)
        recalls.append(n_tp / num_gt)
    precisions = np.asarray(precisions)
    recalls = np.asarray(recalls)
    # Integrate precision over recall (trapezoid on the monotone envelope).
    order = np.argsort(recalls)
    r, p = recalls[order], precisions[order]
    p = np.maximum.accumulate(p[::-1])[::-1]
    return float(np.trapezoid(p, r)) if hasattr(np, "trapezoid") else float(
        np.trapz(p, r)
    )


def mean_ap(results: Dict[str, float], *, level: int = 2, mode: str = "3d") -> float:
    """Mean all-range AP over non-SIGN categories."""
    keys = [
        k
        for k in results
        if f"/L{level}/0-inf/" in k and k.endswith(f"AP_{mode}")
        and not k.startswith("SIGN")
    ]
    if not keys:
        keys = [
            k
            for k in results
            if f"/L{level}/" in k and k.endswith(f"AP_{mode}")
            and not k.startswith("SIGN")
        ]
    return float(np.mean([results[k] for k in keys])) if keys else 0.0
