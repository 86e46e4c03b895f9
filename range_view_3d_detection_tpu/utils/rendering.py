"""Training/eval visualization: BEV boxes + range-image heatmaps.

Capability parity with ``src/torchbox3d/rendering/tensorboard.py`` (61-455)
/ ``tools/draw_utils.py``: draw ground-truth vs predicted boxes in BEV
(prediction color keyed by 3D IoU against its best GT) and per-stride score
maps, emitted as PNG files and/or logged arrays. matplotlib-based, host-side.
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, Optional

import numpy as np

IOU_GREEN_THRESHOLD = 0.7  # tensorboard.py:314-318


def _box_corners_bev_np(boxes: np.ndarray) -> np.ndarray:
    x, y, l, w, yaw = boxes[:, 0], boxes[:, 1], boxes[:, 3], boxes[:, 4], boxes[:, 6]
    c, s = np.cos(yaw), np.sin(yaw)
    lx = np.stack([l, l, -l, -l], -1) * 0.5
    ly = np.stack([-w, w, w, -w], -1) * 0.5
    cx = c[:, None] * lx - s[:, None] * ly + x[:, None]
    cy = s[:, None] * lx + c[:, None] * ly + y[:, None]
    return np.stack([cx, cy], axis=-1)


def draw_bev(
    points_xy: Optional[np.ndarray],
    gt_boxes: np.ndarray,
    pred_boxes: np.ndarray,
    pred_scores: Optional[np.ndarray] = None,
    *,
    out_path: Optional[str | Path] = None,
    extent: float = 60.0,
):
    """Render a BEV figure; returns the matplotlib figure.

    GT boxes: blue. Predictions: green if 3D IoU >= 0.7 with some GT,
    red otherwise (matching the reference's IoU coloring).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 8), dpi=100)
    if points_xy is not None and len(points_xy):
        ax.scatter(points_xy[:, 0], points_xy[:, 1], s=0.2, c="gray", alpha=0.5)

    for corners in _box_corners_bev_np(gt_boxes) if len(gt_boxes) else []:
        ax.add_patch(
            matplotlib.patches.Polygon(
                corners, closed=True, fill=False, edgecolor="tab:blue", lw=1.0
            )
        )

    if len(pred_boxes):
        ious = _best_iou3d(pred_boxes, gt_boxes) if len(gt_boxes) else np.zeros(
            len(pred_boxes)
        )
        for corners, iou in zip(_box_corners_bev_np(pred_boxes), ious):
            color = "tab:green" if iou >= IOU_GREEN_THRESHOLD else "tab:red"
            ax.add_patch(
                matplotlib.patches.Polygon(
                    corners, closed=True, fill=False, edgecolor=color, lw=1.0
                )
            )

    ax.set_xlim(-extent, extent)
    ax.set_ylim(-extent, extent)
    ax.set_aspect("equal")
    ax.set_title("BEV: GT (blue) / pred (green iou>=0.7, red)")
    if out_path is not None:
        fig.savefig(out_path, bbox_inches="tight")
        plt.close(fig)
    return fig


def _best_iou3d(pred: np.ndarray, gt: np.ndarray) -> np.ndarray:
    """Best 3D IoU per prediction (the reference colors by mmcv
    ``boxes_iou3d`` — tensorboard.py:314-318 — not BEV-only)."""
    from range_view_3d_detection_tpu.evaluation.waymo_eval import _iou3d

    iou = _iou3d(pred, gt) if len(pred) and len(gt) else np.zeros(
        (len(pred), len(gt))
    )
    return iou.max(axis=1) if iou.size else np.zeros(len(pred))


def draw_range_maps(
    maps: Dict[str, np.ndarray], *, out_path: Optional[str | Path] = None
):
    """Stacked range-image heatmaps (score/likelihood/loss maps),
    the per-stride panels of ``tensorboard.py:354-387``."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    n = len(maps)
    fig, axes = plt.subplots(n, 1, figsize=(14, 1.2 * n + 1), dpi=100)
    if n == 1:
        axes = [axes]
    for ax, (name, img) in zip(axes, maps.items()):
        ax.imshow(img, aspect="auto", cmap="turbo")
        ax.set_ylabel(name, fontsize=7)
        ax.set_xticks([])
        ax.set_yticks([])
    if out_path is not None:
        fig.savefig(out_path, bbox_inches="tight")
        plt.close(fig)
    return fig
