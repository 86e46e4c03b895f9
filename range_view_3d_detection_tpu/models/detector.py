"""The range-view detector: forward pass + training loss as pure functions.

Capability parity with ``src/torchbox3d/nn/arch/detector.py`` (Detector,
86-687) and the loss half of ``nn/heads/detection_head.py`` (189-449,
``reduce_multiscale_loss`` 370-449) — re-designed: no Lightning module, no
step hooks; a Flax module for the network and a pure ``detection_loss``
used inside one jitted train step.

Device batch layout (all static shapes, channel-last):
    features   (B, H, W, C)   input channels (conf feature_column_names)
    cart       (B, H, W, 3)   per-pixel Cartesian returns
    mask       (B, H, W)      bool validity (range > 0)
    boxes      (B, K, 7)      padded cuboids (x, y, z, l, w, h, yaw)
    box_valid  (B, K)         bool
    box_task   (B, K)         int32 task id
    box_offset (B, K)         int32 category offset within task
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from range_view_3d_detection_tpu.models.backbone import RangeNet
from range_view_3d_detection_tpu.models.heads import DetectionHead
from range_view_3d_detection_tpu.ops import assignment, losses, targets as targets_ops

Dtype = Any


@dataclasses.dataclass(frozen=True)
class TargetsConfig:
    """Mirror of ``conf/model/range_view.yaml`` ``targets_config``."""

    enable_azimuth_invariant_targets: bool = True
    fpn_assignment_method: str | None = None
    range_partitions: Tuple[Tuple[int, Tuple[float, float]], ...] = (
        (1, (0.0, float("inf"))),
    )
    point_intervals: Tuple[Tuple[int, Tuple[float, float]], ...] = ()
    affinity_fn: str = "GAUSSIAN"
    sigma: float = 0.75
    normalize_affinities: bool = False
    k: float = float("inf")


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static configuration of the detector (hashable: jit-friendly)."""

    tasks: Tuple[Tuple[int, Tuple[str, ...]], ...]  # ((task_id, cats), ...)
    in_channels: int = 5
    layers: Tuple[int, ...] = (64, 64, 128, 128, 128)
    # Residual blocks per backbone stage (reference DLA: 2, 3, 3, 5, 5).
    stage_blocks: Tuple[int, ...] = (2, 3, 3, 5, 5)
    stem_type: str = "BASIC"
    num_neighbors: int = 3
    num_stem_layers: int = 2
    projection_kernel_size: int = 1
    fpn: Tuple[Tuple[int, int], ...] = ((1, 128),)
    fpn_kernel_sizes: Tuple[Tuple[int, Tuple[int, int]], ...] = ((1, (3, 3)),)
    classification_head_channels: int = 128
    regression_head_channels: int = 128
    num_classification_blocks: int = 4
    num_regression_blocks: int = 4
    final_kernel_size: int = 1
    classification_weight: float = 1.0
    regression_weight: float = 1.0
    coding_weights: Tuple[float, ...] = (1.0,) * 8
    additive_smoothing: float = 1.0
    vfl_alpha: float = 0.75
    vfl_gamma: float = 2.0
    targets: TargetsConfig = TargetsConfig()
    max_boxes: int = 256
    dtype: str = "bfloat16"
    # Rematerialize per backbone-stage / head-tower during backward
    # (nn.remat): trades recompute for activation memory — the v5e has
    # 16 GB HBM vs the reference A40's 48 GB.
    remat: bool = False
    # Which module groups remat applies to when remat=True. Training is
    # bandwidth-bound (BENCH_NOTES "training-step roofline"): remat ADDS
    # bytes+FLOPs, so checkpoint only the groups needed for HBM fit.
    # The stem's stacked-neighbor path and the full-width 512-ch head
    # towers dominate activation memory; the strided backbone stages are
    # comparatively small. Hardware-gridded in BENCH_NOTES r4.
    remat_scope: Tuple[str, ...] = ("stem", "stages", "heads", "loss")
    # Fused Pallas eval path for the META stem (kernels/stem_pallas.py).
    stem_pallas: bool = False

    @property
    def tasks_dict(self) -> Dict[int, Tuple[str, ...]]:
        return {int(k): tuple(v) for k, v in self.tasks}

    @property
    def fpn_dict(self) -> Dict[int, int]:
        return {int(k): int(v) for k, v in self.fpn}

    @property
    def fpn_strides(self) -> Tuple[int, ...]:
        return tuple(int(k) for k, _ in self.fpn)

    @property
    def compute_dtype(self):
        return jnp.bfloat16 if self.dtype == "bfloat16" else jnp.float32


class Detector(nn.Module):
    """Backbone + multi-scale detection head (``detector.py:196-210``)."""

    config: DetectorConfig

    @nn.compact
    def __call__(
        self, features: Array, cart: Array, mask: Array, *, train: bool
    ) -> Dict[str, Any]:
        cfg = self.config
        dt = cfg.compute_dtype
        maskf = mask[..., None].astype(jnp.float32)

        scope = set(cfg.remat_scope) if cfg.remat else set()
        multiscale = RangeNet(
            layers=cfg.layers,
            stage_blocks=cfg.stage_blocks,
            stem_type=cfg.stem_type,
            num_neighbors=cfg.num_neighbors,
            num_layers=cfg.num_stem_layers,
            projection_kernel_size=cfg.projection_kernel_size,
            remat="stem" in scope,
            remat_stages="stages" in scope,
            stem_pallas=cfg.stem_pallas,
            dtype=dt,
            param_dtype=jnp.float32,
        )(features, cart, maskf, train=train)

        head_out = DetectionHead(
            fpn=cfg.fpn_dict,
            fpn_kernel_sizes={int(k): tuple(v) for k, v in cfg.fpn_kernel_sizes},
            tasks=cfg.tasks_dict,
            classification_head_channels=cfg.classification_head_channels,
            regression_head_channels=cfg.regression_head_channels,
            num_classification_blocks=cfg.num_classification_blocks,
            num_regression_blocks=cfg.num_regression_blocks,
            final_kernel_size=cfg.final_kernel_size,
            remat="heads" in scope,
            dtype=dt,
            param_dtype=jnp.float32,
        )(multiscale, train=train)

        return {"head": head_out, "strided": strided_views(cart, mask, cfg)}


def strided_views(
    cart: Array, mask: Array, cfg: "DetectorConfig"
) -> Dict[int, Dict[str, Array]]:
    """Strided views of the geometric inputs (detection_head.py:140-161):
    width-only column slicing, plus the RANGE partition gate on the
    validity mask when configured."""
    strided: Dict[int, Dict[str, Array]] = {}
    rp = dict(cfg.targets.range_partitions)
    for stride in cfg.fpn_strides:
        cart_s = cart[:, :, ::stride]
        mask_s = mask[:, :, ::stride]
        if cfg.targets.fpn_assignment_method == "RANGE":
            lo, hi = rp.get(stride, (0.0, float("inf")))
            d = jnp.linalg.norm(cart_s, axis=-1)
            mask_s = mask_s & (d > lo) & (d <= hi)
        strided[stride] = {"cart": cart_s, "mask": mask_s}
    return strided


def compute_batch_targets(batch: Dict[str, Array], cfg: DetectorConfig):
    """Geometric targets for a batch (param-independent; callers may hoist
    this outside the differentiated region so the interior-mask buffers
    drop out of the backward's live set)."""
    tc = cfg.targets
    return targets_ops.compute_targets(
        batch["cart"],
        batch["mask"],
        batch["boxes"],
        batch["box_valid"],
        batch["box_task"],
        batch["box_offset"],
        tasks=cfg.tasks_dict,
        fpn_strides=cfg.fpn_strides,
        azimuth_invariant=tc.enable_azimuth_invariant_targets,
        fpn_assignment_method=tc.fpn_assignment_method,
        range_partitions=dict(tc.range_partitions),
        point_intervals=dict(tc.point_intervals),
    )


def detection_loss(
    outputs: Dict[str, Any],
    batch: Dict[str, Array],
    cfg: DetectorConfig,
    tgts=None,
) -> Tuple[Array, Dict[str, Array]]:
    """Total training loss (parity with ``DetectionHead.loss`` +
    ``reduce_multiscale_loss``, detection_head.py:202-449).

    Normalization: classification by total foreground count (+smoothing)
    across all strides/tasks; regression by total resolved object count,
    per-pixel weighted by 1/(points_per_obj + smoothing).
    """
    tasks = cfg.tasks_dict
    strides = cfg.fpn_strides
    tc = cfg.targets

    if tgts is None:
        tgts = compute_batch_targets(batch, cfg)

    # Pass 1: global normalizers (reduce_multiscale_loss:388-412).
    total_objects = jnp.zeros((), jnp.float32)
    for stride in strides:
        for task_id in tasks:
            total_objects += tgts[stride][task_id].num_objects.sum()
    total_objects = jnp.maximum(total_objects, 1.0)

    cls_targets: Dict[int, Dict[int, assignment.ClassificationTargets]] = {}
    total_fg = jnp.asarray(cfg.additive_smoothing, jnp.float32)
    for stride in strides:
        cart_s = outputs["strided"][stride]["cart"]
        mask_s = outputs["strided"][stride]["mask"]
        cls_targets[stride] = {}
        for task_id, cats in tasks.items():
            t = tgts[stride][task_id]
            ct = assignment.compute_classification_targets(
                outputs["head"][stride][task_id]["regressands"],
                t.regression_targets,
                t.labels,
                t.winner_index,
                cart_s,
                mask_s,
                num_categories=len(cats),
                affinity_fn=tc.affinity_fn,
                sigma=tc.sigma,
                k=tc.k,
                normalize_affinities=tc.normalize_affinities,
                azimuth_invariant=tc.enable_azimuth_invariant_targets,
                max_boxes=cfg.max_boxes,
            )
            cls_targets[stride][task_id] = ct
            total_fg += ct.foreground_mask.sum()

    coding_w = jnp.asarray(cfg.coding_weights, jnp.float32)
    num_coding = coding_w.shape[0]

    metrics: Dict[str, Array] = {}
    total = jnp.zeros((), jnp.float32)
    agg = {
        "classification_loss": 0.0,
        "foreground_loss": 0.0,
        "background_loss": 0.0,
        "regression_loss": 0.0,
        "coordinate_loss": 0.0,
        "dimension_loss": 0.0,
        "rotation_loss": 0.0,
    }
    for stride in strides:
        mask_s = outputs["strided"][stride]["mask"].astype(jnp.float32)
        s_cls = s_reg = 0.0
        for task_id in tasks:
            out = outputs["head"][stride][task_id]
            t = tgts[stride][task_id]
            ct = cls_targets[stride][task_id]

            vfl = (
                losses.varifocal_loss(
                    out["logits"], ct.affinities, alpha=cfg.vfl_alpha,
                    gamma=cfg.vfl_gamma,
                )
                * cfg.classification_weight
                * mask_s[..., None]
            ) / total_fg
            fg = ct.foreground_mask.astype(jnp.float32)[..., None]
            bg = ct.background_mask.astype(jnp.float32)[..., None]
            cls_loss = vfl.sum()
            fg_loss = (vfl * fg).sum()
            bg_loss = (vfl * bg).sum()

            per_obj_norm = 1.0 / (
                t.points_per_obj.astype(jnp.float32) + cfg.additive_smoothing
            )
            reg_elem = (
                losses.l1_loss(out["regressands"], t.regression_targets)
                * cfg.regression_weight
                * ct.regression_weights.astype(jnp.float32)[..., None]
                * per_obj_norm[..., None]
                * mask_s[..., None]
                * coding_w
                / num_coding
            ) / total_objects
            coord = reg_elem[..., 0:3].sum()
            dim = reg_elem[..., 3:6].sum()
            rot = reg_elem[..., 6:8].sum()
            reg_loss = coord + dim + rot

            total += cls_loss + reg_loss
            s_cls += cls_loss
            s_reg += reg_loss
            agg["classification_loss"] += cls_loss
            agg["foreground_loss"] += fg_loss
            agg["background_loss"] += bg_loss
            agg["regression_loss"] += reg_loss
            agg["coordinate_loss"] += coord
            agg["dimension_loss"] += dim
            agg["rotation_loss"] += rot
        metrics[f"classification_loss/s{stride}"] = jnp.asarray(s_cls)
        metrics[f"regression_loss/s{stride}"] = jnp.asarray(s_reg)

    metrics.update({k: jnp.asarray(v) for k, v in agg.items()})
    metrics["loss"] = total
    metrics["total_fg"] = total_fg
    metrics["total_objects"] = total_objects
    return total, metrics
