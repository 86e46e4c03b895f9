"""Import shims for the reference implementation (/root/reference/src).

The reference's model files (`nn/blocks`, `nn/stems`, `nn/backbones/dla`,
`nn/heads/dense_head`, `nn/functional`, `math/ops/coding`) depend only on
torch plus a handful of symbols from packages that are not installed here
(torchvision, hydra, omegaconf, pytorch_lightning, polars). This module
installs faithful minimal stand-ins into ``sys.modules`` so the reference
modules import unmodified — the torch math we compare against is 100%% the
reference's own code.

Only the *glue* is shimmed:
  - ``torchvision.ops.Conv2dNormActivation``: re-implemented to the
    torchvision contract (conv + norm + activation, bias iff no norm,
    default padding ``(k-1)//2 * dilation``).
  - ``torchvision.ops.sigmoid_focal_loss``: the canonical RetinaNet
    formulation (torchvision's documented math).
  - ``hydra.utils.instantiate`` / ``omegaconf``: config types only; tests
    construct reference modules directly and never call instantiate.
  - ``pytorch_lightning.core.module.LightningModule``: aliased to
    ``torch.nn.Module`` (the only behavior dense_head.py uses).
  - ``polars``: attribute dummies for schema constants / type hints.
"""

from __future__ import annotations

import sys
import types
from pathlib import Path

REFERENCE_SRC = Path("/root/reference/src")


def _install_torchvision() -> None:
    if "torchvision" in sys.modules:
        return
    import torch
    import torch.nn.functional as F
    from torch import nn

    class Conv2dNormActivation(nn.Sequential):
        def __init__(
            self,
            in_channels,
            out_channels,
            kernel_size=3,
            stride=1,
            padding=None,
            groups=1,
            norm_layer=nn.BatchNorm2d,
            activation_layer=nn.ReLU,
            dilation=1,
            inplace=True,
            bias=None,
        ):
            if padding is None:
                padding = (kernel_size - 1) // 2 * dilation
            if bias is None:
                bias = norm_layer is None
            layers = [
                nn.Conv2d(
                    in_channels,
                    out_channels,
                    kernel_size,
                    stride,
                    padding,
                    dilation=dilation,
                    groups=groups,
                    bias=bias,
                )
            ]
            if norm_layer is not None:
                layers.append(norm_layer(out_channels))
            if activation_layer is not None:
                params = {} if inplace is None else {"inplace": inplace}
                layers.append(activation_layer(**params))
            super().__init__(*layers)
            self.out_channels = out_channels

    def sigmoid_focal_loss(
        inputs: torch.Tensor,
        targets: torch.Tensor,
        alpha: float = 0.25,
        gamma: float = 2.0,
        reduction: str = "none",
    ) -> torch.Tensor:
        p = torch.sigmoid(inputs)
        ce_loss = F.binary_cross_entropy_with_logits(
            inputs, targets, reduction="none"
        )
        p_t = p * targets + (1 - p) * (1 - targets)
        loss = ce_loss * ((1 - p_t) ** gamma)
        if alpha >= 0:
            alpha_t = alpha * targets + (1 - alpha) * (1 - targets)
            loss = alpha_t * loss
        if reduction == "mean":
            loss = loss.mean()
        elif reduction == "sum":
            loss = loss.sum()
        return loss

    tv = types.ModuleType("torchvision")
    ops = types.ModuleType("torchvision.ops")
    ops.Conv2dNormActivation = Conv2dNormActivation
    ops.sigmoid_focal_loss = sigmoid_focal_loss
    tv.ops = ops
    sys.modules["torchvision"] = tv
    sys.modules["torchvision.ops"] = ops


def _install_hydra_omegaconf() -> None:
    if "hydra" not in sys.modules:
        hydra = types.ModuleType("hydra")
        utils = types.ModuleType("hydra.utils")

        def instantiate(cfg, *args, **kwargs):
            """Resolve ``_target_`` dotted path and construct (the subset of
            hydra.utils.instantiate the reference model code uses)."""
            import importlib

            cfg = dict(cfg)
            target = cfg.pop("_target_")
            mod, _, name = target.rpartition(".")
            cls = getattr(importlib.import_module(mod), name)
            return cls(*args, **{**cfg, **kwargs})

        utils.instantiate = instantiate
        hydra.utils = utils
        sys.modules["hydra"] = hydra
        sys.modules["hydra.utils"] = utils
    if "omegaconf" not in sys.modules:
        omegaconf = types.ModuleType("omegaconf")
        omegaconf.DictConfig = dict
        omegaconf.ListConfig = list
        omegaconf.MISSING = "???"
        omegaconf.OmegaConf = types.SimpleNamespace()
        sys.modules["omegaconf"] = omegaconf


def _install_lightning() -> None:
    if "pytorch_lightning" in sys.modules:
        return
    from torch import nn

    pl_mod = types.ModuleType("pytorch_lightning")
    core = types.ModuleType("pytorch_lightning.core")
    module = types.ModuleType("pytorch_lightning.core.module")
    module.LightningModule = nn.Module
    core.module = module
    pl_mod.core = core
    sys.modules["pytorch_lightning"] = pl_mod
    sys.modules["pytorch_lightning.core"] = core
    sys.modules["pytorch_lightning.core.module"] = module


def _install_polars() -> None:
    if "polars" in sys.modules:
        return

    class _Any:
        """Placeholder for polars dtypes/classes in schemas & type hints."""

        def __init__(self, *a, **k):
            pass

    polars = types.ModuleType("polars")

    def _getattr(name):
        return _Any

    polars.__getattr__ = _getattr
    sys.modules["polars"] = polars


def _install_mmcv() -> None:
    """``mmcv.ops.box_iou_rotated`` backed by the repo's numpy rotated-IoU
    twin (independently Monte-Carlo-validated in tests/test_iou.py).
    Rotated-rect IoU is convention-mirror-invariant, so the repo backend is
    a faithful stand-in for the CUDA op."""
    if "mmcv" in sys.modules:
        return
    import numpy as np
    import torch

    from range_view_3d_detection_tpu.evaluation.iou_np import (
        iou_rotated_bev_np,
    )

    def box_iou_rotated(bboxes1, bboxes2, mode="iou", aligned=False):
        a = bboxes1.detach().cpu().numpy().astype(np.float64)
        b = bboxes2.detach().cpu().numpy().astype(np.float64)
        if aligned:
            assert len(a) == len(b)
            out = np.array(
                [
                    iou_rotated_bev_np(a[i : i + 1], b[i : i + 1])[0, 0]
                    for i in range(len(a))
                ],
                dtype=np.float32,
            )
        else:
            out = iou_rotated_bev_np(a, b).astype(np.float32)
        return torch.from_numpy(out).to(bboxes1.device)

    mmcv = types.ModuleType("mmcv")
    ops = types.ModuleType("mmcv.ops")
    ops.box_iou_rotated = box_iou_rotated
    mmcv.ops = ops
    sys.modules["mmcv"] = mmcv
    sys.modules["mmcv.ops"] = ops


def _install_kornia() -> None:
    """Minimal ``kornia.geometry.conversions`` (WXYZ conventions)."""
    if "kornia" in sys.modules:
        return
    import torch

    def quaternion_from_euler(roll, pitch, yaw):
        cr, sr = torch.cos(roll * 0.5), torch.sin(roll * 0.5)
        cp, sp = torch.cos(pitch * 0.5), torch.sin(pitch * 0.5)
        cy, sy = torch.cos(yaw * 0.5), torch.sin(yaw * 0.5)
        w = cr * cp * cy + sr * sp * sy
        x = sr * cp * cy - cr * sp * sy
        y = cr * sp * cy + sr * cp * sy
        z = cr * cp * sy - sr * sp * cy
        return w, x, y, z

    def quaternion_to_rotation_matrix(quat):
        q = quat / quat.norm(dim=-1, keepdim=True)
        w, x, y, z = q.unbind(dim=-1)
        row0 = torch.stack(
            [
                1 - 2 * (y * y + z * z),
                2 * (x * y - w * z),
                2 * (x * z + w * y),
            ],
            dim=-1,
        )
        row1 = torch.stack(
            [
                2 * (x * y + w * z),
                1 - 2 * (x * x + z * z),
                2 * (y * z - w * x),
            ],
            dim=-1,
        )
        row2 = torch.stack(
            [
                2 * (x * z - w * y),
                2 * (y * z + w * x),
                1 - 2 * (x * x + y * y),
            ],
            dim=-1,
        )
        return torch.stack([row0, row1, row2], dim=-2)

    def euler_from_quaternion(w, x, y, z):
        roll = torch.atan2(2 * (w * x + y * z), 1 - 2 * (x * x + y * y))
        pitch = torch.asin((2 * (w * y - z * x)).clamp(-1.0, 1.0))
        yaw = torch.atan2(2 * (w * z + x * y), 1 - 2 * (y * y + z * z))
        return roll, pitch, yaw

    kornia = types.ModuleType("kornia")
    geometry = types.ModuleType("kornia.geometry")
    conversions = types.ModuleType("kornia.geometry.conversions")
    conversions.quaternion_from_euler = quaternion_from_euler
    conversions.quaternion_to_rotation_matrix = quaternion_to_rotation_matrix
    conversions.euler_from_quaternion = euler_from_quaternion
    geometry.conversions = conversions
    kornia.geometry = geometry
    sys.modules["kornia"] = kornia
    sys.modules["kornia.geometry"] = geometry
    sys.modules["kornia.geometry.conversions"] = conversions


def install() -> bool:
    """Install all shims + the reference src on sys.path. Returns False if
    the reference checkout is unavailable (callers should skip)."""
    if not REFERENCE_SRC.is_dir():
        return False
    try:
        import torch  # noqa: F401
    except Exception:
        return False
    _install_torchvision()
    _install_hydra_omegaconf()
    _install_lightning()
    _install_polars()
    _install_mmcv()
    _install_kornia()
    if str(REFERENCE_SRC) not in sys.path:
        sys.path.insert(0, str(REFERENCE_SRC))
    return True
