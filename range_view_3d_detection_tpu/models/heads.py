"""Detection heads.

Capability parity with ``src/torchbox3d/nn/heads/dense_head.py`` (DenseHead
13-76) and the forward half of ``nn/heads/detection_head.py`` (75-187). Loss
and target computation live in ``ops``; the head module here is a pure
function of the multi-scale backbone features.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from range_view_3d_detection_tpu.models.blocks import ConvNormAct

Dtype = Any

FOCAL_PRIOR_PROB = 0.01  # detection_head.py:39


class DenseHead(nn.Module):
    """Conv tower + linear prediction conv (``dense_head.py:13-76``).

    Weight init: normal(0.01); classification final bias uses the focal
    prior ``-log((1-p)/p)`` for stability (``dense_head.py:69-72``).
    """

    out_channels: int
    num_outputs: int
    kernel_size: Tuple[int, int] = (3, 3)
    final_kernel_size: Tuple[int, int] = (1, 1)
    num_blocks: int = 4
    prior_prob: float | None = None
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        init = nn.initializers.normal(stddev=0.01)
        for _ in range(self.num_blocks):
            x = ConvNormAct(
                self.out_channels,
                kernel_size=self.kernel_size,
                kernel_init=init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, train=train)
        bias_init = nn.initializers.zeros
        if self.prior_prob is not None:
            bias_value = -math.log((1.0 - self.prior_prob) / self.prior_prob)
            bias_init = nn.initializers.constant(bias_value)
        x = ConvNormAct(
            self.num_outputs,
            kernel_size=self.final_kernel_size,
            norm=False,
            act=False,
            kernel_init=init,
            bias_init=bias_init,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x, train=train)
        return x.astype(jnp.float32)


class DetectionHead(nn.Module):
    """Per-(FPN stride, task) classification + regression towers
    (``detection_head.py:75-187``).

    Returns ``{stride: {task_id: {"logits": (B,H,Ws,C_t),
    "regressands": (B,H,Ws,8)}}}``. Outputs are fp32 (loss/decoding
    precision), compute dtype follows ``dtype``.
    """

    fpn: Dict[int, int]  # stride -> in-channels (informational)
    fpn_kernel_sizes: Dict[int, Sequence[int]]
    tasks: Dict[int, Sequence[str]]
    classification_head_channels: int = 128
    regression_head_channels: int = 128
    num_classification_blocks: int = 4
    num_regression_blocks: int = 4
    final_kernel_size: int = 1
    num_regressands: int = 8
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, multiscale_features: Dict[int, Array], *, train: bool
    ) -> Dict[int, Dict[int, Dict[str, Array]]]:
        head_cls = (
            nn.remat(DenseHead, static_argnums=(2,), prevent_cse=False)
            if self.remat
            else DenseHead
        )
        out: Dict[int, Dict[int, Dict[str, Array]]] = {}
        for stride in self.fpn.keys():
            stride = int(stride)
            feats = multiscale_features[stride]
            ks = tuple(self.fpn_kernel_sizes[stride])
            out[stride] = {}
            for task_id, categories in self.tasks.items():
                task_id = int(task_id)
                logits = head_cls(
                    self.classification_head_channels,
                    num_outputs=len(categories),
                    kernel_size=ks,
                    final_kernel_size=(self.final_kernel_size,) * 2,
                    num_blocks=self.num_classification_blocks,
                    prior_prob=FOCAL_PRIOR_PROB,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"cls_s{stride}_t{task_id}",
                )(feats, train)
                regressands = head_cls(
                    self.regression_head_channels,
                    num_outputs=self.num_regressands,
                    kernel_size=ks,
                    final_kernel_size=(self.final_kernel_size,) * 2,
                    num_blocks=self.num_regression_blocks,
                    dtype=self.dtype,
                    param_dtype=self.param_dtype,
                    name=f"reg_s{stride}_t{task_id}",
                )(feats, train)
                out[stride][task_id] = {
                    "logits": logits,
                    "regressands": regressands,
                }
        return out
