"""Width-strided DLA-style range backbone.

Capability parity with ``src/torchbox3d/nn/backbones/dla.py`` (RangeBackbone
16-131, RangeNet 134-208): five residual stages strided only along width
(W -> W/16), four transposed-conv aggregation nodes, multi-scale output dict
``{1: concat(stem, agg3), 2: agg2a, 4: agg2, 16: res3}``.
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from range_view_3d_detection_tpu.models.blocks import (
    AggregationBlock,
    BasicBlock,
    ResidualBlock,
)
from range_view_3d_detection_tpu.models.stems import MetaKernel, RangePartition

Dtype = Any


class RangeBackbone(nn.Module):
    """DLA-style backbone over stem features (``dla.py:16-131``)."""

    layers: Sequence[int]  # 5 stage widths
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Array, *, train: bool) -> Dict[int, Array]:
        ch = list(self.layers)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)

        res1 = ResidualBlock(ch[0], num_blocks=2, strides=(1, 1), **kw)(
            features, train=train
        )
        res2a = ResidualBlock(ch[1], num_blocks=3, strides=(1, 2), **kw)(
            res1, train=train
        )
        res2 = ResidualBlock(ch[2], num_blocks=3, strides=(1, 2), **kw)(
            res2a, train=train
        )
        res3a = ResidualBlock(ch[3], num_blocks=5, strides=(1, 2), **kw)(
            res2, train=train
        )
        res3 = ResidualBlock(ch[4], num_blocks=5, strides=(1, 2), **kw)(
            res3a, train=train
        )

        agg2 = AggregationBlock(
            ch[2], kernel_size=(3, 8), strides=(1, 4), padding=(1, 2), num_blocks=2,
            **kw,
        )(res2, res3, train=train)
        agg1 = AggregationBlock(
            ch[0], kernel_size=(3, 8), strides=(1, 4), padding=(1, 2), num_blocks=2,
            **kw,
        )(res1, res2, train=train)
        agg2a = AggregationBlock(
            ch[1], kernel_size=(3, 4), strides=(1, 2), padding=(1, 1), num_blocks=1,
            **kw,
        )(res2a, agg2, train=train)
        agg3 = AggregationBlock(
            ch[0], kernel_size=(3, 4), strides=(1, 2), padding=(1, 1), num_blocks=2,
            **kw,
        )(agg1, agg2a, train=train)

        agg3 = jnp.concatenate([features, agg3], axis=-1)
        return {1: agg3, 2: agg2a, 4: agg2, 16: res3}


class RangeNet(nn.Module):
    """Stem selector + backbone (``dla.py::RangeNet``, 134-208).

    ``stem_type``: META | RANGE_PARTITION | BASIC.
    """

    layers: Sequence[int]
    stem_type: str = "META"
    num_neighbors: int = 3
    num_layers: int = 2
    projection_kernel_size: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Array, cart: Array, mask: Array, *, train: bool
    ) -> Dict[int, Array]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        features = features.astype(self.dtype)
        stem_type = self.stem_type.upper()
        if stem_type == "META":
            stem = MetaKernel(
                self.layers[0],
                num_neighbors=self.num_neighbors,
                num_layers=self.num_layers,
                **kw,
            )(features, cart, train=train)
        elif stem_type == "RANGE_PARTITION":
            stem = RangePartition(
                self.layers[0],
                projection_kernel_size=self.projection_kernel_size,
                **kw,
            )(features, cart, mask.astype(self.dtype), train=train)
        elif stem_type == "BASIC":
            stem = BasicBlock(
                self.layers[0],
                kernel_size=(
                    self.projection_kernel_size,
                    self.projection_kernel_size,
                ),
                project=True,
                **kw,
            )(features, train=train)
        else:
            raise NotImplementedError(f"stem_type={self.stem_type}")
        return RangeBackbone(self.layers, **kw)(stem, train=train)
