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
    """DLA-style backbone over stem features (``dla.py:16-131``).

    ``remat=True`` checkpoints each stage (nn.remat): activations inside a
    stage are recomputed during backward — the TPU (16 GB HBM) analog of
    fitting the reference's A40 (48 GB) batch recipe.
    """

    layers: Sequence[int]  # 5 stage widths
    # Residual blocks per stage; (2, 3, 3, 5, 5) is the reference DLA
    # (``dla.py:37-63``). Exposed so the multichip dryrun can validate
    # the full stride/aggregation layout surface at 1 block per stage.
    stage_blocks: Sequence[int] = (2, 3, 3, 5, 5)
    remat: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Array, *, train: bool) -> Dict[int, Array]:
        ch = list(self.layers)
        nb = list(self.stage_blocks)
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        RB = (
            nn.remat(ResidualBlock, static_argnums=(2,), prevent_cse=False)
            if self.remat
            else ResidualBlock
        )
        AB = (
            nn.remat(AggregationBlock, static_argnums=(3,), prevent_cse=False)
            if self.remat
            else AggregationBlock
        )

        # Explicit names: nn.remat renames a module's auto-name (e.g.
        # ResidualBlock_0 -> CheckpointResidualBlock_0), which would give
        # remat on/off configs DIFFERENT param trees and inits — a
        # checkpoint trained one way could not be restored the other way.
        # Pinning the non-remat auto-names makes remat a pure
        # memory/time knob (asserted by test_remat_scope_matches_remat_off).
        res1 = RB(ch[0], num_blocks=nb[0], strides=(1, 1),
                  name="ResidualBlock_0", **kw)(features, train)
        res2a = RB(ch[1], num_blocks=nb[1], strides=(1, 2),
                   name="ResidualBlock_1", **kw)(res1, train)
        res2 = RB(ch[2], num_blocks=nb[2], strides=(1, 2),
                  name="ResidualBlock_2", **kw)(res2a, train)
        res3a = RB(ch[3], num_blocks=nb[3], strides=(1, 2),
                   name="ResidualBlock_3", **kw)(res2, train)
        res3 = RB(ch[4], num_blocks=nb[4], strides=(1, 2),
                  name="ResidualBlock_4", **kw)(res3a, train)

        agg2 = AB(
            ch[2], kernel_size=(3, 8), strides=(1, 4), padding=(1, 2), num_blocks=2,
            name="AggregationBlock_0", **kw,
        )(res2, res3, train)
        agg1 = AB(
            ch[0], kernel_size=(3, 8), strides=(1, 4), padding=(1, 2), num_blocks=2,
            name="AggregationBlock_1", **kw,
        )(res1, res2, train)
        agg2a = AB(
            ch[1], kernel_size=(3, 4), strides=(1, 2), padding=(1, 1), num_blocks=1,
            name="AggregationBlock_2", **kw,
        )(res2a, agg2, train)
        agg3 = AB(
            ch[0], kernel_size=(3, 4), strides=(1, 2), padding=(1, 1), num_blocks=2,
            name="AggregationBlock_3", **kw,
        )(agg1, agg2a, train)

        agg3 = jnp.concatenate([features, agg3], axis=-1)
        return {1: agg3, 2: agg2a, 4: agg2, 16: res3}


class RangeNet(nn.Module):
    """Stem selector + backbone (``dla.py::RangeNet``, 134-208).

    ``stem_type``: META | RANGE_PARTITION | BASIC.
    """

    layers: Sequence[int]
    stage_blocks: Sequence[int] = (2, 3, 3, 5, 5)
    stem_type: str = "META"
    num_neighbors: int = 3
    num_layers: int = 2
    projection_kernel_size: int = 1
    # Remat (activation checkpointing) is scoped per module group so the
    # trainer can trade recompute bytes/FLOPs for HBM fit selectively
    # (``DetectorConfig.remat_scope``): ``remat`` checkpoints the stem,
    # ``remat_stages`` the backbone stages + aggregation nodes.
    remat: bool = False
    remat_stages: bool = False
    stem_pallas: bool = False  # fused Pallas eval path for the META stem
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self, features: Array, cart: Array, mask: Array, *, train: bool
    ) -> Dict[int, Array]:
        kw = dict(dtype=self.dtype, param_dtype=self.param_dtype)
        features = features.astype(self.dtype)
        stem_type = self.stem_type.upper()
        # The MetaKernel stem's stacked-neighbor train path holds the
        # largest activations of the whole net ((B, H, W, 9, C) + fp32 BN
        # buffers over H x W*9); remat it like the backbone stages so
        # flagship batch >= 2 fits in HBM.
        if stem_type == "META":
            MK = (
                nn.remat(MetaKernel, static_argnums=(3,), prevent_cse=False)
                if self.remat
                else MetaKernel
            )
            stem = MK(
                self.layers[0],
                num_neighbors=self.num_neighbors,
                num_layers=self.num_layers,
                use_pallas_kernel=self.stem_pallas,
                # Pin the non-remat auto-name (see RangeBackbone note).
                name="MetaKernel_0",
                **kw,
            )(features, cart, train)
        elif stem_type == "RANGE_PARTITION":
            RP = (
                nn.remat(RangePartition, static_argnums=(4,), prevent_cse=False)
                if self.remat
                else RangePartition
            )
            stem = RP(
                self.layers[0],
                projection_kernel_size=self.projection_kernel_size,
                name="RangePartition_0",
                **kw,
            )(features, cart, mask.astype(self.dtype), train)
        elif stem_type == "BASIC":
            BB = (
                nn.remat(BasicBlock, static_argnums=(2,), prevent_cse=False)
                if self.remat
                else BasicBlock
            )
            stem = BB(
                self.layers[0],
                kernel_size=(
                    self.projection_kernel_size,
                    self.projection_kernel_size,
                ),
                project=True,
                name="BasicBlock_0",
                **kw,
            )(features, train)
        else:
            raise NotImplementedError(f"stem_type={self.stem_type}")
        return RangeBackbone(
            self.layers,
            stage_blocks=self.stage_blocks,
            remat=self.remat_stages,
            **kw,
        )(stem, train=train)
