"""Input stems: MetaKernel, RangePartition, Basic.

Capability parity with ``src/torchbox3d/nn/stems/__init__.py`` (12-128),
re-designed channel-last. The reference's ``F.unfold`` (im2col) becomes a
static stack of 9 shifted views — XLA fuses the shifts; no im2col buffer is
materialized in HBM.
"""

from __future__ import annotations

from typing import Any, Tuple

import flax.linen as nn
import jax.numpy as jnp
from jax import Array

from range_view_3d_detection_tpu.models.blocks import BasicBlock, ConvNormAct

Dtype = Any


def extract_neighbors(x: Array, num_neighbors: int) -> Array:
    """``(B, H, W, C)`` -> ``(B, H, W, n*n, C)`` zero-padded neighborhoods.

    Equivalent to ``F.unfold(x, n, padding=n//2)`` in the reference
    (``stems/__init__.py:69-77``) with channel-last layout. Neighbor order is
    row-major over (dy, dx), so the center sits at index ``n*n // 2`` —
    matching the reference's ``center_idx``.
    """
    pad = num_neighbors // 2
    B, H, W, C = x.shape
    xp = jnp.pad(x, ((0, 0), (pad, pad), (pad, pad), (0, 0)))
    views = []
    for dy in range(num_neighbors):
        for dx in range(num_neighbors):
            views.append(xp[:, dy : dy + H, dx : dx + W, :])
    return jnp.stack(views, axis=3)


class MetaKernel(nn.Module):
    """RangeDet-style meta-kernel stem (``stems/__init__.py::MetaKernel``).

    Projection block, then per-neighbor positional MLP over *relative*
    Cartesian coordinates, multiplied with the unfolded features and fused
    with a 1x1 MLP. All 1x1 convs are Dense layers on the channel axis (the
    MXU-friendly formulation).
    """

    out_channels: int
    num_neighbors: int = 3
    num_layers: int = 2
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Array, cart: Array, *, train: bool) -> Array:
        feats = BasicBlock(
            self.out_channels,
            kernel_size=(1, 1),
            project=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(features, train=train)

        n = self.num_neighbors
        neighbors = extract_neighbors(feats, n)  # (B, H, W, 9, C)
        coords = extract_neighbors(cart.astype(self.dtype), n)  # (B, H, W, 9, 3)
        center = coords[:, :, :, n * n // 2 : n * n // 2 + 1, :]
        rel = coords - center

        pos = rel
        for i in range(self.num_layers):
            pos = ConvNormAct(
                self.out_channels,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(pos.reshape(pos.shape[0], pos.shape[1], -1, pos.shape[-1]), train=train)
            pos = pos.reshape(neighbors.shape[:4] + (self.out_channels,))

        geo = (pos * neighbors).reshape(
            feats.shape[0], feats.shape[1], feats.shape[2], -1
        )
        for i in range(self.num_layers):
            geo = ConvNormAct(
                self.out_channels,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(geo, train=train)
        return geo


class RangePartition(nn.Module):
    """Range-band partition stem (``stems/__init__.py::RangePartition``):
    replicate features into 6 overlapping range bands, zero outside the band,
    project with a BasicBlock."""

    out_channels: int
    projection_kernel_size: int = 1
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    lower_bounds: Tuple[float, ...] = (0.0, 10.0, 15.0, 20.0, 30.0, 45.0)
    upper_bounds: Tuple[float, ...] = (15.0, 20.0, 30.0, 40.0, 60.0, float("inf"))

    @nn.compact
    def __call__(
        self, features: Array, cart: Array, mask: Array, *, train: bool
    ) -> Array:
        dists = jnp.linalg.norm(cart, axis=-1, keepdims=True)  # (B, H, W, 1)
        lo = jnp.asarray(self.lower_bounds, dtype=dists.dtype)
        hi = jnp.asarray(self.upper_bounds, dtype=dists.dtype)
        bands = (dists >= lo) & (dists <= hi)  # (B, H, W, 6)

        banded = bands[..., :, None] * features[..., None, :]  # (B, H, W, 6, C)
        B, H, W = features.shape[:3]
        banded = banded.reshape(B, H, W, -1) * mask
        return BasicBlock(
            self.out_channels,
            kernel_size=(self.projection_kernel_size, self.projection_kernel_size),
            project=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(banded, train=train)
