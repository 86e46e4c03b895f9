"""Input stems: MetaKernel, RangePartition, Basic.

Capability parity with ``src/torchbox3d/nn/stems/__init__.py`` (12-128),
re-designed channel-last. The reference's ``F.unfold`` (im2col) becomes
static shifted views; at inference the meta-kernel additionally avoids
materializing the (B, H, W, 9, C) neighborhood tensor entirely by
accumulating per-neighbor block matmuls — the stem is memory-bound, not
FLOP-bound, and the im2col buffer dominated its runtime.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from range_view_3d_detection_tpu.models import quantized
from range_view_3d_detection_tpu.models.blocks import BasicBlock, ConvNormAct
from range_view_3d_detection_tpu.parallel import spatial

Dtype = Any

_logger = logging.getLogger(__name__)

# Which MetaKernel compute path the last trace selected: "stacked" (train /
# accumulate-off), "pallas_int8", "pallas_fp", or "accumulate". The int8
# stem silently falls back to fp paths when quant scales are missing or
# under width sharding / non-TPU backends — this record (plus a one-time
# log per path change) lets benchmark and accuracy harnesses assert which
# stem they actually measured instead of guessing (ADVICE r3).
#
# TRACE-TIME ONLY (ADVICE r4): the module body runs when jit TRACES, not
# when a cached executable re-runs. The value is trustworthy immediately
# after a fresh compile of the model under test and stale otherwise —
# interleaving several models/configs, or flipping RV3D_STEM_INT8 after a
# path is already compiled, reads the LAST trace, which may not be the one
# just executed. Harnesses must read it right after their own first
# (compiling) call, like tests/test_stem_pallas.py does.
LAST_STEM_PATH: Optional[str] = None


def _note_stem_path(path: str) -> None:
    global LAST_STEM_PATH
    if LAST_STEM_PATH != path:
        _logger.info("MetaKernel stem path: %s", path)
    LAST_STEM_PATH = path


def _width_padded(x: Array, pad: int) -> Array:
    """Zero width padding — or, under width sharding, real neighbor
    columns from the ring shards (``parallel/spatial.py``)."""
    ctx = spatial.context()
    if ctx is not None:
        return spatial.exchange_halo_lr(
            x, pad, pad, ctx.axis, w_axis=2, circular=ctx.circular
        )
    spec = ((0, 0), (0, 0), (pad, pad)) + ((0, 0),) * (x.ndim - 3)
    return jnp.pad(x, spec)


def extract_neighbors(x: Array, num_neighbors: int) -> Array:
    """``(B, H, W, C)`` -> ``(B, n*n, H, W, C)`` zero-padded neighborhoods.

    Equivalent to ``F.unfold(x, n, padding=n//2)`` in the reference
    (``stems/__init__.py:69-77``) with channel-last layout. Neighbor order
    is row-major over (dy, dx), so the center sits at index ``n*n // 2``.
    The neighbor axis sits next to batch so downstream 1x1 convs can fold
    it into the batch dimension without layout copies. Under width
    sharding the width padding comes from ring neighbors.
    """
    pad = num_neighbors // 2
    B, H, W, C = x.shape
    xp = _width_padded(x, pad)
    xp = jnp.pad(xp, ((0, 0), (pad, pad), (0, 0), (0, 0)))
    views = []
    for dy in range(num_neighbors):
        for dx in range(num_neighbors):
            views.append(xp[:, dy : dy + H, dx : dx + W, :])
    return jnp.stack(views, axis=1)


def _padded_image(x: Array, pad: int) -> Array:
    """Both pads applied once (width: halo-aware; height: zeros) so the
    per-neighbor views below are pure slices — one halo exchange total."""
    xp = _width_padded(x, pad)
    return jnp.pad(
        xp, ((0, 0), (pad, pad), (0, 0)) + ((0, 0),) * (x.ndim - 3)
    )


class MetaKernel(nn.Module):
    """RangeDet-style meta-kernel stem (``stems/__init__.py::MetaKernel``).

    Projection block, per-neighbor positional MLP over *relative* Cartesian
    coordinates, multiplied with the unfolded features and fused with a 1x1
    MLP.

    Two computation paths with shared parameters:
    - train: the reference formulation (stacked neighbors; BatchNorm
      statistics pool over all neighbors, matching torchbox3d).
    - eval: per-neighbor block-matmul accumulation — never materializes the
      (B, H, W, 9, C) buffer; BatchNorm uses running statistics so the
      result is mathematically identical.
    """

    out_channels: int
    num_neighbors: int = 3
    num_layers: int = 2
    inference_accumulate: bool = True  # loop-accumulate eval path
    use_pallas_kernel: bool = False  # fused single-pass eval kernel
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, features: Array, cart: Array, train: bool = False) -> Array:
        C = self.out_channels
        n = self.num_neighbors
        nn2 = n * n
        pad = n // 2

        feats = BasicBlock(
            C,
            kernel_size=(1, 1),
            project=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(features, train=train)

        # Pos MLP as explicit kernel params + manual BN (not ConvNormAct):
        # 1x1 convs are channel matmuls, and the accumulate/Pallas paths
        # need direct access to the weights and eval-BN affines — flax
        # submodule params aren't reachable without calling the module.
        # conv0's linearity (bias-free, BN follows) also lets those paths
        # compute pos0(rel_n) = conv0(cart(p+d)) - conv0(cart(p)) from ONE
        # projection of cart shared by all 9 neighbors.
        pos_kernels = [
            self.param(
                f"pos_{i}_conv_kernel",
                nn.initializers.lecun_normal(),
                (3 if i == 0 else C, C),
                self.param_dtype,
            )
            for i in range(self.num_layers)
        ]

        def pos_conv(x, i):
            return x.astype(self.dtype) @ pos_kernels[i].astype(self.dtype)
        # Pos-MLP BatchNorms as explicit params/variables (flax.BatchNorm
        # semantics: momentum 0.9, eps 1e-5, biased batch variance) so the
        # fused Pallas path can read the eval-mode affine directly — a
        # flax submodule's variables aren't reachable without calling it.
        eps = 1e-5
        momentum = 0.9
        bn_vars = []
        for i in range(self.num_layers):
            scale = self.param(
                f"pos_{i}_bn_scale", nn.initializers.ones, (C,), jnp.float32
            )
            bias = self.param(
                f"pos_{i}_bn_bias", nn.initializers.zeros, (C,), jnp.float32
            )
            mean = self.variable(
                "batch_stats",
                f"pos_{i}_bn_mean",
                lambda: jnp.zeros((C,), jnp.float32),
            )
            var = self.variable(
                "batch_stats",
                f"pos_{i}_bn_var",
                lambda: jnp.ones((C,), jnp.float32),
            )
            bn_vars.append((scale, bias, mean, var))

        def pos_bn(x, i):
            scale, bias, mean, var = bn_vars[i]
            xf = x.astype(jnp.float32)
            if train:
                axes = tuple(range(x.ndim - 1))
                ctx = spatial.context()
                m = spatial.bn_mean(xf.mean(axes), ctx)
                msq = spatial.bn_mean(jnp.square(xf).mean(axes), ctx)
                v = msq - jnp.square(m)
                if not self.is_initializing():
                    mean.value = momentum * mean.value + (1 - momentum) * m
                    var.value = momentum * var.value + (1 - momentum) * v
            else:
                m, v = mean.value, var.value
            y = (xf - m) * jax.lax.rsqrt(v + eps) * scale + bias
            return y

        def bn_eval_affine(i):
            """(a, b) with eval BN(x) == a * x + b (f32)."""
            scale, bias, mean, var = bn_vars[i]
            a = scale * jax.lax.rsqrt(var.value + eps)
            return a, bias - mean.value * a

        def pos_tail(x, start):
            """BN + ReLU of layer ``start``, then the remaining pos layers."""
            for i in range(start, self.num_layers):
                if i > start:
                    x = pos_conv(x, i)
                x = nn.relu(pos_bn(x, i).astype(self.dtype))
            return x
        # Fusion layer 1 as an explicit blocked kernel (nn2, C, C): in the
        # stacked path it is exactly Dense(nn2*C -> C) on the neighbor-major
        # concat; in the accumulate path each block multiplies one neighbor.
        fusion1_kernel = self.param(
            "fusion1_kernel",
            nn.initializers.lecun_normal(batch_axis=(0,)),
            (nn2, C, C),
            self.param_dtype,
        )
        _ctx = spatial.context()
        fusion1_norm = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="fusion1_bn",
            axis_name=(_ctx.bn_axes or None) if _ctx else None,
        )
        rest_fusion = [
            ConvNormAct(
                C,
                kernel_size=(1, 1),
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name=f"fusion_{i}",
            )
            for i in range(1, self.num_layers)
        ]

        cart = cart.astype(self.dtype)
        kernel = fusion1_kernel.astype(self.dtype)

        if train or not self.inference_accumulate:
            _note_stem_path("stacked")
            # Neighbors ride the BATCH axis: the pos MLP then runs at
            # (B*9, H, W, C) in the native image layout. The earlier
            # (B, H, W*9, C) folding forced XLA into two ~2 GB fp32 layout
            # copies around the BatchNorm at flagship shapes — the
            # difference between batch 1 and batch 2 fitting in HBM.
            # BatchNorm pools over (batch, H, W), so statistics cover the
            # same element set either way (parity preserved).
            neighbors = extract_neighbors(feats, n)  # (B, 9, H, W, C)
            coords = extract_neighbors(cart, n)  # (B, 9, H, W, 3)
            rel = coords - cart[:, None]  # center view == cart itself
            B, H, W = feats.shape[:3]
            # Fold neighbors into batch: the pos MLP runs at
            # (B*9, H, W, C). Folding into W instead forced ~2 GB fp32
            # layout copies around the BatchNorm (the round-1 OOM at
            # flagship batch 2); folding into H crashes the TPU compiler
            # at B=2. The batch fold costs only sublane padding
            # (2*9=18 -> 24, 1.3x on the largest stem buffer).
            pos = rel.reshape(B * nn2, H, W, 3)
            pos = pos_tail(pos_conv(pos, 0), 0)
            pos = pos.reshape(B, nn2, H, W, C)
            geo = jnp.einsum(
                "bnhwc,nco->bhwo", pos * neighbors, kernel
            )
        elif (
            self.use_pallas_kernel
            and self.num_layers == 2
            and n == 3
            and jax.default_backend() in ("tpu", "cpu")
            and spatial.context() is None  # kernel is device-local; the
            # accumulate path below is halo-aware under width sharding
            and quantized.mode() != "calib"  # calib sows from the
            # accumulate path (it needs the per-neighbor intermediates)
        ):
            # Gate on backend: the kernel lowers on TPU and runs in
            # interpret mode on CPU; any other backend (e.g. GPU) falls
            # through to the accumulate path below.
            # Fused single-pass Pallas kernel (kernels/stem_pallas.py):
            # reads g/feats once, all 9 neighbor matmuls VMEM-resident.
            from range_view_3d_detection_tpu.kernels.stem_pallas import (
                meta_kernel_fused,
                meta_kernel_fused_i8,
            )

            g = pos_conv(cart, 0)
            a0, b0 = bn_eval_affine(0)
            a1, b1 = bn_eval_affine(1)
            if (
                quantized.mode() == "int8"
                and self.has_variable("quant", "stem_hh_scale")
                and os.environ.get("RV3D_STEM_INT8", "") == "1"
            ):
                # int8 serving stem: same contract as Int8Conv —
                # symmetric per-tensor activation scales (calibrated via
                # the accumulate path's sows), per-output-channel int8
                # weights quantized in-trace (constant-folded under the
                # serving jit). Scale folding per
                # kernels/stem_pallas.py::_stem_kernel_i8.
                #
                # OPT-IN (RV3D_STEM_INT8=1): measured on v5e (round 4,
                # BENCH_NOTES "int8 stem verdict") the int8 stem is
                # ~0.6-0.9 ms/batch-2 SLOWER than the bf16 fused kernel
                # (3.80 vs 2.9 ms device) — the stem is memory/VPU-bound,
                # so the in-kernel quantize/round/convert work outweighs
                # the int8 MXU gain at C=256. Kept for wider-channel
                # configs where the MXU term dominates.
                _note_stem_path("pallas_int8")
                s_hh = self.get_variable("quant", "stem_hh_scale")
                s_pf = self.get_variable("quant", "stem_pf_scale")
                w1 = pos_kernels[1].astype(jnp.float32)
                w1_s = jnp.maximum(
                    jnp.max(jnp.abs(w1), axis=0) / 127.0, 1e-12
                )
                w1_i8 = jnp.clip(
                    jnp.round(w1 / w1_s), -127, 127
                ).astype(jnp.int8)
                kf = fusion1_kernel.astype(jnp.float32)
                k_s = jnp.maximum(
                    jnp.max(jnp.abs(kf), axis=1) / 127.0, 1e-12
                )  # (nn2, C)
                k_i8 = jnp.clip(
                    jnp.round(kf / k_s[:, None, :]), -127, 127
                ).astype(jnp.int8)
                geo = meta_kernel_fused_i8(
                    g,
                    feats,
                    w1_i8,
                    k_i8,
                    a0 / s_hh,
                    b0 / s_hh,
                    a1 * (s_hh * w1_s) / s_pf,
                    b1 / s_pf,
                    s_pf * k_s,
                    num_neighbors=n,
                    interpret=jax.default_backend() == "cpu",
                )
            else:
                _note_stem_path("pallas_fp")
                geo = meta_kernel_fused(
                    g,
                    feats,
                    pos_kernels[1].astype(self.dtype),
                    kernel,
                    a0,
                    b0,
                    a1,
                    b1,
                    num_neighbors=n,
                    interpret=jax.default_backend() == "cpu",
                )
        else:
            _note_stem_path("accumulate")
            # conv0 is linear and bias-free, so all 9 neighbor projections
            # come from ONE conv of cart: pos0_n = shift_n(g) - g.
            g = pos_conv(cart, 0)
            B, H, W = feats.shape[:3]
            gp = _padded_image(g, pad)
            featsp = _padded_image(feats, pad)
            geo = None
            idx = 0
            calib_stem = (
                quantized.mode() == "calib"
                and self.num_layers == 2
                and n == 3
            )
            for dy in range(n):
                for dx in range(n):
                    x0 = gp[:, dy : dy + H, dx : dx + W] - g
                    pos = pos_tail(x0, 0)
                    pf = pos * featsp[:, dy : dy + H, dx : dx + W]
                    if calib_stem:
                        # Activation absmaxes for the int8 fused stem
                        # (kernels/stem_pallas.py::meta_kernel_fused_i8):
                        # hh = relu(bn0(x0)) and the p*feats product —
                        # device-reduced max over neighbors/batches, the
                        # same sow contract as blocks.ConvNormAct.
                        hh = nn.relu(pos_bn(x0, 0).astype(self.dtype))
                        for nm, val in (
                            ("stem_hh_absmax", hh),
                            ("stem_pf_absmax", pf),
                        ):
                            self.sow(
                                "quant_stats",
                                nm,
                                jnp.max(jnp.abs(val.astype(jnp.float32))),
                                init_fn=lambda: jnp.zeros((), jnp.float32),
                                reduce_fn=jnp.maximum,
                            )
                    term = jnp.einsum(
                        "bhwc,co->bhwo", pf, kernel[idx]
                    )
                    geo = term if geo is None else geo + term
                    idx += 1

        geo = fusion1_norm(geo)
        geo = nn.relu(geo.astype(self.dtype))
        for layer in rest_fusion:
            geo = layer(geo, train=train)
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
        self, features: Array, cart: Array, mask: Array, train: bool = False
    ) -> Array:
        dists = jnp.linalg.norm(cart, axis=-1, keepdims=True)  # (B, H, W, 1)
        lo = jnp.asarray(self.lower_bounds, dtype=dists.dtype)
        hi = jnp.asarray(self.upper_bounds, dtype=dists.dtype)
        bands = (dists >= lo) & (dists <= hi)  # (B, H, W, 6)

        banded = bands[..., :, None] * features[..., None, :]  # (B, H, W, 6, C)
        B, H, W = features.shape[:3]
        if mask.ndim == 3:  # (B, H, W) validity -> broadcast over channels
            mask = mask[..., None]
        banded = banded.reshape(B, H, W, -1) * mask
        return BasicBlock(
            self.out_channels,
            kernel_size=(self.projection_kernel_size, self.projection_kernel_size),
            project=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(banded, train=train)
