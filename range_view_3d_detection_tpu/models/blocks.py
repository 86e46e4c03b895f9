"""Convolutional building blocks (NHWC, bf16-friendly).

Capability parity with ``src/torchbox3d/nn/blocks/__init__.py`` (BasicBlock /
ResidualBlock / AggregationBlock) and ``nn/modules/conv.py`` (same-padding
convs) — re-designed as Flax modules with channel-last layout, which is the
native layout for TPU convolutions (lane dimension = channels).

BatchNorm runs in fp32 regardless of compute dtype; under a data-sharded
``jit`` the batch statistics are global means, which reproduces the
reference's ``sync_batchnorm: true`` (``conf/trainer/train.yaml:15``) with no
explicit collective code — XLA inserts the cross-device reductions.
"""

from __future__ import annotations

import os
from typing import Any, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import Array

from range_view_3d_detection_tpu.models import quantized
from range_view_3d_detection_tpu.parallel import spatial

Dtype = Any


# Experimental knob: BatchNorm compute dtype (fp32 default; set
# RVT_BN_DTYPE=bfloat16 to measure the fp32-bounce cost on TPU).
def _bn_dtype():
    import jax.numpy as jnp

    return (
        jnp.bfloat16
        if os.environ.get("RVT_BN_DTYPE") == "bfloat16"
        else jnp.float32
    )


def _pair(v) -> Tuple[int, int]:
    if isinstance(v, (tuple, list)):
        return (int(v[0]), int(v[1]))
    return (int(v), int(v))


def _phase_merged_kernel(kernel: Array, sw: int) -> Array:
    """Merge a ``(kh, 2*sw, ci, co)`` transposed-conv kernel into the
    ``(kh, 3, ci, sw*co)`` kernel of its exact subpixel decomposition.

    For width stride ``sw``, kernel width ``2*sw``, padding ``sw//2`` (the
    only shapes the aggregation nodes use), output column ``x = sw*q + r``
    reads exactly two taps ``kw ≡ (c - r) mod sw`` (``c = 2*sw-1-sw//2``)
    at input columns ``q-1``/``q``/``q+1`` — so each phase ``r`` is a
    stride-1 conv with a 3-wide window and the ``sw`` phases interleave by
    reshape. Every original tap lands in the merged kernel exactly once
    (r-major output blocks), so gradients flow back unchanged.
    """
    kh, kwt, ci, co = kernel.shape
    c = kwt - 1 - sw // 2
    merged = jnp.zeros((kh, 3, ci, sw * co), kernel.dtype)
    for kw in range(kwt):
        r = (c - kw) % sw
        j = (r + kw - c) // sw + 1  # input-column offset {-1,0,+1} -> {0,1,2}
        merged = merged.at[:, j, :, r * co : (r + 1) * co].set(
            kernel[:, kw]
        )
    return merged


def _phase_deconv(
    x: Array,
    kernel: Array,
    sw: int,
    ph: int,
    pad_w: Tuple[int, int],
    preferred_element_type=None,
) -> Array:
    """Stride-1 conv of the phase-merged kernel + interleaving reshape ==
    the ``lhs_dilation`` transposed conv, without multiplying the inserted
    zeros (a ~2.7x MAC cut at the stride-4 nodes) or materializing the
    dilated tensor. ``pad_w=(1,1)`` zero-pads; ``(0,0)`` consumes a
    pre-exchanged 1-column halo (width-sharded path)."""
    kh, _, ci, sco = kernel.shape
    co = sco // sw
    y = jax.lax.conv_general_dilated(
        x,
        kernel,
        window_strides=(1, 1),
        padding=((ph, ph), pad_w),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        **(
            {"preferred_element_type": preferred_element_type}
            if preferred_element_type is not None
            else {}
        ),
    )
    b, h, w, _ = y.shape
    return y.reshape(b, h, w * sw, co)


class TorchConvTranspose(nn.Module):
    """Transposed conv with PyTorch ``ConvTranspose2d(k, s, p)`` shape
    semantics: ``out = (in - 1) * stride + kernel - 2 * padding``.

    Implemented as ``conv_general_dilated`` with ``lhs_dilation`` so XLA
    lowers it onto the MXU like a regular convolution. Used by the
    aggregation (upsample) nodes, parity with ``blocks/__init__.py:150-158``.

    When the shape is the aggregation pattern (``sh==1``, ``kw==2*sw``,
    ``pw==sw//2``, ``kh==2*ph+1``), ``RV3D_DECONV_PHASE=1`` opts into the
    exact subpixel (phase) decomposition (``_phase_merged_kernel``). It is
    OFF by default: the on-paper win (skip the 3/4 zero MACs the s-dilated
    input implies at the stride-4 nodes) did NOT materialize on hardware —
    same-session v5e A/B read 26.9-27.3 fps (phase) vs 29.8-30.4 fps
    (dilated) on the int8 serving point and a null on the bandwidth-bound
    train step (237.2 vs 236.5 ms), i.e. XLA's own TPU lowering of
    ``lhs_dilation`` already avoids the zero work, and the decomposition's
    interleave reshape adds real data movement (BENCH_NOTES round-5
    "tail attack, attempt 2"). Kept as an exactness-tested alternative
    lowering (``tests/test_deconv_phase.py``) for future shape regimes.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    use_bias: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array) -> Array:
        kh, kw = _pair(self.kernel_size)
        sh, sw = _pair(self.strides)
        ph, pw = _pair(self.padding)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, in_ch, self.features),
            self.param_dtype,
        )
        ctx = spatial.context()
        x = x.astype(self.dtype)
        # Serving-time PTQ hooks (models/quantized.py), mirroring
        # ConvNormAct: the aggregation upsamples feed a BatchNorm, so
        # they quantize the same way; lhs_dilation inserts zeros, which
        # symmetric int8 represents exactly.
        qmode = quantized.mode()
        if qmode == "calib":
            self.sow(
                "quant_stats",
                "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        in_scale = (
            self.get_variable("quant", "in_scale")
            if qmode in ("int8", "qat")
            and self.has_variable("quant", "in_scale")
            else None
        )

        def conv_operands(xin: Array):
            """Per-quant-branch (lhs, rhs, preferred_acc, dequant_scale):
            qat -> STE fake-quant twin (models/quantized.py::fake_quant);
            int8 -> symmetric int8 with int32 accumulation (lhs_dilation /
            phase zeros are exact in symmetric int8); else fp."""
            if in_scale is not None and qmode == "qat":
                w = kernel.astype(jnp.float32)
                w_fq = quantized.fake_quant(
                    w,
                    jax.lax.stop_gradient(
                        quantized.weight_scale_per_channel(w)
                    ),
                )
                x_fq = quantized.fake_quant(
                    xin.astype(jnp.float32), in_scale
                )
                return x_fq, w_fq, None, None
            if in_scale is not None:
                w = kernel.astype(jnp.float32)
                w_scale = jnp.maximum(
                    jnp.max(jnp.abs(w), axis=(0, 1, 2)) / 127.0, 1e-12
                )
                w_i8 = jnp.clip(jnp.round(w / w_scale), -127, 127).astype(
                    jnp.int8
                )
                x_i8 = jnp.clip(
                    jnp.round(xin.astype(jnp.float32) / in_scale), -127, 127
                ).astype(jnp.int8)
                return x_i8, w_i8, jnp.int32, in_scale * w_scale
            return xin, kernel.astype(self.dtype), None, None

        def deconv(xin: Array, pad_hw) -> Array:
            lhs, rhs, pref, deq = conv_operands(xin)
            y = jax.lax.conv_general_dilated(
                lhs,
                rhs,
                window_strides=(1, 1),
                padding=pad_hw,
                lhs_dilation=(sh, sw),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                **({"preferred_element_type": pref} if pref else {}),
            )
            if deq is not None:
                return (y.astype(jnp.float32) * deq).astype(self.dtype)
            return y.astype(self.dtype)

        def deconv_phase(xin: Array, pad_w) -> Array:
            lhs, rhs, pref, deq = conv_operands(xin)
            y = _phase_deconv(
                lhs, _phase_merged_kernel(rhs, sw), sw, ph, pad_w, pref
            )
            if deq is not None:
                return (y.astype(jnp.float32) * deq).astype(self.dtype)
            return y.astype(self.dtype)

        phase_ok = (
            os.environ.get("RV3D_DECONV_PHASE", "0") == "1"
            and sh == 1
            and sw >= 2
            and kw == 2 * sw
            and 2 * pw == sw
            and kh == 2 * ph + 1
        )

        # Input columns the kernel footprint reads across shard boundaries
        # (in input units; exact for any sw >= 1 — sw == 1 degenerates to
        # the regular-conv halo kw-1-pw / pw).
        halo_l = max(0, (kw - 1 - pw) // sw)
        halo_r = max(0, (pw + sw - 1) // sw)
        if ctx is not None and (halo_l or halo_r):
            # Width-sharded transposed conv: fetch the columns this
            # kernel's footprint reads across the shard boundary, run the
            # dilated conv on the widened block, slice the exact local
            # output region (parallel/spatial.py module docstring). The
            # phase decomposition's 3-wide window consumes exactly that
            # (1, 1) halo with VALID width, so its output is already the
            # local region — no slice.
            Wl = x.shape[2]
            x = spatial.exchange_halo_lr(
                x, halo_l, halo_r, ctx.axis, circular=ctx.circular
            )
            if phase_ok and halo_l == 1 and halo_r == 1:
                y = deconv_phase(x, (0, 0))
            else:
                y = deconv(
                    x,
                    (
                        (kh - 1 - ph, kh - 1 - ph),
                        (kw - 1 - pw, kw - 1 - pw),
                    ),
                )
                y = jax.lax.slice_in_dim(
                    y, halo_l * sw, halo_l * sw + Wl * sw, axis=2
                )
            if self.use_bias:
                bias = self.param(
                    "bias",
                    nn.initializers.zeros,
                    (self.features,),
                    self.param_dtype,
                )
                y = y + bias.astype(self.dtype)
            return y
        if phase_ok:
            y = deconv_phase(x, (1, 1))
        else:
            y = deconv(
                x, ((kh - 1 - ph, kh - 1 - ph), (kw - 1 - pw, kw - 1 - pw))
            )
        if self.use_bias:
            bias = self.param(
                "bias", nn.initializers.zeros, (self.features,), self.param_dtype
            )
            y = y + bias.astype(self.dtype)
        return y


class ConvNormAct(nn.Module):
    """Conv + BatchNorm + ReLU (torchvision ``Conv2dNormActivation`` parity).

    ``norm=False`` / ``act=False`` drop those stages (used for final
    prediction convs, ``dense_head.py:46-54``).
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    norm: bool = True
    act: bool = True
    use_bias: bool | None = None  # default: bias iff no norm
    kernel_init: Any = nn.initializers.lecun_normal()
    bias_init: Any = nn.initializers.zeros
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        use_bias = (not self.norm) if self.use_bias is None else self.use_bias
        # Torch-style same padding (``nn/modules/conv.py::Conv2dSame``):
        # a FIXED k-1 total pad per dim (lo=(k-1)//2) independent of
        # stride. XLA's "SAME" string instead pads max(k-s, 0) on strided
        # convs ((0,1) for k=3,s=2), which samples windows shifted by one
        # column — numerically different from the reference at every
        # strided stage. Same output sizes either way for stride | width.
        (ph_lo, ph_hi), (pw_lo, pw_hi) = (
            ((k - 1) // 2, (k - 1) - (k - 1) // 2)
            for k in _pair(self.kernel_size)
        )
        ctx = spatial.context()
        if ctx is not None and (pw_lo or pw_hi):
            # Width-sharded: source the width padding from ring neighbors
            # and run VALID over width — output is exactly shard-width
            # again, so BatchNorm below never sees halo columns.
            x = spatial.exchange_halo_lr(
                x, pw_lo, pw_hi, ctx.axis, circular=ctx.circular
            )
            pw_lo = pw_hi = 0
        # Quantization hooks (models/quantized.py): BN-bearing blocks sow
        # input absmax under "calib"; under "int8" a block whose scope
        # ships an in_scale runs the int8 conv in place of the fp one;
        # under "qat" (train or eval) it runs the STE fake-quant twin so
        # fine-tuning sees serving-time quantization error.
        qmode = quantized.mode() if self.norm else None
        if train and qmode in ("calib", "int8"):
            qmode = None  # calib/int8 are eval-trace-only
        if qmode == "calib":
            self.sow(
                "quant_stats",
                "in_absmax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
        if qmode in ("int8", "qat") and self.has_variable("quant", "in_scale"):
            conv_cls = (
                quantized.Int8Conv if qmode == "int8" else quantized.QATConv
            )
            y = conv_cls(
                features=self.features,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.strides),
                padding=((ph_lo, ph_hi), (pw_lo, pw_hi)),
                use_bias=use_bias,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="Conv_0",
            )(x, self.get_variable("quant", "in_scale"))
        else:
            y = nn.Conv(
                self.features,
                kernel_size=_pair(self.kernel_size),
                strides=_pair(self.strides),
                padding=((ph_lo, ph_hi), (pw_lo, pw_hi)),
                use_bias=use_bias,
                kernel_init=self.kernel_init,
                bias_init=self.bias_init,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
                name="Conv_0",
            )(x)
        if self.norm:
            y = nn.BatchNorm(
                use_running_average=not train,
                momentum=0.9,
                epsilon=1e-5,
                dtype=_bn_dtype(),
                param_dtype=jnp.float32,
                axis_name=(ctx.bn_axes or None) if ctx else None,
            )(y)
            y = y.astype(self.dtype)
        if self.act:
            y = nn.relu(y)
        return y


class BasicBlock(nn.Module):
    """conv-BN-ReLU-conv(stride)-BN + (projected) residual, ReLU after add.

    Parity with ``blocks/__init__.py::BasicBlock`` (13-81): the stride sits
    on the *second* conv; the projection shortcut (1x1, strided, BN) is used
    when ``project`` is set.
    """

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    project: bool = False
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        y = ConvNormAct(
            self.features,
            kernel_size=self.kernel_size,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x, train=train)
        y = ConvNormAct(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            act=False,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(y, train=train)

        residual = x
        if self.project:
            residual = ConvNormAct(
                self.features,
                kernel_size=(1, 1),
                strides=self.strides,
                act=False,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, train=train)
        return nn.relu(y + residual)


class ResidualBlock(nn.Module):
    """N chained BasicBlocks; the first one projects and strides
    (``blocks/__init__.py::ResidualBlock``)."""

    features: int
    num_blocks: int
    strides: Tuple[int, int] = (1, 1)
    kernel_size: Tuple[int, int] = (3, 3)
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: Array, train: bool = False) -> Array:
        x = BasicBlock(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            project=True,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x, train=train)
        for _ in range(self.num_blocks - 1):
            x = BasicBlock(
                self.features,
                kernel_size=self.kernel_size,
                dtype=self.dtype,
                param_dtype=self.param_dtype,
            )(x, train=train)
        return x


class AggregationBlock(nn.Module):
    """Upscale ``x2`` (transposed conv + BN + ReLU), add ``x1``, refine
    (``blocks/__init__.py::AggregationBlock``)."""

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[int, int]
    num_blocks: int
    dtype: Dtype = jnp.float32
    param_dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x1: Array, x2: Array, train: bool = False) -> Array:
        ctx = spatial.context()
        y = TorchConvTranspose(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(x2)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=0.9,
            epsilon=1e-5,
            dtype=_bn_dtype(),
            param_dtype=jnp.float32,
            axis_name=(ctx.bn_axes or None) if ctx else None,
        )(y)
        y = nn.relu(y.astype(self.dtype))
        y = x1 + y
        return ResidualBlock(
            self.features,
            num_blocks=self.num_blocks,
            dtype=self.dtype,
            param_dtype=self.param_dtype,
        )(y, train=train)
