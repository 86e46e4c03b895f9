"""Post-training int8 quantization of the serving forward (PTQ).

The flagship model is MXU-bound: the eight 512-channel head-tower convs
are >55% of device time and the backbone stage/aggregation convs most of
the rest (BENCH_NOTES.md round-2/3 profiles). TPU v5e runs int8 matmuls
at ~2x the bf16 MXU rate; measured end-to-end, int8 heads alone are
1.30x (27.8 vs 21.3 fps/chip at flagship shapes).

Mechanism — a trace-time quantization context consulted by every
``blocks.ConvNormAct`` and ``blocks.TorchConvTranspose`` (the same
pattern as ``parallel/spatial.py``):

- **calib**: the eval forward additionally sows each BN-bearing conv
  block's input absmax into a ``quant_stats`` collection (reduced with
  ``max`` across calls/batches on device — only scalars ever reach the
  host, which matters through this image's ~25 MB/s device tunnel).
- **int8**: a conv block whose scope carries an ``in_scale`` leaf in the
  ``quant`` variable collection quantizes its input to symmetric
  per-tensor int8 and its fp kernel to symmetric per-output-channel
  int8 *in-trace* (the serving jit closes over the weights, so XLA
  constant-folds the weight quantization), accumulates in int32, and
  dequantizes straight into the unchanged BatchNorm+ReLU epilogue —
  XLA fuses the whole epilogue into the convolution. Blocks with no
  ``in_scale`` leaf (and all ``norm=False`` prediction convs) run fp.

Because which convs go int8 is decided purely by which scales ship in
the artifact's ``quant.msgpack``, "heads-only" vs "full-network"
quantization is an export-time filter, not a code path.

This is a serving-only transform: training and the parity path are
untouched. Reference analog: none (the reference serves fp16 CUDA —
``tools/benchmark.py:60-63``); this is TPU-native headroom beyond
parity.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

Pytree = Any

_INT8_MAX = 127.0

_MODE: Optional[str] = None  # None | "calib" | "int8" | "qat"


def mode() -> Optional[str]:
    """Active quantization mode (trace-time; consulted by ConvNormAct)."""
    return _MODE


@contextmanager
def quantization(m: Optional[str]):
    """Enable calibration ("calib"), int8 serving ("int8"), or
    quantization-aware fine-tuning ("qat") for traces performed inside
    the context."""
    global _MODE
    if m not in (None, "calib", "int8", "qat"):
        raise ValueError(f"unknown quantization mode: {m!r}")
    prev, _MODE = _MODE, m
    try:
        yield
    finally:
        _MODE = prev


def _use_conv_pallas(mod: "Int8Conv", x: Array) -> bool:
    """Route this conv through the fused Pallas kernel?

    Opt-in via ``RV3D_CONV_PALLAS=1``. Eligible: 3x3 'same'-padded,
    height-stride 1, width-stride 1/2, no bias (every BN-bearing int8
    conv in the network), channels <= ``RV3D_CONV_PALLAS_CMAX``
    (default 256 — the 512-channel head towers already run at 84% of
    the int8 MXU peak and are excluded; raise to include them).
    """
    import os

    if os.environ.get("RV3D_CONV_PALLAS", "") != "1":
        return False
    cmax = int(os.environ.get("RV3D_CONV_PALLAS_CMAX", "256"))
    return (
        tuple(mod.kernel_size) == (3, 3)
        and mod.strides[0] == 1
        and mod.strides[1] in (1, 2)
        and tuple(map(tuple, mod.padding)) == ((1, 1), (1, 1))
        and not mod.use_bias
        and x.ndim == 4
        and x.shape[-1] <= cmax
        and mod.features <= cmax
        and (mod.strides[1] == 1 or x.shape[2] % 2 == 0)
    )


class Int8Conv(nn.Module):
    """Drop-in int8 replacement for the ``nn.Conv`` inside ConvNormAct.

    Declares ``kernel``/``bias`` with nn.Conv's exact names, shapes, and
    initializers, so the parameter tree (and every checkpoint/artifact)
    is interchangeable with the fp module — construct with
    ``name="Conv_0"`` to land on the same scope.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    use_bias: bool
    kernel_init: Any
    bias_init: Any
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x: Array, in_scale: Array) -> Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, x.shape[-1], self.features),
            self.param_dtype,
        )
        w = kernel.astype(jnp.float32)
        # Per-output-channel symmetric weight scales; constant-folded by
        # XLA when the weights are jit constants (the serving path).
        w_scale = jnp.maximum(
            jnp.max(jnp.abs(w), axis=(0, 1, 2)) / _INT8_MAX, 1e-12
        )
        w_i8 = jnp.clip(
            jnp.round(w / w_scale), -_INT8_MAX, _INT8_MAX
        ).astype(jnp.int8)
        # Symmetric per-tensor input quantization: 0 -> 0, so the conv's
        # zero padding is exact in the int8 domain.
        x_i8 = jnp.clip(
            jnp.round(x.astype(jnp.float32) / in_scale),
            -_INT8_MAX,
            _INT8_MAX,
        ).astype(jnp.int8)
        if _use_conv_pallas(self, x):
            from ..kernels.conv_pallas import conv3x3_i8_fused

            # Fused conv + dequant: the s32 accumulator never leaves
            # VMEM (kernels/conv_pallas.py). Bit-identical operands and
            # accumulation; the bf16 output feeds the same BN/ReLU
            # epilogue. Bias (rare here: only norm=False convs carry
            # one, and those run fp) stays on the XLA side below.
            y = conv3x3_i8_fused(
                x_i8,
                w_i8.reshape(kh * kw, x.shape[-1], self.features),
                in_scale * w_scale,
                stride_w=self.strides[1],
                out_dtype=self.dtype,
                interpret=jax.default_backend() == "cpu",
            ).astype(jnp.float32)
        else:
            acc = jax.lax.conv_general_dilated(
                x_i8,
                w_i8,
                window_strides=self.strides,
                padding=self.padding,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = acc.astype(jnp.float32) * (in_scale * w_scale)
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


def fake_quant(x: Array, scale: Array) -> Array:
    """Quantize-dequantize with a straight-through estimator.

    Forward value is ``scale * clip(round(x / scale), ±127)`` — exactly
    the value the int8 serving path reconstructs after dequantization —
    while the gradient passes through unchanged (the STE), so weights
    keep training across the non-differentiable rounding.
    """
    q = jnp.clip(jnp.round(x / scale), -_INT8_MAX, _INT8_MAX) * scale
    return x + jax.lax.stop_gradient(q - x)


def weight_scale_per_channel(w: Array) -> Array:
    """Per-output-channel symmetric int8 scale for an HWIO kernel —
    the same formula ``Int8Conv`` uses at serving time."""
    return jnp.maximum(
        jnp.max(jnp.abs(w), axis=(0, 1, 2)) / _INT8_MAX, 1e-12
    )


class QATConv(nn.Module):
    """Fake-quantized twin of :class:`Int8Conv` for QAT fine-tuning.

    Same parameter names/shapes/initializers as ``nn.Conv`` (construct
    with ``name="Conv_0"``), but the forward runs in fp on STE
    quantize-dequantized input + weights: the forward VALUES match the
    int8 serving path bit-for-bit in exact arithmetic (both compute
    ``(s_x s_w) * (round(x/s_x) ⊛ round(w/s_w))``; only the accumulation
    dtype differs), while gradients flow to the fp master weights.
    Weight scales track the live weights (recomputed per step, gradient
    stopped); the activation scale is the frozen calibrated ``in_scale``.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: Tuple[int, int]
    padding: Tuple[Tuple[int, int], Tuple[int, int]]
    use_bias: bool
    kernel_init: Any
    bias_init: Any
    dtype: Any
    param_dtype: Any

    @nn.compact
    def __call__(self, x: Array, in_scale: Array) -> Array:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (kh, kw, x.shape[-1], self.features),
            self.param_dtype,
        )
        w = kernel.astype(jnp.float32)
        w_fq = fake_quant(w, jax.lax.stop_gradient(weight_scale_per_channel(w)))
        x_fq = fake_quant(x.astype(jnp.float32), in_scale)
        y = jax.lax.conv_general_dilated(
            x_fq,
            w_fq,
            window_strides=self.strides,
            padding=self.padding,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        if self.use_bias:
            bias = self.param(
                "bias", self.bias_init, (self.features,), self.param_dtype
            )
            y = y + bias.astype(jnp.float32)
        return y.astype(self.dtype)


# ---------------------------------------------------------------------------
# Calibration -> quant tree
# ---------------------------------------------------------------------------


def calibrate_scales(
    model,
    variables: Pytree,
    batches: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> Dict[str, Any]:
    """Activation scales for every quantizable conv block.

    Runs the eval forward under the "calib" context inside ONE jit per
    batch shape; each ConvNormAct sows its input absmax (device-reduced
    ``max``), and only those scalars are read back. Returns the ``quant``
    variable collection: the ``quant_stats`` tree with each ``in_absmax``
    leaf renamed to ``in_scale`` and divided by 127.
    """

    @jax.jit
    def _stats(v, feats, cart, mask):
        with quantization("calib"):
            _, state = model.apply(
                v,
                feats,
                cart,
                mask,
                train=False,
                mutable=["quant_stats"],
            )
        return state["quant_stats"]

    acc: Optional[Dict[str, Any]] = None
    for feats, cart, mask in batches:
        got = jax.device_get(_stats(variables, feats, cart, mask))
        acc = (
            got
            if acc is None
            else jax.tree_util.tree_map(np.maximum, acc, got)
        )
    if acc is None:
        raise ValueError("calibrate_scales needs at least one batch")

    def to_scales(node):
        if not isinstance(node, dict):
            return node
        out = {}
        for k, v in node.items():
            if k.endswith("_absmax"):
                # "<name>_absmax" -> "<name>_scale" (= absmax / 127):
                # "in_absmax" from ConvNormAct/TorchConvTranspose, the
                # "stem_hh/pf_absmax" pair from the MetaKernel stem.
                m = float(np.asarray(v))
                out[k[: -len("_absmax")] + "_scale"] = np.asarray(
                    m / _INT8_MAX if m > 0 else 1.0, np.float32
                )
            else:
                out[k] = to_scales(v)
        return out

    return to_scales(acc)


def filter_scope(quant_tree: Dict[str, Any], scope: str) -> Dict[str, Any]:
    """Restrict a quant tree: "full" keeps everything, "heads" keeps only
    the DetectionHead towers (backbone/stem run fp)."""
    if scope == "full":
        return quant_tree
    if scope != "heads":
        raise ValueError(f"unknown quantization scope: {scope!r}")

    def prune(node, under_head):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                sub = prune(v, under_head or k.startswith("DetectionHead"))
                if sub:
                    out[k] = sub
            elif under_head:  # scale leaf: keep only inside the head
                out[k] = v
        return out

    return prune(quant_tree, False)
