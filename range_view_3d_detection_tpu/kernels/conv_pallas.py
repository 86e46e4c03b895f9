"""Fused int8 3x3 conv + dequant as a Pallas TPU kernel.

``models/quantized.py::Int8Conv`` lowers through XLA as
``conv(int8) -> s32 accumulator in HBM -> requantize fusion``: the
int32 tensor (4x the int8 input bytes) makes a full HBM round trip per
conv, and when producer/consumer layouts disagree XLA inserts s32
layout copies on top (BENCH_NOTES "Round-4 int8 stem verdict + copy/pad
attribution": 237 MB / ~0.36 ms per copy at full width). Those round
trips are the dominant cost of the ~175 narrow backbone fusions that
make up the int8 serving profile's bandwidth tail — the convs
themselves are far from the MXU roofline at W/4..W/16 widths.

This kernel keeps the int32 accumulator in a VMEM scratch and writes
only the dequantized bf16 output row to HBM. Blocking mirrors
``stem_pallas.py``: grid ``(B, H_out, 3)`` — step ``(b, h, k)`` reads
the dy = k-1 input row (index-map clamped at the image edge; the kernel
zeroes it there to reproduce zero padding), accumulates its three
horizontal taps into the scratch, and on the last k-step dequantizes and
writes the output row. Per conv, HBM traffic drops from
``read i8 + write s32 + read s32 + write bf16`` (~11x the int8 bytes,
plus copies) to ``3x read i8 + write bf16`` (~5x), with the s32 tensor
never leaving the chip.

Width stride 2 (the strided second conv of each stage's first
BasicBlock, reference ``blocks/__init__.py::BasicBlock`` stride
placement) splits the input into even/odd column phases — ``out[w]``
reads ``in[2w-1], in[2w], in[2w+1]`` = ``odd[w-1], even[w], odd[w]`` —
with the deinterleave done by two XLA strided slices BEFORE the
``pallas_call``: the equivalent in-kernel reshape is a vector shape
cast Mosaic rejects on the v5e ("infer-vector-layout: unsupported
shape cast").

Semantics are bit-identical to the XLA path (same int8 operands, int32
accumulation, f32 dequant); ``tests/test_conv_pallas.py`` pins
equality. Serving opt-in: ``RV3D_CONV_PALLAS=1`` (models/quantized.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_w(x: Array, dx: int) -> Array:
    """Static width shift with zero fill: out[w] = x[w + dx - 1]."""
    W = x.shape[0]
    zeros = jnp.zeros((1, x.shape[1]), x.dtype)
    if dx == 0:
        return jnp.concatenate([zeros, x[: W - 1]], axis=0)
    if dx == 2:
        return jnp.concatenate([x[1:], zeros], axis=0)
    return x


def _conv_kernel(
    x_ref,
    w_ref,
    dq_ref,
    out_ref,
    acc_ref,
    *,
    height: int,
    out_dtype,
):
    k = pl.program_id(2)
    h = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[0, 0]
    # dy = k - 1 input row, zeroed where it falls off the image (the
    # index map clamps to a valid row; zero restores zero padding).
    edge = ((k == 0) & (h == 0)) | ((k == 2) & (h == height - 1))
    x = jnp.where(edge, jnp.zeros_like(x), x)

    acc = acc_ref[:]
    for dx in range(3):
        acc = acc + jnp.dot(
            _shift_w(x, dx), w_ref[dx],
            preferred_element_type=jnp.int32,
        )
    acc_ref[:] = acc

    @pl.when(k == 2)
    def _():
        out_ref[0, 0] = (
            acc_ref[:].astype(jnp.float32) * dq_ref[:]
        ).astype(out_dtype)


def _conv_kernel_s2(
    xe_ref,
    xo_ref,
    w_ref,
    dq_ref,
    out_ref,
    acc_ref,
    *,
    height: int,
    out_dtype,
):
    """Width-stride-2 twin: ``out[w]`` reads ``in[2w-1], in[2w], in[2w+1]``
    = ``odd[w-1], even[w], odd[w]``. The caller pre-splits the input into
    even/odd column phases in XLA — an in-kernel deinterleave reshape is
    a vector shape cast Mosaic rejects on the v5e."""
    k = pl.program_id(2)
    h = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    xe = xe_ref[0, 0]
    xo = xo_ref[0, 0]
    edge = ((k == 0) & (h == 0)) | ((k == 2) & (h == height - 1))
    xe = jnp.where(edge, jnp.zeros_like(xe), xe)
    xo = jnp.where(edge, jnp.zeros_like(xo), xo)

    W2 = xe.shape[0]
    zeros = jnp.zeros((1, xe.shape[1]), xe.dtype)
    taps = (
        jnp.concatenate([zeros, xo[: W2 - 1]], axis=0),  # in[2w-1]
        xe,                                              # in[2w]
        xo,                                              # in[2w+1]
    )
    acc = acc_ref[:]
    for dx in range(3):
        acc = acc + jnp.dot(
            taps[dx], w_ref[dx], preferred_element_type=jnp.int32
        )
    acc_ref[:] = acc

    @pl.when(k == 2)
    def _():
        out_ref[0, 0] = (
            acc_ref[:].astype(jnp.float32) * dq_ref[:]
        ).astype(out_dtype)


@functools.partial(
    jax.jit, static_argnames=("stride_w", "out_dtype", "interpret")
)
def conv3x3_i8_fused(
    x_i8: Array,
    w_i8: Array,
    dq: Array,
    *,
    stride_w: int = 1,
    out_dtype=jnp.bfloat16,
    interpret: bool = False,
) -> Array:
    """int8 3x3 'same'-padded conv with VMEM-resident s32 accumulation.

    Args:
        x_i8: (B, H, W, Cin) int8 activations (symmetric, zero-point 0 —
            zero padding is exact in the int8 domain).
        w_i8: (9, Cin, Cout) int8 kernel, dy-major taps (HWIO reshaped).
        dq: (Cout,) f32 dequant scale (``in_scale * w_scale``).
        stride_w: width stride, 1 or 2 (height stride is always 1 —
            the backbone never downsamples height).

    Returns:
        (B, H, W // stride_w, Cout) ``out_dtype`` dequantized output.
    """
    B, H, W, Cin = x_i8.shape
    Cout = w_i8.shape[-1]
    if stride_w not in (1, 2):
        raise NotImplementedError(f"stride_w={stride_w}")
    if stride_w == 2 and W % 2:
        raise ValueError("stride-2 fused conv requires even width")
    Wo = W // stride_w

    def row_spec(width, ch):
        return pl.BlockSpec(
            (1, 1, width, ch),
            lambda b, h, k: (b, jnp.clip(h + k - 1, 0, H - 1), 0, 0),
            memory_space=pltpu.VMEM,
        )

    wspec = pl.BlockSpec(
        (3, Cin, Cout), lambda b, h, k: (k, 0, 0), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.BlockSpec(
        (1, 1, Wo, Cout), lambda b, h, k: (b, h, 0, 0),
        memory_space=pltpu.VMEM,
    )
    common = dict(
        grid=(B, H, 3),
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((B, H, Wo, Cout), out_dtype),
        scratch_shapes=[pltpu.VMEM((Wo, Cout), jnp.int32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )

    if stride_w == 1:
        return pl.pallas_call(
            functools.partial(_conv_kernel, height=H, out_dtype=out_dtype),
            in_specs=[row_spec(W, Cin), wspec, vec],
            **common,
        )(x_i8, w_i8, dq.astype(jnp.float32))

    # Even/odd column-phase pre-split in XLA (one strided copy each;
    # Mosaic rejects the equivalent in-kernel deinterleave on TPU).
    return pl.pallas_call(
        functools.partial(_conv_kernel_s2, height=H, out_dtype=out_dtype),
        in_specs=[row_spec(Wo, Cin), row_spec(Wo, Cin), wspec, vec],
        **common,
    )(
        x_i8[:, :, 0::2, :],
        x_i8[:, :, 1::2, :],
        w_i8,
        dq.astype(jnp.float32),
    )
