"""Fused MetaKernel stem (inference) as a Pallas TPU kernel.

The eval-mode meta-kernel stem is, per pixel p and neighbor shift d:

    geo(p) = sum_n [ relu(a1 * (relu(a0 * (g(p+d_n) - g(p)) + b0) @ W1)
                     + b1) * feats(p+d_n) ] @ K_n

where ``g = conv0(cart)`` (the first pos conv, linear + bias-free — see
``models/stems.py``) and (a_i, b_i) are the eval-mode BatchNorm affines.
XLA executes this as ~27 separate full-width ops per frame (~10 ms at
flagship shapes, ~40% of bandwidth); this kernel reads each row of
``g``/``feats`` once per vertical neighbor, keeps the accumulation
VMEM-resident, and runs the two 256x256 matmuls per neighbor
back-to-back on the MXU (~270 GFLOP/frame => ~1.4 ms at peak).

Blocking: grid (B, H, 3) — step (b, h, k) accumulates the dy=k neighbor
row's three horizontal shifts into the output row (b, h). The dy row
arrives via an index-map offset (h+k-1, clamped at the image edges by
Pallas; the kernel zeroes the feature row there to reproduce the
reference's zero-padded ``F.unfold`` semantics, ``stems/__init__.py:
69-77``). Horizontal shifts are static column slices with zero edge
columns. The output block stays resident across the three k-steps (same
index map), giving read-modify-write accumulation without HBM traffic.

Training keeps the stacked flax path (BatchNorm batch statistics).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _shift_w(x: Array, dx: int) -> Array:
    """Static width shift with zero fill: out[c] = x[c + dx - 1]."""
    W = x.shape[0]
    zeros = jnp.zeros((1, x.shape[1]), x.dtype)
    if dx == 0:  # out[c] = x[c-1]
        return jnp.concatenate([zeros, x[: W - 1]], axis=0)
    if dx == 2:  # out[c] = x[c+1]
        return jnp.concatenate([x[1:], zeros], axis=0)
    return x


def _stem_kernel(
    g_ref,
    gn_ref,
    fn_ref,
    w1_ref,
    k_ref,
    a0_ref,
    b0_ref,
    a1_ref,
    b1_ref,
    out_ref,
    *,
    num_neighbors: int,
    height: int,
):
    n = num_neighbors
    k = pl.program_id(2)
    h = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    g = g_ref[0, 0]
    gs_row = gn_ref[0, 0]
    fs_row = fn_ref[0, 0]
    edge = ((k == 0) & (h == 0)) | ((k == n - 1) & (h == height - 1))
    fs_row = jnp.where(edge, jnp.zeros_like(fs_row), fs_row)
    gs_row = jnp.where(edge, jnp.zeros_like(gs_row), gs_row)

    a0 = a0_ref[:]
    b0 = b0_ref[:]
    a1 = a1_ref[:]
    b1 = b1_ref[:]
    w1 = w1_ref[:]

    acc = out_ref[0, 0]
    for dx in range(n):
        gs = _shift_w(gs_row, dx)
        fs = _shift_w(fs_row, dx)
        x0 = (gs - g).astype(jnp.float32)
        hh = jnp.maximum(x0 * a0 + b0, 0.0)
        z = jnp.dot(
            hh.astype(w1.dtype), w1, preferred_element_type=jnp.float32
        )
        p = jnp.maximum(z * a1 + b1, 0.0)
        acc = acc + jnp.dot(
            (p.astype(fs.dtype) * fs),
            k_ref[dx],
            preferred_element_type=jnp.float32,
        )
    out_ref[0, 0] = acc


def _stem_kernel_i8(
    g_ref,
    gn_ref,
    fn_ref,
    w1_ref,
    k_ref,
    a0_ref,
    b0_ref,
    a1_ref,
    b1_ref,
    kdq_ref,
    out_ref,
    *,
    num_neighbors: int,
    height: int,
):
    """int8 twin of :func:`_stem_kernel`.

    The caller folds the activation scales into the BN affines
    (``a0/b0`` divide by the calibrated ``hh`` scale, ``a1/b1``
    additionally carry ``s_hh * s_w1`` per channel and divide by the
    ``p*feats`` scale), so the kernel's two matmuls run on symmetric
    int8 operands with int32 accumulation — the same quantization
    contract as ``models/quantized.py::Int8Conv`` — and the per-dx
    dequant vector ``kdq[dx] = s_pf * s_k[dx]`` scales the second
    matmul's accumulator back to fp32.
    """
    n = num_neighbors
    k = pl.program_id(2)
    h = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        out_ref[0, 0] = jnp.zeros_like(out_ref[0, 0])

    g = g_ref[0, 0]
    gs_row = gn_ref[0, 0]
    fs_row = fn_ref[0, 0]
    edge = ((k == 0) & (h == 0)) | ((k == n - 1) & (h == height - 1))
    fs_row = jnp.where(edge, jnp.zeros_like(fs_row), fs_row)
    gs_row = jnp.where(edge, jnp.zeros_like(gs_row), gs_row)

    a0 = a0_ref[:]
    b0 = b0_ref[:]
    a1 = a1_ref[:]
    b1 = b1_ref[:]
    w1 = w1_ref[:]

    acc = out_ref[0, 0]
    for dx in range(n):
        gs = _shift_w(gs_row, dx)
        fs = _shift_w(fs_row, dx)
        x0 = (gs - g).astype(jnp.float32)
        # relu(bn0(x0)) already divided by s_hh via a0/b0; relu >= 0 so
        # the int8 clip is one-sided.
        hq = jnp.minimum(
            jnp.round(jnp.maximum(x0 * a0 + b0, 0.0)), 127.0
        ).astype(jnp.int8)
        z = jnp.dot(hq, w1, preferred_element_type=jnp.int32)
        p = jnp.maximum(z.astype(jnp.float32) * a1 + b1, 0.0)
        pq = jnp.clip(
            jnp.round(p * fs.astype(jnp.float32)), -127.0, 127.0
        ).astype(jnp.int8)
        acc = acc + (
            jnp.dot(pq, k_ref[dx], preferred_element_type=jnp.int32)
        ).astype(jnp.float32) * kdq_ref[dx, 0]
    out_ref[0, 0] = acc


@functools.partial(
    jax.jit, static_argnames=("num_neighbors", "interpret")
)
def meta_kernel_fused_i8(
    g: Array,
    feats: Array,
    w1_i8: Array,
    k_i8: Array,
    a0: Array,
    b0: Array,
    a1: Array,
    b1: Array,
    kdq: Array,
    *,
    num_neighbors: int = 3,
    interpret: bool = False,
) -> Array:
    """int8 fused stem: quantized twin of :func:`meta_kernel_fused`.

    Args:
        g: (B, H, W, C) conv0(cart) in fp.
        feats: (B, H, W, C) projected features (fp; quantized in-kernel
            as part of the ``p * feats`` product).
        w1_i8: (C, C) int8 per-output-channel-quantized pos-conv kernel.
        k_i8: (n*n, C, C) int8 fusion kernel blocks (dy-major).
        a0, b0: (C,) f32 — BN0 affine pre-divided by the hh scale.
        a1, b1: (C,) f32 — BN1 affine carrying s_hh * s_w1 (per out
            channel) and divided by the p*feats scale.
        kdq: (n*n, C) f32 — per-neighbor dequant ``s_pf * s_k[dx]``.

    Returns:
        (B, H, W, C) f32 ``geo`` (pre-fusion1_bn).
    """
    if num_neighbors != 3:
        raise NotImplementedError(
            "the fused stem kernel hardcodes the 3x3 neighborhood; "
            "use the accumulate path"
        )
    B, H, W, C = g.shape
    n = num_neighbors
    cdt = g.dtype

    center = pl.BlockSpec(
        (1, 1, W, C), lambda b, h, kk: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    neigh = pl.BlockSpec(
        (1, 1, W, C),
        lambda b, h, kk: (b, jnp.clip(h + kk - (n // 2), 0, H - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    kspec = pl.BlockSpec(
        (n, C, C), lambda b, h, kk: (kk, 0, 0), memory_space=pltpu.VMEM
    )
    # kdq rides as (n*n, 1, C): a 2-D (n, C) block would violate the TPU
    # tiling rule (last two block dims must be divisible by (8, 128) or
    # equal the array dims — 3 x 256 over 9 x 256 is neither); with the
    # singleton axis the last two dims (1, C) equal the array's.
    kdqspec = pl.BlockSpec(
        (n, 1, C), lambda b, h, kk: (kk, 0, 0), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.BlockSpec(
        (1, 1, W, C), lambda b, h, kk: (b, h, 0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        functools.partial(
            _stem_kernel_i8, num_neighbors=n, height=H
        ),
        grid=(B, H, n),
        in_specs=[center, neigh, neigh, vec, kspec]
        + [vec] * 4
        + [kdqspec],
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        g.astype(cdt),
        g.astype(cdt),
        feats.astype(cdt),
        w1_i8,
        k_i8,
        a0.astype(jnp.float32),
        b0.astype(jnp.float32),
        a1.astype(jnp.float32),
        b1.astype(jnp.float32),
        kdq.astype(jnp.float32).reshape(n * n, 1, C),
    )


@functools.partial(
    jax.jit, static_argnames=("num_neighbors", "interpret")
)
def meta_kernel_fused(
    g: Array,
    feats: Array,
    w1: Array,
    k: Array,
    a0: Array,
    b0: Array,
    a1: Array,
    b1: Array,
    *,
    num_neighbors: int = 3,
    interpret: bool = False,
) -> Array:
    """Fused 9-neighbor stem accumulation.

    Args:
        g: (B, H, W, C) — conv0(cart), bf16 or f32.
        feats: (B, H, W, C) — projected features.
        w1: (C, C) second pos-conv kernel.
        k: (n*n, C, C) fusion1 blocked kernel (dy-major neighbor order).
        a0, b0, a1, b1: (C,) f32 eval-mode BN affines.

    Returns:
        (B, H, W, C) f32 ``geo`` (pre-fusion1_bn).
    """
    if num_neighbors != 3:
        raise NotImplementedError(
            "the fused stem kernel hardcodes the 3x3 neighborhood "
            "(edge masking + column shifts); use the accumulate path"
        )
    B, H, W, C = g.shape
    n = num_neighbors
    cdt = g.dtype

    center = pl.BlockSpec(
        (1, 1, W, C), lambda b, h, kk: (b, h, 0, 0), memory_space=pltpu.VMEM
    )
    # dy = kk neighbor row: h + kk - 1, clamped at the array bounds (the
    # kernel zeroes the edge cases, restoring zero-pad semantics).
    neigh = pl.BlockSpec(
        (1, 1, W, C),
        lambda b, h, kk: (b, jnp.clip(h + kk - (n // 2), 0, H - 1), 0, 0),
        memory_space=pltpu.VMEM,
    )
    # The dy-row's three K blocks: neighbors are dy-major, so the block
    # row is kk * n .. kk * n + n - 1.
    kspec = pl.BlockSpec(
        (n, C, C), lambda b, h, kk: (kk, 0, 0), memory_space=pltpu.VMEM
    )
    vec = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.BlockSpec(
        (1, 1, W, C), lambda b, h, kk: (b, h, 0, 0), memory_space=pltpu.VMEM
    )

    return pl.pallas_call(
        functools.partial(
            _stem_kernel, num_neighbors=n, height=H
        ),
        grid=(B, H, n),
        in_specs=[center, neigh, neigh, vec, kspec] + [vec] * 4,
        out_specs=out,
        out_shape=jax.ShapeDtypeStruct((B, H, W, C), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary", "arbitrary"),
        ),
        interpret=interpret,
    )(
        g.astype(cdt),
        g.astype(cdt),
        feats.astype(cdt),
        w1.astype(cdt),
        k.astype(cdt),
        a0.astype(jnp.float32),
        b0.astype(jnp.float32),
        a1.astype(jnp.float32),
        b1.astype(jnp.float32),
    )
