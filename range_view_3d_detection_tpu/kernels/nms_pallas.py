"""Pallas TPU kernel for the greedy (weighted) NMS scan.

The suppression scan is inherently sequential in score order; under plain
XLA each ``fori_loop`` iteration round-trips its carries through HBM. This
kernel keeps the *scan state* — alive/keep lanes and the merge payload —
resident in VMEM for the whole scan, so each of the ``cap`` steps is a
handful of VPU ops plus one (1, cap) x (cap, P) matvec for the cluster
merge.

Sizing: the (cap, cap) fp32 IoU matrix is the only superlinear buffer
(cap=1024 -> 4 MB, cap=2048 -> 16 MB: over VMEM with double buffering).
It therefore streams through the grid in row blocks — grid step b holds
rows [b*row_block, (b+1)*row_block) in VMEM (row_block sized to <=2 MB
per block) while the state lanes persist across steps (TPU grids are
sequential; scratch and constant-index-map outputs stay resident). This
lifts the scan past the old cap<=1024 whole-matrix limit — the flagship
``nms_cap: 2048`` (conf/model/range_view.yaml) runs the Pallas path.

The IoU matrix itself is computed *outside* the kernel by the vectorized
polygon-clipping code in ``ops.iou`` (embarrassingly parallel — exactly
what XLA is good at); only the sequential scan lives here.

Semantics match ``ops.nms.multiclass_nms``'s lax implementation (tested
for equivalence); that implementation remains the CPU/interpret fallback.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _nms_scan_kernel(
    iou_ref,  # (row_block, cap) f32 VMEM — rows of this grid step
    scores_ref,  # (1, cap) f32
    valid_ref,  # (1, cap) f32 (0/1)
    payload_ref,  # (cap, P) f32
    keep_ref,  # (1, cap) f32 out (constant index map: VMEM-resident)
    merged_ref,  # (cap, P) f32 out (constant index map: VMEM-resident)
    alive_ref,  # (1, cap) f32 scratch (persists across grid steps)
    *,
    row_block: int,
    cap: int,
    iou_threshold: float,
    merge_threshold: float,
):
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _init():
        alive_ref[:, :] = valid_ref[:, :]
        keep_ref[:, :] = jnp.zeros_like(keep_ref)

    scores = scores_ref[:, :]
    lane = jax.lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    base = b * row_block

    def step(i, _):
        g = base + i  # global box index of this row
        row = iou_ref[pl.ds(i, 1), :]  # (1, cap)
        alive = alive_ref[:, :]
        is_self = lane == g
        # active iff box g still alive (validity folded into alive init).
        active = jnp.sum(jnp.where(is_self, alive, 0.0)) > 0.0

        w = scores * alive * (row >= merge_threshold).astype(jnp.float32)
        # Ensure self-weight even when merge_threshold > 1 (HARD mode).
        self_w = jnp.where(is_self, scores, 0.0)
        w = jnp.maximum(w, self_w)
        wsum = jnp.maximum(jnp.sum(w), 1e-8)
        # HIGHEST precision: the MXU's default pass rounds fp32 inputs to
        # bf16 (rel err ~2^-8 — ~0.25 m on far boxes, observed on real
        # v5e); preferred_element_type alone only sets the accumulator.
        merged_row = jax.lax.dot_general(
            w,
            payload_ref[:, :],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        ) / wsum  # (1, P)

        own_payload = payload_ref[pl.ds(g, 1), :]
        merged_ref[pl.ds(g, 1), :] = jnp.where(
            active, merged_row, own_payload
        )
        # Dynamic-lane scalar stores are not supported by Mosaic; update the
        # keep row with a full-width masked write instead.
        active_f = jnp.where(active, 1.0, 0.0)
        keep_ref[:, :] = jnp.where(is_self, active_f, keep_ref[:, :])

        suppress = (row > iou_threshold).astype(jnp.float32)
        new_alive = alive * (1.0 - suppress)
        alive_ref[:, :] = jnp.where(active, new_alive, alive)
        return 0

    jax.lax.fori_loop(0, row_block, step, 0)


def _pick_row_block(cap: int) -> int:
    """Largest divisor of cap with a <=2 MB fp32 IoU row block (double
    buffering then stays <=4 MB of the ~16 MB VMEM budget)."""
    limit = max(1, (1 << 19) // cap)  # rows s.t. rows*cap*4 <= 2 MB
    rb = 1
    for cand in (512, 256, 128, 64, 32, 16, 8, 4, 2, 1):
        if cand <= limit and cap % cand == 0:
            rb = cand
            break
    return rb


@functools.partial(
    jax.jit,
    static_argnames=("iou_threshold", "merge_threshold", "interpret"),
)
def nms_scan_pallas(
    iou: Array,
    scores: Array,
    valid: Array,
    payload: Array,
    *,
    iou_threshold: float,
    merge_threshold: float,
    interpret: bool = False,
) -> Tuple[Array, Array]:
    """Run the greedy scan given a precomputed IoU matrix.

    Args:
        iou: ``(cap, cap)`` pairwise rotated IoU (score-descending order).
        scores: ``(cap,)`` sorted scores.
        valid: ``(cap,)`` bool.
        payload: ``(cap, P)`` merge payload.

    Returns:
        (keep (cap,) bool, merged (cap, P)).
    """
    cap, P = payload.shape
    row_block = _pick_row_block(cap)
    kernel = functools.partial(
        _nms_scan_kernel,
        row_block=row_block,
        cap=cap,
        iou_threshold=iou_threshold,
        merge_threshold=merge_threshold,
    )
    keep, merged = pl.pallas_call(
        kernel,
        grid=(cap // row_block,),
        out_shape=(
            jax.ShapeDtypeStruct((1, cap), jnp.float32),
            jax.ShapeDtypeStruct((cap, P), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec(
                (row_block, cap), lambda b: (b, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec((1, cap), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, cap), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, P), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, cap), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cap, P), lambda b: (0, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.VMEM((1, cap), jnp.float32)],
        interpret=interpret,
    )(
        iou.astype(jnp.float32),
        scores.astype(jnp.float32)[None],
        valid.astype(jnp.float32)[None],
        payload.astype(jnp.float32),
    )
    return keep[0] > 0.5, merged
