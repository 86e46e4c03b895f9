"""Azimuth (width) sharding — the sequence-parallel analog for range images.

SURVEY §5: the reference scales the 1800-2650 px azimuth axis with
full-width convolutions on a single device. When one full-resolution image
per chip exceeds memory (or for minimum-latency inference), the natural
TPU strategy is to shard the *width* axis over the ``model`` mesh axis.

Design (round 3, EXACT): instead of one big up-front halo (which can only
approximate the network — the aggregation path's receptive field spans
hundreds of columns), every width-affecting op exchanges exactly the halo
it needs, at its own resolution:

- each k-wide conv fetches ``(k-1)//2`` columns from its ring neighbors
  via ``jax.lax.ppermute`` and runs VALID over width, so its output is
  back to exactly the local shard width;
- transposed convs fetch the (1, 1)-column halo their kernel footprint
  requires and slice the exact output region;
- the MetaKernel stem's neighbor shifts source the halo column instead of
  zero padding.

Because every op's output is exactly shard-width, BatchNorm statistics
never see halo columns; in train mode they are reduced across shards with
``lax.pmean`` (the context's ``bn_axes``), making the width-sharded
forward AND backward bit-equivalent (up to fp reassociation) to the
global model — asserted by ``tests/test_spatial_sharding.py``.

The ops consult a trace-time context (``width_sharding``) so the model
code stays layout-agnostic; collectives are neighbor ``ppermute``s —
pure ICI ring traffic, no all-to-alls. ``circular=True`` wraps the
azimuth seam (geometrically exact for 360° sweeps); ``circular=False``
(default) zeroes the outermost halos, matching the reference's zero-padded
convolutions.
"""

from __future__ import annotations

import dataclasses
from contextlib import contextmanager
from typing import Any, Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class WidthShardingContext:
    """Trace-time state consulted by width-affecting ops."""

    axis: str = "model"
    circular: bool = False
    # Mesh axes to pmean BatchNorm batch-statistics over in train mode
    # (inside shard_map reductions are manual). Empty: eval-only usage.
    bn_axes: Tuple[str, ...] = ()


_CTX: Optional[WidthShardingContext] = None


def context() -> Optional[WidthShardingContext]:
    return _CTX


@contextmanager
def width_sharding(
    axis: str = "model",
    *,
    circular: bool = False,
    bn_axes: Tuple[str, ...] = (),
):
    """Activate width-sharded op behavior for code traced inside."""
    global _CTX
    old = _CTX
    _CTX = WidthShardingContext(axis, circular, tuple(bn_axes))
    try:
        yield _CTX
    finally:
        _CTX = old


def exchange_halo_lr(
    x: Array,
    lo: int,
    hi: int,
    axis_name: str,
    *,
    w_axis: int = 2,
    circular: bool = False,
) -> Array:
    """Widen a width-sharded block with ``lo``/``hi`` neighbor columns.

    ``circular=False`` zeroes the first shard's left halo and the last
    shard's right halo (zero-padding parity with the global model);
    ``circular=True`` wraps the azimuth seam.
    """
    if lo == 0 and hi == 0:
        return x
    n = jax.lax.axis_size(axis_name)
    W = x.shape[w_axis]
    if max(lo, hi) > W:
        raise ValueError(
            f"halo ({lo},{hi}) exceeds local width {W}; use fewer width "
            "shards (single-hop neighbor exchange only)"
        )
    idx = jax.lax.axis_index(axis_name)
    parts = []
    if lo:
        take_last = jax.lax.slice_in_dim(x, W - lo, W, axis=w_axis)
        left = jax.lax.ppermute(
            take_last, axis_name, [(i, (i + 1) % n) for i in range(n)]
        )
        if not circular:
            left = jnp.where(idx == 0, jnp.zeros_like(left), left)
        parts.append(left)
    parts.append(x)
    if hi:
        take_first = jax.lax.slice_in_dim(x, 0, hi, axis=w_axis)
        right = jax.lax.ppermute(
            take_first, axis_name, [(i, (i - 1) % n) for i in range(n)]
        )
        if not circular:
            right = jnp.where(idx == n - 1, jnp.zeros_like(right), right)
        parts.append(right)
    return jnp.concatenate(parts, axis=w_axis)


def exchange_halo(x: Array, halo: int, axis_name: str, *, w_axis: int = 2) -> Array:
    """Symmetric circular halo exchange (ring wrap both ways)."""
    return exchange_halo_lr(
        x, halo, halo, axis_name, w_axis=w_axis, circular=True
    )


def bn_mean(x: Array, ctx: Optional[WidthShardingContext]) -> Array:
    """Cross-shard pmean helper for manual BatchNorm statistics."""
    if ctx is not None and ctx.bn_axes:
        return jax.lax.pmean(x, ctx.bn_axes)
    return x


def width_shardings(mesh: Mesh, axis_name: str = "model"):
    """(rank4, rank3) NamedShardings with width on the model axis."""
    return (
        NamedSharding(mesh, P("data", None, axis_name, None)),
        NamedSharding(mesh, P("data", None, axis_name)),
    )


def _out_specs_like(shapes, axis_name: str):
    rank4 = P("data", None, axis_name, None)
    rank3 = P("data", None, axis_name)
    return {
        "head": jax.tree_util.tree_map(lambda _: rank4, shapes["head"]),
        "strided": {
            s: {"cart": rank4, "mask": rank3} for s in shapes["strided"]
        },
    }


def width_sharded_forward(
    apply_fn: Callable[..., Dict[int, Any]],
    mesh: Mesh,
    variables,
    features: Array,
    cart: Array,
    mask: Array,
    *,
    axis_name: str = "model",
    circular: bool = False,
    halo: Optional[int] = None,  # ignored (kept for call compat); per-op now
):
    """One width-sharded detector forward — exact vs the global model.

    ``features/cart/mask`` must be placed with width sharded over
    ``axis_name`` (use :func:`width_shardings`). Per-op halo exchange:
    no global halo parameter, no output cropping.
    """

    def local_forward(variables, features, cart, mask):
        with width_sharding(axis_name, circular=circular):
            return apply_fn(variables, features, cart, mask)

    rank4 = P("data", None, axis_name, None)
    rank3 = P("data", None, axis_name)
    shapes = jax.eval_shape(apply_fn, variables, features, cart, mask)
    fn = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), rank4, rank4, rank3),
        out_specs=_out_specs_like(shapes, axis_name),
    )
    return fn(variables, features, cart, mask)


def width_sharded_apply(
    model,
    mesh: Mesh,
    *,
    axis_name: str = "model",
    circular: bool = False,
    train: bool = False,
):
    """Build a jit-compatible width-sharded ``model.apply`` closure.

    Train mode returns ``(outputs, mutated_batch_stats)`` with batch
    statistics pmean-reduced over (data, width) shards — identical on
    every device, so they come back replicated.
    """
    rank4 = P("data", None, axis_name, None)
    rank3 = P("data", None, axis_name)
    bn_axes = ("data", axis_name) if train else ()

    def apply_train(variables, f, c, m):
        return model.apply(
            variables, f, c, m, train=True, mutable=["batch_stats"]
        )

    def apply_eval(variables, f, c, m):
        return model.apply(variables, f, c, m, train=False)

    apply_fn = apply_train if train else apply_eval

    def sharded(variables, features, cart, mask):
        def local(variables, f, c, m):
            with width_sharding(
                axis_name, circular=circular, bn_axes=bn_axes
            ):
                return apply_fn(variables, f, c, m)

        shapes = jax.eval_shape(apply_fn, variables, features, cart, mask)
        if train:
            out_specs = (
                _out_specs_like(shapes[0], axis_name),
                jax.tree_util.tree_map(lambda _: P(), shapes[1]),
            )
        else:
            out_specs = _out_specs_like(shapes, axis_name)
        fn = jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), rank4, rank4, rank3),
            out_specs=out_specs,
        )
        return fn(variables, features, cart, mask)

    return sharded
