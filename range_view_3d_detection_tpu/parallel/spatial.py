"""Azimuth (width) sharding — the sequence-parallel analog for range images.

SURVEY §5: the reference scales the 1800-2650 px azimuth axis with
full-width convolutions + circular padding on a single device. When one
full-resolution image per chip exceeds memory (or for minimum-latency
inference), the natural TPU strategy is to shard the *width* axis over the
``model`` mesh axis:

- every device holds a contiguous azimuth slice of the image,
- before the network runs, each device receives a halo of ``halo`` columns
  from both ring neighbors via ``jax.lax.ppermute`` (the azimuth axis is
  circular, so the ring wrap is geometrically exact — the wrap seam *is*
  the physical 360° seam),
- the stem/backbone/head run on the locally-padded slice, and the halo
  region is cropped from the outputs.

Exactness: per *operation* the halo mechanism is exact up to the halo
width (``tests/test_spatial_sharding.py::test_width_sharded_conv_exact``).
For the FULL detector the stride-16 aggregation (deconv) path spreads a
pixel's influence across the entire azimuth, so any bounded halo makes
the sharded network an *approximation* of the global one, with error
controlled by ``halo`` relative to the shard width; gradients flow
through the ppermute halos and stay aligned with the global model's
(``test_width_sharded_training_gradient_quality``). Collectives are two
neighbor ``ppermute``s per step — pure ICI traffic with no all-to-all.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable, Dict

import jax
import jax.numpy as jnp
from jax import Array
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def exchange_halo(x: Array, halo: int, axis_name: str, *, w_axis: int = 2) -> Array:
    """Concatenate ring-neighbor halos onto a width-sharded block.

    Args:
        x: local block, width on ``w_axis``.
        halo: columns to fetch from each neighbor.

    Returns:
        block widened by ``2 * halo`` (left halo + block + right halo).
    """
    n = jax.lax.axis_size(axis_name)
    if n == 1 or halo == 0:
        return x
    if halo > x.shape[w_axis]:
        raise ValueError(
            f"halo {halo} exceeds local width {x.shape[w_axis]}; use fewer "
            "width shards (single-hop neighbor exchange only)"
        )
    right_perm = [(i, (i + 1) % n) for i in range(n)]
    left_perm = [(i, (i - 1) % n) for i in range(n)]

    take_last = jax.lax.slice_in_dim(x, x.shape[w_axis] - halo, x.shape[w_axis], axis=w_axis)
    take_first = jax.lax.slice_in_dim(x, 0, halo, axis=w_axis)
    # Our left halo is the previous device's last columns.
    left = jax.lax.ppermute(take_last, axis_name, right_perm)
    # Our right halo is the next device's first columns.
    right = jax.lax.ppermute(take_first, axis_name, left_perm)
    return jnp.concatenate([left, x, right], axis=w_axis)


def crop_halo(x: Array, halo: int, stride: int, *, w_axis: int = 2) -> Array:
    """Remove a halo that the network has downscaled by ``stride``."""
    if halo == 0:
        return x
    if halo % stride:
        raise ValueError(
            f"halo ({halo}) must be divisible by every head stride "
            f"(got {stride}): a fractional crop would leave halo columns "
            "in the assembled output"
        )
    h = halo // stride
    return jax.lax.slice_in_dim(x, h, x.shape[w_axis] - h, axis=w_axis)


def width_sharded_forward(
    apply_fn: Callable[..., Dict[int, Any]],
    mesh: Mesh,
    variables,
    features: Array,
    cart: Array,
    mask: Array,
    *,
    halo: int,
    axis_name: str = "model",
):
    """Run one width-sharded forward (functional entry; jit-compatible).

    ``features/cart/mask`` must be placed with width sharded over
    ``axis_name`` (use :func:`width_shardings`).
    """

    def local_forward(variables, features, cart, mask):
        f = exchange_halo(features, halo, axis_name)
        c = exchange_halo(cart, halo, axis_name)
        m = exchange_halo(mask, halo, axis_name, w_axis=2)
        out = apply_fn(variables, f, c, m)

        def crop_for(stride):
            return lambda x: crop_halo(x, halo, int(stride))

        return {
            "head": {
                s: jax.tree_util.tree_map(crop_for(s), out["head"][s])
                for s in out["head"]
            },
            "strided": {
                s: {
                    "cart": crop_halo(out["strided"][s]["cart"], halo, int(s)),
                    "mask": crop_halo(out["strided"][s]["mask"], halo, int(s)),
                }
                for s in out["strided"]
            },
        }

    rank4 = P("data", None, axis_name, None)
    rank3 = P("data", None, axis_name)

    # Evaluate output structure to build matching out_specs.
    shapes = jax.eval_shape(
        lambda v, f, c, m: apply_fn(v, f, c, m), variables, features, cart, mask
    )
    out_specs = {
        "head": jax.tree_util.tree_map(lambda _: rank4, shapes["head"]),
        "strided": {
            s: {"cart": rank4, "mask": rank3}
            for s in shapes["strided"]
        },
    }

    fn = jax.shard_map(
        local_forward,
        mesh=mesh,
        in_specs=(P(), rank4, rank4, rank3),
        out_specs=out_specs,
    )
    return fn(variables, features, cart, mask)


def width_shardings(mesh: Mesh, axis_name: str = "model"):
    """(rank4, rank3) NamedShardings with width on the model axis."""
    return (
        NamedSharding(mesh, P("data", None, axis_name, None)),
        NamedSharding(mesh, P("data", None, axis_name)),
    )
