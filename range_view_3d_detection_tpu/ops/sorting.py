"""Small fixed-size sorts as bitonic compare-exchange networks.

XLA's generic variadic sort is expensive on TPU (it lowers to a scalar
loop-heavy routine). For the rotated-IoU polygon ordering we only ever
sort 24 candidate points per box pair — a fixed-size problem that maps to
a bitonic network: 15 vectorized compare-exchange stages for n=32, each a
gather + ``where`` on the lane dimension. This keeps the whole IoU
computation on the VPU.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array


@lru_cache(maxsize=None)
def _bitonic_stages(n: int) -> Tuple[Tuple[np.ndarray, np.ndarray], ...]:
    """Precompute (partner permutation, take_min mask) per stage for size n
    (n must be a power of two)."""
    assert n & (n - 1) == 0, "bitonic size must be a power of two"
    idx = np.arange(n)
    stages = []
    k = 2
    while k <= n:
        j = k // 2
        while j >= 1:
            partner = idx ^ j
            asc = (idx & k) == 0
            lower = idx < partner
            take_min = asc == lower
            stages.append((partner, take_min))
            j //= 2
        k *= 2
    return tuple(stages)


def sort_with_payload(keys: Array, payload: Array, n_pad: int | None = None):
    """Ascending sort of ``keys (..., n)`` carrying ``payload (..., n, P)``.

    Pads to the next power of two with ``+inf`` keys (padded payload rows
    are undefined; callers already mask by a valid count).

    Returns (sorted_keys, sorted_payload) of the padded size.
    """
    n = keys.shape[-1]
    size = n_pad or (1 << (n - 1).bit_length())
    if size != n:
        pad_shape = keys.shape[:-1] + (size - n,)
        keys = jnp.concatenate(
            [keys, jnp.full(pad_shape, jnp.inf, keys.dtype)], axis=-1
        )
        payload = jnp.concatenate(
            [
                payload,
                jnp.zeros(
                    payload.shape[:-2] + (size - n, payload.shape[-1]),
                    payload.dtype,
                ),
            ],
            axis=-2,
        )

    for partner_np, take_min_np in _bitonic_stages(size):
        partner = jnp.asarray(partner_np)
        take_min = jnp.asarray(take_min_np)
        b_keys = jnp.take(keys, partner, axis=-1)
        b_payload = jnp.take(payload, partner, axis=-2)
        # out[i] = min(a, b) where take_min else max(a, b); selecting the
        # original (a) element when (a < b) == take_min. Ties MUST keep
        # each side's own element: with `<=` both partners of an equal
        # pair selected the same element, duplicating one payload and
        # dropping the other.
        choose_a = (keys == b_keys) | ((keys < b_keys) == take_min)
        keys = jnp.where(choose_a, keys, b_keys)
        payload = jnp.where(choose_a[..., None], payload, b_payload)
    return keys, payload
