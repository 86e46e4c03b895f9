"""Index manipulation utilities.

Capability parity with ``src/torchbox3d/math/ops/index.py`` (9-235):
ravel/unravel multi-indices, dense scatter, grid builders, unique-index
selection — numpy/JAX hybrids (these run host-side in the data layer and
on-device where jitted callers need them).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np
from jax import Array


def ravel_multi_index(indices: Array, shape: Sequence[int]) -> Array:
    """(N, D) multi-indices -> (N,) flat indices (row-major)."""
    shape = tuple(int(s) for s in shape)
    strides = np.cumprod((1,) + shape[::-1][:-1])[::-1]
    strides = jnp.asarray(strides.copy(), indices.dtype)
    return (indices * strides).sum(axis=-1)


def unravel_index(flat: Array, shape: Sequence[int]) -> Array:
    """(N,) flat indices -> (N, D) multi-indices (row-major)."""
    out = jnp.stack(jnp.unravel_index(flat, tuple(shape)), axis=-1)
    return out


def scatter_nd(
    indices: Array, updates: Array, shape: Sequence[int]
) -> Array:
    """Dense scatter of ``updates`` at multi-``indices`` into zeros(shape)."""
    out = jnp.zeros(tuple(shape), updates.dtype)
    return out.at[tuple(indices.T)].set(updates)


def mgrid(sizes: Sequence[int]) -> Array:
    """Dense integer grid: (prod(sizes), len(sizes))."""
    axes = [jnp.arange(s) for s in sizes]
    grid = jnp.meshgrid(*axes, indexing="ij")
    return jnp.stack([g.reshape(-1) for g in grid], axis=-1)


def ogrid_sparse_neighborhoods(
    centers: Array, sizes: Sequence[int]
) -> Array:
    """Neighborhood offsets around each center: (N * prod(sizes), D)."""
    offsets = mgrid(sizes) - jnp.asarray([s // 2 for s in sizes])
    return (centers[:, None, :] + offsets[None]).reshape(
        -1, centers.shape[-1]
    )


def unique_indices(indices: Array, dim: int = 0) -> Array:
    """Indices of the first occurrence of each unique row, in stable order."""
    _, first = np.unique(np.asarray(indices), axis=dim, return_index=True)
    return jnp.asarray(np.sort(first))
