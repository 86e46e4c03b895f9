"""Env-driven XLA compiler options for jitted programs.

TPU-backend knobs like ``xla_tpu_scoped_vmem_limit_kib`` are libtpu
*compiler options*, not client flags: this image's XLA client
fatally rejects them in ``XLA_FLAGS`` (``parse_flags_from_env``), and
env vars don't cross the remote-compile boundary anyway. The channel
that works — including through axon's ``/remote_compile`` service,
which validates option names terminal-side — is the per-program
``Lowered.compile(compiler_options=...)`` AOT path.

``jit_env_options(fn)`` reads ``RV3D_COMPILER_OPTIONS`` (comma list of
``name=value``) once; unset, it is exactly ``jax.jit(fn)``. Set, the
returned callable lowers+compiles on first call with those options
(memoized per argument shapes/dtypes) — an A/B of a compiler knob is
then one env var on an unchanged benchmark:

    RV3D_COMPILER_OPTIONS=xla_tpu_scoped_vmem_limit_kib=65536 \
        python bench.py
"""

from __future__ import annotations

import os
from typing import Callable, Dict, Tuple

import jax

ENV_VAR = "RV3D_COMPILER_OPTIONS"


def parse_options(spec: str) -> Dict[str, str]:
    """``"a=1,b=c"`` -> ``{"a": "1", "b": "c"}`` (empty items skipped)."""
    out: Dict[str, str] = {}
    for item in spec.split(","):
        item = item.strip()
        if not item:
            continue
        if "=" not in item:
            raise ValueError(
                f"{ENV_VAR} items must be name=value, got {item!r}"
            )
        k, v = item.split("=", 1)
        out[k.strip()] = v.strip()
    return out


def _arg_key(args) -> Tuple:
    # Key on pytree STRUCTURE + leaf (shape, dtype): two calls with
    # different structures but identical leaf specs must not share an
    # executable (ADVICE r4).
    return (
        jax.tree_util.tree_structure(args),
        tuple(
            (getattr(a, "shape", None), str(getattr(a, "dtype", type(a))))
            for a in jax.tree_util.tree_leaves(args)
        ),
    )


def jit_env_options(fn: Callable) -> Callable:
    """``jax.jit`` honoring ``RV3D_COMPILER_OPTIONS`` (see module doc)."""
    spec = os.environ.get(ENV_VAR, "")
    jitted = jax.jit(fn)
    if not spec:
        return jitted
    options = parse_options(spec)
    cache: Dict[Tuple, Callable] = {}

    def wrapper(*args, **kwargs):
        if kwargs:
            raise TypeError(
                "jit_env_options wrapper is positional-only under "
                f"{ENV_VAR} (kwargs are not part of the compile cache key)"
            )
        key = _arg_key(args)
        if key not in cache:
            cache[key] = jitted.lower(*args).compile(options)
        return cache[key](*args)

    return wrapper
