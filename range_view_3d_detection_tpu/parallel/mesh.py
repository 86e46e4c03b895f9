"""Device mesh + sharding helpers.

Data parallelism: the global batch is sharded over the ``data`` mesh axis
(the reference's DDP over NCCL, ``conf/trainer/train.yaml:39-44``);
parameters/optimizer state are replicated. Gradient all-reduce, sync-BN
statistics, and ``sync_dist`` loss reductions all fall out of XLA's SPMD
partitioner — no explicit collectives.

A second (currently size-1) ``model`` axis is laid out for future
width/tensor sharding of the range image (the natural SP analog discussed
in SURVEY §5: azimuth-axis sharding with halo exchange).
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    num_data: Optional[int] = None,
    num_model: int = 1,
    *,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Create a ``(data, model)`` mesh over the available devices."""
    devices = list(devices if devices is not None else jax.devices())
    if num_data is None:
        num_data = len(devices) // num_model
    needed = num_data * num_model
    if len(devices) < needed:
        # Dry-run path: fall back to the virtual CPU device pool
        # (xla_force_host_platform_device_count) — but only when it can
        # actually satisfy the mesh, and say so; silently training on 1
        # CPU device would hide a misconfiguration.
        cpu_pool = list(jax.devices("cpu"))
        if len(cpu_pool) < needed:
            raise ValueError(
                f"mesh ({num_data} data x {num_model} model) needs "
                f"{needed} devices; have {len(devices)} "
                f"({len(cpu_pool)} virtual CPU)"
            )
        import logging

        logging.getLogger(__name__).warning(
            "mesh %dx%d exceeds the %d available accelerator(s); using "
            "the virtual CPU pool (dry-run mode)",
            num_data,
            num_model,
            len(devices),
        )
        devices = cpu_pool
    arr = np.asarray(devices[:needed]).reshape(num_data, num_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (batch) axis sharded over ``data``."""
    return NamedSharding(mesh, P("data"))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch: Dict[str, Any], mesh: Mesh) -> Dict[str, Any]:
    """Place a host batch onto the mesh, batch-axis sharded.

    Single-host: plain ``device_put``. Multi-host: each process passes its
    *local* slice of the global batch and the global array is assembled
    with ``make_array_from_process_local_data`` (the SPMD analog of DDP's
    per-rank loaders).
    """
    sharding = batch_sharding(mesh)
    if jax.process_count() > 1:
        return jax.tree_util.tree_map(
            lambda x: jax.make_array_from_process_local_data(sharding, x),
            batch,
        )
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, sharding), batch
    )


def fetch_local(x) -> np.ndarray:
    """Host copy of the process-local rows of a batch-sharded global array
    (the inverse of ``shard_batch``). Fully-replicated arrays and the
    single-host case return the full array.

    Multi-host ``np.asarray`` on a data-sharded global array would fail
    (non-addressable shards); each host instead assembles its own rows so
    downstream per-sweep shard writes stay single-writer.
    """
    if jax.process_count() == 1 or not hasattr(x, "addressable_shards"):
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x)
    rows = {}
    for s in x.addressable_shards:
        # This helper reassembles along the leading (batch) axis only; a
        # width-/model-sharded array would silently collapse onto one
        # shard here, so reject it loudly instead.
        for d, sl in enumerate(s.index[1:], start=1):
            full = (sl.start in (None, 0)) and (
                sl.stop is None or sl.stop == x.shape[d]
            )
            if not full:
                raise ValueError(
                    "fetch_local supports arrays sharded on the leading "
                    f"(batch) axis only; got a shard spanning {sl} on "
                    f"axis {d} of global shape {x.shape}"
                )
        start = s.index[0].start or 0
        rows[start] = np.asarray(s.data)
    return np.concatenate([rows[k] for k in sorted(rows)], axis=0)


def zero1_state_sharding(mesh: Mesh, state) -> Any:
    """ZeRO-1 sharding tree for a ``TrainState``: optimizer-state leaves
    are sharded over the ``data`` axis (along their largest divisible
    axis), params/batch-stats/step stay replicated.

    AdamW's moment update is elementwise, so any-axis sharding is
    comm-free; the one collective XLA inserts is the all-gather of the
    (sharded) parameter updates back to replicated params — the ZeRO-1
    trade: per-step param-sized all-gather over ICI buys
    ``2 * params * (n-1)/n`` HBM back from the moments. Grads remain
    all-reduced replicated (ZeRO-2's reduce-scatter is out of scope).
    Reference analog: none (the reference replicates optimizer state
    under DDP); TPU-native scaling headroom.
    """
    n = int(mesh.shape["data"])
    repl = replicated_sharding(mesh)

    def opt_spec(leaf):
        shape = getattr(leaf, "shape", ())
        if n <= 1 or len(shape) == 0 or int(np.prod(shape)) < 2 * n:
            return repl
        # Largest axis divisible by the data size (conv kernels are HWIO
        # — the spatial axes are tiny, the channel axes divide evenly).
        best, best_s = None, 0
        for d, s in enumerate(shape):
            if s % n == 0 and s > best_s:
                best, best_s = d, int(s)
        if best is None:
            return repl
        spec = [None] * len(shape)
        spec[best] = "data"
        return NamedSharding(mesh, P(*spec))

    shardings = jax.tree_util.tree_map(lambda _: repl, state)
    return shardings.replace(
        opt_state=jax.tree_util.tree_map(opt_spec, state.opt_state)
    )


def process_sum_scalars(values: Dict[str, float]) -> Dict[str, float]:
    """Sum a dict of host scalars across processes (the ``sync_dist=True``
    analog — reference detector.py:385-389). Identity on a single host."""
    if jax.process_count() == 1:
        return {k: float(v) for k, v in values.items()}
    from jax.experimental import multihost_utils

    keys = sorted(values)
    arr = np.asarray([float(values[k]) for k in keys], np.float32)
    gathered = np.asarray(multihost_utils.process_allgather(arr))
    total = gathered.reshape(jax.process_count(), len(keys)).sum(axis=0)
    return {k: float(t) for k, t in zip(keys, total)}


def initialize_distributed() -> None:
    """Multi-host bring-up (SLURM/jobset analog of the reference's
    ``dist.init_process_group`` path). No-op on a single host.

    Cluster schedulers that jax auto-detects (SLURM, GKE jobset) need only
    ``JAX_COORDINATOR_ADDRESS``; manual launches (e.g.
    ``scripts/launch-local-hosts.sh``) pass the process topology through
    ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID`` explicitly.
    """
    import os

    addr = os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not addr:
        return
    kwargs = {}
    if os.environ.get("JAX_NUM_PROCESSES"):
        if not os.environ.get("JAX_PROCESS_ID"):
            raise RuntimeError(
                "JAX_NUM_PROCESSES is set but JAX_PROCESS_ID is not; "
                "manual multi-host launches must export both (see "
                "scripts/launch-local-hosts.sh / docs/DISTRIBUTED.md)."
            )
        kwargs["num_processes"] = int(os.environ["JAX_NUM_PROCESSES"])
        kwargs["process_id"] = int(os.environ["JAX_PROCESS_ID"])
    jax.distributed.initialize(coordinator_address=addr, **kwargs)
