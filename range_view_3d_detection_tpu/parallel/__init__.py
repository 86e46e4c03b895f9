"""Parallelism layer: meshes, shardings, distributed init.

Replaces the reference's PTL ``DDPStrategy`` / NCCL substrate
(``conf/trainer/train.yaml:39-44``, §2.8 of SURVEY) with SPMD compilation:
a ``jax.sharding.Mesh``, batch-sharded inputs, replicated params, and XLA
inserting the gradient/BN all-reduces over ICI.
"""

from range_view_3d_detection_tpu.parallel.mesh import (  # noqa: F401
    batch_sharding,
    fetch_local,
    make_mesh,
    process_sum_scalars,
    replicated_sharding,
    shard_batch,
)
