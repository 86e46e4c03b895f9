"""Worker for the 2-process multi-host test (launched by test_multihost.py).

Exercises the real multi-host bring-up path on CPU: jax.distributed over
localhost, per-process dataloader index sharding, and global batch
assembly via ``make_array_from_process_local_data`` — the paths that are
otherwise only reachable on a real multi-host TPU slice
(``docs/DISTRIBUTED.md``).
"""

import json
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))


def main():
    port = sys.argv[1]
    pid = int(sys.argv[2])
    nproc = int(sys.argv[3])
    out_path = sys.argv[4]

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 2)
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=nproc,
        process_id=pid,
    )

    import jax.numpy as jnp
    import numpy as np

    from range_view_3d_detection_tpu.parallel.mesh import (
        fetch_local,
        make_mesh,
        process_sum_scalars,
        shard_batch,
    )

    assert jax.process_count() == nproc
    mesh = make_mesh(num_data=len(jax.devices()), num_model=1)

    # Global batch 4: each process contributes its local half (the
    # per-rank loader analog). Values encode the global row index.
    local = np.arange(2 * 3, dtype=np.float32).reshape(2, 3) + 10 * (
        1 + pid * 2
    )
    batch = shard_batch({"x": local}, mesh)
    assert batch["x"].shape == (4, 3)

    @jax.jit
    def global_sum(b):
        return b["x"].sum()

    total = float(global_sum(batch))

    # fetch_local inverts shard_batch: each process recovers exactly its
    # own rows of the global array (the prediction-shard write path).
    roundtrip = fetch_local(batch["x"])
    assert np.array_equal(roundtrip, local), (pid, roundtrip, local)

    # process_sum_scalars: cross-process scalar reduction (sync_dist
    # analog) — both hosts must observe the identical global sum.
    reduced = process_sum_scalars({"loss": float(local.sum()), "n": 1.0})

    # Per-process index sharding: disjoint, covering.
    from range_view_3d_detection_tpu.data.dataset import DataLoader

    class _DS:
        def __init__(self):
            self.index = [("log", i) for i in range(8)]
            self.epoch = 0

        def __len__(self):
            return len(self.index)

        def __getitem__(self, i):
            return {"i": np.asarray([i], np.int64)}

    loader = DataLoader(
        _DS(),
        batch_size=1,
        shuffle=False,
        num_workers=1,
        process_index=pid,
        process_count=nproc,
    )
    seen = sorted(
        int(i) for idx in loader._batch_indices() for i in idx
    )

    Path(out_path).write_text(
        json.dumps(
            {
                "pid": pid,
                "total": total,
                "seen": sorted(seen),
                "reduced": reduced,
            }
        )
    )


if __name__ == "__main__":
    main()
