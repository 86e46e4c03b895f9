"""2-process multi-host data-parallel test over localhost (CPU).

Covers the never-executed-on-hardware paths from ``docs/DISTRIBUTED.md``:
``jax.distributed`` bring-up, ``make_array_from_process_local_data``
global batch assembly (``parallel/mesh.py::shard_batch``), a cross-process
jitted reduction, and the per-host dataloader index sharding — the SPMD
analog of the reference's DDP/NCCL + DistributedSampler
(``conf/trainer/train.yaml:39-44``).
"""

import json
import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

pytestmark = pytest.mark.slow

REPO = Path(__file__).resolve().parent.parent


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_data_parallel(tmp_path):
    port = _free_port()
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)  # worker pins its own device count
    env["JAX_PLATFORMS"] = "cpu"

    procs = []
    outs = []
    for pid in range(2):
        out = tmp_path / f"worker_{pid}.json"
        outs.append(out)
        procs.append(
            subprocess.Popen(
                [
                    sys.executable,
                    str(REPO / "tests" / "multihost_worker.py"),
                    str(port),
                    str(pid),
                    "2",
                    str(out),
                ],
                env=env,
                stdout=subprocess.PIPE,
                stderr=subprocess.STDOUT,
            )
        )
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=540)
        logs.append(stdout.decode())
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-3000:]}"

    results = [json.loads(o.read_text()) for o in outs]
    # Global sum visible identically on both processes: rows 10..15 from
    # process 0 (base 10) and 30..35 from process 1 (base 30).
    import numpy as np

    local0 = np.arange(6).reshape(2, 3) + 10
    local1 = np.arange(6).reshape(2, 3) + 30
    want = float(local0.sum() + local1.sum())
    assert results[0]["total"] == want
    assert results[1]["total"] == want

    # Index shards are disjoint and cover the dataset.
    s0, s1 = set(results[0]["seen"]), set(results[1]["seen"])
    assert s0.isdisjoint(s1)
    assert s0 | s1 == set(range(8))

    # Cross-process scalar reduction (sync_dist analog): both hosts see
    # the identical global sum of their per-host val-loss scalars.
    want_loss = float(local0.sum() + local1.sum())
    assert results[0]["reduced"] == results[1]["reduced"]
    assert results[0]["reduced"]["loss"] == want_loss
    assert results[0]["reduced"]["n"] == 2.0


def test_uneven_shard_padding_equalizes_batch_counts():
    """Hosts must produce IDENTICAL batch counts (each batch is a global
    collective): with len(dataset) % process_count != 0 the shard pads by
    wrapping, like DistributedSampler — otherwise one host enters a
    collective the other never reaches and the job deadlocks."""
    import numpy as np

    from range_view_3d_detection_tpu.data.dataset import DataLoader

    class _DS:
        def __init__(self, n):
            self.index = list(range(n))
            self.epoch = 0

        def __len__(self):
            return len(self.index)

    for n, nproc, bs in ((31, 2, 16), (33, 2, 16), (10, 3, 2)):
        counts = []
        all_seen = set()
        for pid in range(nproc):
            loader = DataLoader(
                _DS(n),
                batch_size=bs,
                shuffle=False,
                drop_last=False,
                num_workers=0,
                process_index=pid,
                process_count=nproc,
            )
            batches = loader._batch_indices()
            counts.append(len(batches))
            for b in batches:
                all_seen.update(int(i) for i in b)
        assert len(set(counts)) == 1, (n, nproc, bs, counts)
        assert all_seen == set(range(n))  # wrap-padding loses nothing
