#!/usr/bin/env python
"""Grid remat SCOPE over the flagship train step on real hardware.

Training is bandwidth-bound (BENCH_NOTES "training-step roofline"):
rematerialization ADDS bytes and FLOPs, so it should cover only the
module groups HBM fit actually requires. This sweeps
``DetectorConfig.remat_scope`` subsets at flagship batch 2 and reports
ms/step with host-readback walls; OOM is caught and reported as infeasible.

Usage: python tools/remat_grid.py [--batch 2] [--iters 12]
"""

from __future__ import annotations

import argparse
import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from __graft_entry__ import _flagship_config
from range_view_3d_detection_tpu.training import optim, state as state_lib
from profile_train import make_batch  # noqa: E402 (tools/ is on sys.path)

SCOPES = (
    None,  # remat fully off
    ("stem", "stages", "heads", "loss"),  # round-3 default (all)
    ("stem", "heads", "loss"),
    ("stem", "loss"),
    ("stem", "heads"),
    ("heads", "loss"),
    ("stem",),
    ("loss",),
)


def measure(scope, batch, B, iters) -> float:
    cfg = dataclasses.replace(
        _flagship_config(),
        max_boxes=64,
        remat=scope is not None,
        remat_scope=scope or (),
    )
    tx, _ = optim.make_optimizer(1e-3, 100)
    st = state_lib.create_state(jax.random.PRNGKey(0), cfg, tx, batch)
    step = state_lib.make_train_step(cfg, tx)
    st, m = step(st, batch)
    float(m["loss"])  # compile + warm
    for _ in range(2):
        st, m = step(st, batch)
    float(m["loss"])
    t0 = time.perf_counter()
    for _ in range(iters):
        st, m = step(st, batch)
    float(m["loss"])  # host readback drains the queue (tunnel-safe wall)
    return (time.perf_counter() - t0) / iters * 1000.0


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--iters", type=int, default=12)
    args = p.parse_args()

    B = args.batch
    batch = make_batch(B, 64, 1808, 5, 64)
    print(f"flagship train step, batch {B} (64x1808), {args.iters} iters")
    for scope in SCOPES:
        name = "off" if scope is None else "+".join(scope) or "none"
        try:
            ms = measure(scope, batch, B, args.iters)
            print(f"  remat[{name:>24s}]  {ms:7.1f} ms/step "
                  f"({B / ms * 1000:.2f} fr/s)", flush=True)
        except Exception as e:  # OOM or lowering failure
            msg = str(e).splitlines()[0][:90]
            print(f"  remat[{name:>24s}]  INFEASIBLE: {msg}", flush=True)


if __name__ == "__main__":
    main()
