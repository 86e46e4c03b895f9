#!/usr/bin/env python
"""Train-step throughput on the flagship model (real TPU).

Measures steps/s and frames/s for the full jitted train step (forward +
targets + losses + backward + AdamW), with and without rematerialization,
at the largest batch that fits.
"""

from __future__ import annotations

import dataclasses
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from __graft_entry__ import _flagship_config, _sample_inputs
from range_view_3d_detection_tpu.training import optim, state as state_lib


def sync(tree):
    return float(jax.tree_util.tree_leaves(tree)[0].sum())


def make_batch(B, H, W, C, K, seed=0):
    import jax.numpy as jnp

    feats, cart, mask = _sample_inputs(B, H, W, C, seed=seed)
    rng = np.random.default_rng(seed)
    boxes = np.zeros((B, K, 7), np.float32)
    valid = np.zeros((B, K), bool)
    carr = np.asarray(cart)
    for b in range(B):
        for k in range(24):
            y, x = rng.integers(0, H), rng.integers(0, W)
            boxes[b, k, :3] = carr[b, y, x]
            boxes[b, k, 3:6] = rng.uniform(2, 8, 3)
            boxes[b, k, 6] = rng.uniform(-np.pi, np.pi)
            valid[b, k] = True
    return {
        "features": feats,
        "cart": cart,
        "mask": mask,
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(valid),
        "box_task": jnp.zeros((B, K), jnp.int32),
        "box_offset": jnp.asarray(rng.integers(0, 26, (B, K)).astype(np.int32)),
    }


def main():
    H, W, C, K = 64, 1808, 5, 64
    for remat in (False, True):
        for B in (1, 2, 4):
            cfg = dataclasses.replace(
                _flagship_config(), max_boxes=K, remat=remat
            )
            try:
                batch = make_batch(B, H, W, C, K)
                tx, _ = optim.make_optimizer(1e-3, 100)
                st = state_lib.create_state(
                    jax.random.PRNGKey(0), cfg, tx, batch
                )
                step = state_lib.make_train_step(cfg, tx)
                st, m = step(st, batch)
                sync(m["loss"])
                iters, chunk = 8, 4
                t0 = time.perf_counter()
                for i in range(iters):
                    st, m = step(st, batch)
                    if (i + 1) % chunk == 0:
                        sync(m["loss"])
                dt = (time.perf_counter() - t0) / iters
                print(
                    f"remat={remat} B={B}: {dt*1e3:.1f} ms/step "
                    f"-> {B/dt:.2f} frames/s"
                )
            except Exception as exc:
                print(f"remat={remat} B={B}: FAILED ({type(exc).__name__})")
                break


if __name__ == "__main__":
    main()
