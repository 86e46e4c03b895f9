#!/usr/bin/env python
"""Stage-wise forward profiling on the flagship model (TPU).

Breaks the 59 ms forward into stem / backbone / heads and compares BN
compute-dtype variants. Run directly on the TPU host.
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from __graft_entry__ import _flagship_config, _sample_inputs
from range_view_3d_detection_tpu.models.backbone import RangeBackbone, RangeNet
from range_view_3d_detection_tpu.models.detector import Detector
from range_view_3d_detection_tpu.models.heads import DetectionHead
from range_view_3d_detection_tpu.models.stems import MetaKernel


def sync(r):
    return float(jax.tree_util.tree_leaves(r)[0].sum())


def timeit(name, fn, *args, iters=8):
    sync(fn(*args))
    sync(fn(*args))
    t0 = time.perf_counter()
    for i in range(iters):
        r = fn(*args)
        if (i + 1) % 4 == 0:
            sync(r)
    print(f"{name}: {(time.perf_counter() - t0) / iters * 1e3:.2f} ms")


def main():
    cfg = _flagship_config()
    B, H, W, C = 1, 64, 1808, 5
    feats, cart, mask = _sample_inputs(B, H, W, C)
    dt = cfg.compute_dtype

    stem = MetaKernel(cfg.layers[0], dtype=dt, param_dtype=jnp.float32)
    sv = stem.init(jax.random.PRNGKey(0), feats, cart, train=False)
    stem_fn = jax.jit(lambda v, f, c: stem.apply(v, f, c, train=False))
    timeit("stem(meta)", stem_fn, sv, feats, cart)

    stem_out = stem_fn(sv, feats, cart)
    bb = RangeBackbone(cfg.layers, dtype=dt, param_dtype=jnp.float32)
    bv = bb.init(jax.random.PRNGKey(0), stem_out, train=False)
    bb_fn = jax.jit(lambda v, x: bb.apply(v, x, train=False))
    timeit("backbone", bb_fn, bv, stem_out)

    ms = bb_fn(bv, stem_out)
    head = DetectionHead(
        fpn=cfg.fpn_dict,
        fpn_kernel_sizes={1: (3, 3)},
        tasks=cfg.tasks_dict,
        classification_head_channels=cfg.classification_head_channels,
        regression_head_channels=cfg.regression_head_channels,
        dtype=dt,
        param_dtype=jnp.float32,
    )
    hv = head.init(jax.random.PRNGKey(0), ms, train=False)
    head_fn = jax.jit(lambda v, x: head.apply(v, x, train=False))
    timeit("heads", head_fn, hv, ms)

    model = Detector(cfg)
    mvars = model.init(jax.random.PRNGKey(0), feats, cart, mask, train=False)
    fwd = jax.jit(lambda v, f, c, m: model.apply(v, f, c, m, train=False))
    timeit("full_forward", fwd, mvars, feats, cart, mask)


if __name__ == "__main__":
    main()
