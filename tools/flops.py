#!/usr/bin/env python
"""Model cost analysis: FLOPs / bytes / roofline per pipeline stage.

Backs the roofline arithmetic in BENCH_NOTES.md with XLA's own cost
model instead of hand math: every stage is lowered + compiled and its
``cost_analysis()`` (flops, bytes accessed) reported, with
speed-of-light times at a configurable peak. The reference publishes no
analog; its roofline discussion lives in the CoRL'24 paper.

Usage:
    python tools/flops.py [--height 64] [--width 1808] [--batch 1]
        [--peak-tflops 197] [--hbm-gbps 819]      # v5e defaults
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import numpy as np


def stage_cost(fn, *args):
    """(gflop, gbytes) from XLA's compiled cost analysis."""
    compiled = jax.jit(fn).lower(*args).compile()
    ca = compiled.cost_analysis()
    if isinstance(ca, list):  # older jax returns one dict per device
        ca = ca[0]
    return float(ca.get("flops", 0.0)) / 1e9, float(
        ca.get("bytes accessed", 0.0)
    ) / 1e9


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--height", type=int, default=64)
    ap.add_argument("--width", type=int, default=1808)
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--peak-tflops", type=float, default=197.0)
    ap.add_argument("--hbm-gbps", type=float, default=819.0)
    ap.add_argument(
        "--tiny", action="store_true", help="tiny config (fast; CI smoke)"
    )
    ap.add_argument(
        "--train",
        action="store_true",
        help="also cost-analyze the full jitted train step (forward + "
        "targets + loss + backward + AdamW) — grounds the training-"
        "efficiency roofline the way the stage rows ground serving",
    )
    ap.add_argument(
        "--remat",
        type=int,
        default=0,
        help="train-step rematerialization (1 matches the flagship "
        "16 GB training configuration)",
    )
    args = ap.parse_args(argv)

    from __graft_entry__ import _flagship_config, _sample_inputs
    from range_view_3d_detection_tpu.models.backbone import RangeBackbone
    from range_view_3d_detection_tpu.models.decoder import (
        DecoderConfig,
        decode,
    )
    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.models.heads import DetectionHead
    from range_view_3d_detection_tpu.models.stems import MetaKernel

    import dataclasses

    cfg = _flagship_config(tiny=args.tiny)
    # The fused Pallas stem is a custom call — opaque to cost_analysis —
    # so lower the accumulate path (identical math, same FLOPs).
    cfg = dataclasses.replace(cfg, stem_pallas=False)
    B, H, W, C = args.batch, args.height, args.width, cfg.in_channels
    feats, cart, mask = _sample_inputs(B, H, W, C)

    rows = {}

    stem = MetaKernel(cfg.layers[0], dtype=cfg.compute_dtype)
    sv = stem.init(jax.random.PRNGKey(0), feats, cart, train=False)
    rows["stem"] = stage_cost(
        lambda v, f, c: stem.apply(v, f, c, train=False), sv, feats, cart
    )
    stem_out = jax.jit(
        lambda v, f, c: stem.apply(v, f, c, train=False)
    )(sv, feats, cart)

    bb = RangeBackbone(cfg.layers, dtype=cfg.compute_dtype)
    bv = bb.init(jax.random.PRNGKey(0), stem_out, train=False)
    rows["backbone"] = stage_cost(
        lambda v, x: bb.apply(v, x, train=False), bv, stem_out
    )
    ms = jax.jit(lambda v, x: bb.apply(v, x, train=False))(bv, stem_out)

    head = DetectionHead(
        fpn=cfg.fpn_dict,
        fpn_kernel_sizes=dict(cfg.fpn_kernel_sizes),
        tasks=cfg.tasks_dict,
        classification_head_channels=cfg.classification_head_channels,
        regression_head_channels=cfg.regression_head_channels,
        num_classification_blocks=cfg.num_classification_blocks,
        num_regression_blocks=cfg.num_regression_blocks,
        dtype=cfg.compute_dtype,
    )
    hv = head.init(jax.random.PRNGKey(0), ms, train=False)
    rows["heads"] = stage_cost(
        lambda v, x: head.apply(v, x, train=False), hv, ms
    )

    model = Detector(cfg)
    mv = model.init(jax.random.PRNGKey(0), feats, cart, mask, train=False)
    dec_cfg = DecoderConfig(nms_cap=256 if args.tiny else 2048)
    tasks = cfg.tasks_dict

    rows["forward"] = stage_cost(
        lambda v, f, c, m: model.apply(v, f, c, m, train=False),
        mv, feats, cart, mask,
    )
    rows["forward+decode+nms"] = stage_cost(
        lambda v, f, c, m: decode(
            model.apply(v, f, c, m, train=False), dec_cfg, tasks, use_nms=True
        ),
        mv, feats, cart, mask,
    )

    if args.train:
        from __graft_entry__ import _dryrun_batch
        from range_view_3d_detection_tpu.training import (
            optim,
            state as state_lib,
        )

        train_cfg = dataclasses.replace(cfg, remat=bool(args.remat))
        batch = _dryrun_batch(train_cfg, B, H, W, C)
        tx, _ = optim.make_optimizer(1e-3, 100, debug=True)
        st = state_lib.create_state(jax.random.PRNGKey(0), train_cfg, tx, batch)
        step = state_lib.make_train_step(train_cfg, tx)
        # step is already jitted; lower/compile without executing.
        compiled = step.lower(st, batch).compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        rows["train_step"] = (
            float(ca.get("flops", 0.0)) / 1e9,
            float(ca.get("bytes accessed", 0.0)) / 1e9,
        )

    peak = args.peak_tflops * 1e3  # GFLOP/s
    bw = args.hbm_gbps  # GB/s
    report = {"shape": [B, H, W, C], "backend": jax.default_backend()}
    for name, (gf, gb) in rows.items():
        report[name] = {
            "gflop": round(gf, 2),
            "gbytes": round(gb, 3),
            "sol_compute_ms": round(gf / peak * 1e3, 3),
            "sol_memory_ms": round(gb / bw * 1e3, 3),
            "arithmetic_intensity": round(gf / max(gb, 1e-9), 1),
        }
    print(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main(sys.argv[1:])
