#!/usr/bin/env python
"""Real-TPU validation of the row-blocked Pallas NMS scan.

The kernel (kernels/nms_pallas.py) is interpret-equivalence-tested on
CPU (tests/test_nms_pallas.py); this script validates the *lowering* on
actual hardware — Mosaic rejects some programs the interpreter accepts
(out-of-bounds index maps, unsupported stores; see BENCH_NOTES.md) — by
comparing the pallas backend against the lax fallback at the flagship
operating points.

Usage (axon tunnel up):
    timeout 590 python tools/validate_nms_tpu.py [--caps 1024,2048,4096]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np


def random_boxes(n: int, seed: int, spread: float, num_classes: int = 26):
    rng = np.random.default_rng(seed)
    xy = rng.uniform(-spread, spread, (n, 2))
    z = rng.uniform(-1, 1, (n, 1))
    lw = rng.uniform(1.0, 6.0, (n, 2))
    h = rng.uniform(1.0, 2.5, (n, 1))
    yaw = rng.uniform(-np.pi, np.pi, (n, 1))
    boxes = np.concatenate([xy, z, lw, h, yaw], axis=-1).astype(np.float32)
    scores = rng.uniform(0.0, 1.0, n).astype(np.float32)
    cats = rng.integers(0, num_classes, n).astype(np.int32)
    return boxes, scores, cats


def main(argv):
    ap = argparse.ArgumentParser()
    ap.add_argument("--caps", default="1024,2048,4096")
    ap.add_argument("--n", type=int, default=9216)
    ap.add_argument("--mode", default="WEIGHTED", choices=("WEIGHTED", "HARD"))
    args = ap.parse_args(argv)

    import jax

    from range_view_3d_detection_tpu.ops.nms import multiclass_nms

    backend = jax.default_backend()
    print(f"backend: {backend}")
    pallas_backend = "pallas"
    if backend != "tpu":
        print("WARNING: not on TPU — falling back to interpret mode "
              "(validates semantics only, not the Mosaic lowering)")
        pallas_backend = "pallas_interpret"

    ok = True
    for cap in (int(c) for c in args.caps.split(",")):
        boxes, scores, cats = random_boxes(args.n, seed=cap, spread=60.0)
        kw = dict(
            cap=cap,
            iou_threshold=0.3,
            min_confidence=0.1,
            mode=args.mode,
        )
        t0 = time.perf_counter()
        res_p = multiclass_nms(boxes, scores, cats, backend=pallas_backend, **kw)
        keep_p = np.asarray(res_p.keep)
        t_pallas = time.perf_counter() - t0
        t0 = time.perf_counter()
        res_l = multiclass_nms(boxes, scores, cats, backend="lax", **kw)
        keep_l = np.asarray(res_l.keep)
        t_lax = time.perf_counter() - t0

        same_keep = bool((keep_p == keep_l).all())
        cub_close = bool(
            np.allclose(
                np.asarray(res_p.cuboids)[keep_p],
                np.asarray(res_l.cuboids)[keep_l],
                atol=1e-3,
            )
            if same_keep
            else False
        )
        n_keep = int(keep_p.sum())
        status = "OK" if (same_keep and cub_close) else "MISMATCH"
        ok &= same_keep and cub_close
        print(
            f"cap={cap:5d} keep={n_keep:5d} keep_equal={same_keep} "
            f"boxes_close={cub_close} "
            f"wall pallas(+compile)={t_pallas:.2f}s lax(+compile)={t_lax:.2f}s "
            f"-> {status}"
        )
    print("PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
