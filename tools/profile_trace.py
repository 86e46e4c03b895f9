#!/usr/bin/env python
"""Capture a jax.profiler trace of the flagship forward and print top ops.

The tunnel-friendly replacement for the reference's nsight/cuda-sync
profiling (SURVEY §5): writes an xplane/trace to --out and aggregates
device fusion durations.

Usage: python tools/profile_trace.py [--out /tmp/fwd_trace]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax


def summarize(trace_dir: str, top: int = 30) -> None:
    """Aggregate per-op device time from the TPU trace lane.

    Counts EVERY op event on the ``/device:TPU:*`` process lanes —
    fusions, custom-call (Pallas) kernels, copies, dynamic-slices —
    except the enclosing ``jit_*`` module span (which already equals the
    sum of its children and would double-count). An earlier version
    summed only ``fusion.*`` names and under-reported device time ~20%
    at the fast operating point (missed ``meta_kernel_fused``,
    ``nms_scan_pallas``, small formatting ops).
    """
    files = sorted(glob.glob(f"{trace_dir}/plugins/profile/*/*.trace.json.gz"))
    if not files:
        print("no trace files found")
        return
    data = json.load(gzip.open(files[-1]))
    lanes = {
        e["pid"]
        for e in data.get("traceEvents", [])
        if e.get("ph") == "M"
        and e.get("name") == "process_name"
        and "device:TPU" in e.get("args", {}).get("name", "")
    }
    agg = collections.Counter()
    module_ms = 0.0
    for e in data.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 0 and e.get("pid") in lanes:
            # Exclude whole-module spans: the jit_* entry AND its bare
            # program-id twin (an all-digits lane name, e.g. '0', that
            # mirrors the module duration) — both already equal the sum
            # of their children and would double-count the total.
            if e["name"].startswith(("jit_", "jit__")):
                module_ms += e["dur"] / 1e3
            elif not e["name"].isdigit():
                agg[e["name"]] += e["dur"]
    total = sum(agg.values())
    print(
        f"device op total: {total/1e3:.2f} ms over {len(agg)} ops "
        f"(module span: {module_ms:.2f} ms)"
    )
    for name, dur in agg.most_common(top):
        print(f"  {dur/1e3:8.2f} ms  {name}")
    # Grouped view: where does the long tail go? Strip trailing .N ids
    # and digits so fusion.123 / copy.4 / dynamic-slice.7 bucket together.
    groups = collections.Counter()
    counts = collections.Counter()
    for name, dur in agg.items():
        base = name.split(".")[0].rstrip("0123456789_")
        groups[base] += dur
        counts[base] += 1
    print("by op class:")
    for base, dur in groups.most_common(15):
        print(f"  {dur/1e3:8.2f} ms  {counts[base]:5d} ops  {base}")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/fwd_trace")
    ap.add_argument("--summarize-only", action="store_true")
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--height", type=int, default=64)
    # 1808 = x_stride 1; 464 = the rv-av2-fast x_stride-4 operating point
    # ((1800 + 2*28) / 4, data/dataset.py::width_padding).
    ap.add_argument("--width", type=int, default=1808)
    ap.add_argument("--decode", action="store_true", help="trace decode+NMS too")
    ap.add_argument(
        "--points",
        action="store_true",
        help="trace from raw clouds: on-device rasterization "
        "(rasterize_points_jax) fused in front of the forward "
        "(implies --decode; flagship AV2 geometry)",
    )
    ap.add_argument("--num-points", type=int, default=131072)
    ap.add_argument(
        "--quantized",
        nargs="?",
        const="full",
        default=None,
        choices=("full", "heads"),
        help="profile the int8 PTQ serving path (models/quantized.py): "
        "calibrate on one synthetic batch, then trace the int8 forward",
    )
    ap.add_argument(
        "--train",
        action="store_true",
        help="trace the FULL jitted train step (forward + targets + loss "
        "+ backward + AdamW) instead of the serving forward — per-op "
        "attribution of the training recipe (flagship geometry; "
        "--batch/--remat-scope select the recipe point)",
    )
    ap.add_argument(
        "--remat-scope",
        default="",
        help="comma list for --train (e.g. stem,heads,loss); empty = "
        "remat off (the round-4 batch-1 recipe)",
    )
    args = ap.parse_args()

    if args.train and not args.summarize_only:
        import dataclasses

        sys.path.insert(0, str(Path(__file__).resolve().parent))
        from __graft_entry__ import _flagship_config
        from profile_train import make_batch, sync
        from range_view_3d_detection_tpu.training import (
            optim,
            state as state_lib,
        )

        K = 64
        scope = tuple(s for s in args.remat_scope.split(",") if s)
        cfg = dataclasses.replace(
            _flagship_config(), max_boxes=K, remat=bool(scope),
            **({"remat_scope": scope} if scope else {}),
        )
        batch = make_batch(args.batch, args.height, args.width, 5, K)
        tx, _ = optim.make_optimizer(1e-3, 100)
        st = state_lib.create_state(jax.random.PRNGKey(0), cfg, tx, batch)
        step = state_lib.make_train_step(cfg, tx)
        st, m = step(st, batch)
        sync(m["loss"])  # compile + warm outside the trace
        with jax.profiler.trace(args.out):
            st, m = step(st, batch)
            sync(m["loss"])
        summarize(args.out)
        return

    if not args.summarize_only:
        from __graft_entry__ import _flagship_config, _sample_inputs
        from range_view_3d_detection_tpu.models.decoder import (
            DecoderConfig,
            decode,
        )
        from range_view_3d_detection_tpu.models.detector import Detector

        cfg = _flagship_config()
        model = Detector(cfg)
        f, c, m = _sample_inputs(args.batch, args.height, args.width, 5)
        variables = model.init(jax.random.PRNGKey(0), f, c, m, train=False)
        if args.quantized:
            from range_view_3d_detection_tpu.models.quantized import (
                calibrate_scales,
                filter_scope,
                quantization,
            )

            qtree = filter_scope(
                calibrate_scales(model, variables, [(f, c, m)]),
                args.quantized,
            )
            vars_q = dict(variables)
            vars_q["quant"] = qtree
            variables = vars_q
            _apply = model.apply

            def _q_apply(v, a, b, d, **kw):
                with quantization("int8"):
                    return _apply(v, a, b, d, **kw)

            apply_fn = _q_apply
        else:
            apply_fn = model.apply
        if args.decode:
            # Default DecoderConfig == the shipped/benched operating point
            # (nms_cap 1024, conf/model/range_view.yaml).
            dec = DecoderConfig()
            fwd = jax.jit(
                lambda v, a, b, d: decode(
                    apply_fn(v, a, b, d, train=False),
                    dec,
                    cfg.tasks_dict,
                    use_nms=True,
                )
            )
        else:
            fwd = jax.jit(
                lambda v, a, b, d: apply_fn(v, a, b, d, train=False)
            )
        run_args = (f, c, m)
        if args.points:
            from range_view_3d_detection_tpu.data.dataset import (
                width_padding,
            )
            from range_view_3d_detection_tpu.ops.projection import (
                rasterize_points_jax,
            )

            sys.path.insert(0, str(Path(__file__).resolve().parent))
            from export import _sample_points

            sensor_w = 1800
            pad = width_padding(sensor_w, 1)

            def rasterize(x1, l1, i1):
                return rasterize_points_jax(
                    x1, l1, {"intensity": i1},
                    height=args.height, width=sensor_w,
                    feature_names=("intensity", "range", "x", "y", "z"),
                    pad=pad,
                )

            # Default DecoderConfig == the shipped/benched operating point
            # (nms_cap 1024, conf/model/range_view.yaml).
            dec = DecoderConfig()
            fwd = jax.jit(
                lambda v, x, l, i: decode(
                    apply_fn(
                        v, *jax.vmap(rasterize)(x, l, i), train=False
                    ),
                    dec,
                    cfg.tasks_dict,
                    use_nms=True,
                )
            )
            run_args = tuple(
                _sample_points(
                    args.batch, args.num_points, args.height, sensor_w
                )
            )
        out = fwd(variables, *run_args)
        float(jax.tree_util.tree_leaves(out)[0].sum())
        with jax.profiler.trace(args.out):
            out = fwd(variables, *run_args)
            float(jax.tree_util.tree_leaves(out)[0].sum())
    summarize(args.out)


if __name__ == "__main__":
    main()
