#!/usr/bin/env python
"""Hardware A/B: fused int8 conv kernel vs the XLA lowering, per shape.

Interleaves the two paths rep-by-rep (A B A B ...) so background tunnel
load biases both equally; reports per-shape median wall over the reps.
Each timed call chains CHAIN back-to-back convs and reduces the output
to a scalar on device, so the host readback (the tunnel tax) is
amortized and constant across paths (BENCH_NOTES timing discipline).

    python tools/conv_ab.py [--reps 5] [--chain 8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.kernels.conv_pallas import conv3x3_i8_fused

# (B, H, W, Cin, Cout, stride_w) — the flagship backbone's int8 3x3
# population (conf/model/range_view.yaml layers [64,64,128,256,256]).
# stride-2 is interpret-only (Mosaic rejects the even/odd-phase shape
# cast on hardware); the A/B covers the stride-1 population.
SHAPES = [
    (2, 64, 1808, 64, 64, 1),    # stage 1 + agg refine at s1
    (2, 64, 904, 64, 64, 1),     # stage 2
    (2, 64, 452, 128, 128, 1),   # stage 3 + agg refine at s4
    (2, 64, 226, 256, 256, 1),   # stage 4
    (2, 64, 113, 256, 256, 1),   # stage 5
]


def make_fns(B, H, W, Cin, Cout, sw):
    def lax_path(x_i8, w_hwio, dq):
        acc = jax.lax.conv_general_dilated(
            x_i8, w_hwio,
            window_strides=(1, sw),
            padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * dq

    def chain(step):
        def run(x_i8, w_hwio, w_blk, dq, n):
            y = jnp.float32(0.0)
            x = x_i8
            for _ in range(n):
                out = step(x, w_hwio, w_blk, dq)
                y = y + jnp.sum(out)
                # Re-quantize the output as the next input so the chain
                # has real data dependencies (no dead-code elimination).
                if sw == 1:
                    x = jnp.clip(jnp.round(out * 0.05), -127, 127).astype(
                        jnp.int8
                    )
                else:
                    x = x_i8  # strided shrinks width; restart
            return y
        return run

    lax_fn = chain(lambda x, wh, wb, dq: lax_path(x, wh, dq))
    ker_fn = chain(
        lambda x, wh, wb, dq: conv3x3_i8_fused(
            x, wb, dq, stride_w=sw, out_dtype=jnp.bfloat16
        ).astype(jnp.float32)
    )
    return lax_fn, ker_fn


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=5)
    ap.add_argument("--chain", type=int, default=8)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    print(f"devices: {jax.devices()}")
    for B, H, W, Cin, Cout, sw in SHAPES:
        if sw == 2 and Cin != Cout:
            continue
        x = jnp.asarray(
            rng.integers(-127, 128, size=(B, H, W, Cin), dtype=np.int8)
        )
        w = rng.integers(-127, 128, size=(3, 3, Cin, Cout), dtype=np.int8)
        w_hwio = jnp.asarray(w)
        w_blk = jnp.asarray(w.reshape(9, Cin, Cout))
        dq = jnp.asarray(
            rng.uniform(1e-3, 2e-2, size=(Cout,)).astype(np.float32)
        )

        lax_fn, ker_fn = make_fns(B, H, W, Cin, Cout, sw)
        n = 1 if sw == 2 else args.chain
        jl = jax.jit(lambda a, b, c, d: lax_fn(a, b, c, d, n))
        jk = jax.jit(lambda a, b, c, d: ker_fn(a, b, c, d, n))

        # Correctness on hardware (single conv, f32-compared).
        ra = np.asarray(jl(x, w_hwio, w_blk, dq)) if n else None
        rb = np.asarray(jk(x, w_hwio, w_blk, dq))
        rel = abs(float(ra) - float(rb)) / max(1.0, abs(float(ra)))
        # bf16 out rounding in the kernel path -> small tolerance.
        ok = rel < 2e-2

        ta, tb = [], []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            np.asarray(jl(x, w_hwio, w_blk, dq))
            ta.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(jk(x, w_hwio, w_blk, dq))
            tb.append(time.perf_counter() - t0)
        ma, mb = np.median(ta) * 1e3, np.median(tb) * 1e3
        per = args.chain if sw == 1 else 1
        print(
            f"({B},{H},{W},{Cin})->{Cout} sw={sw}: "
            f"lax {ma/per:7.3f} ms/conv  kernel {mb/per:7.3f} ms/conv  "
            f"ratio {ma/mb:5.2f}x  sum_rel {rel:.1e} {'OK' if ok else 'MISMATCH'}",
            flush=True,
        )


if __name__ == "__main__":
    main()
