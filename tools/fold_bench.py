"""Tail-attack microbench: width-folding a narrow backbone stage into batch.

VERDICT r4 next #3 hypothesis: the W/16 (and W/8) backbone stages underfill
the MXU because their width is small; folding width into the batch axis
might tile better. This tool measures that hypothesis in isolation and
exactly: the folded run chunks width WITH the stage's full receptive-field
halo (2 columns per 3x3 conv -> r = 2*num_blocks), runs the SAME
ResidualBlock weights on the (B*f, H, W/f + 2r, C) folded tensor, crops the
halos, and asserts the stitched output allclose to the unfolded one before
timing. Reference stage geometry: models/backbone.py:66-75 (flagship
64x1808 -> res3 at W/16=113xC512x5 blocks, res3a at W/8=226xC256x5).

Usage (real chip):
    python tools/fold_bench.py --stage res3 --folds 1 2 4 [--int8]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import os

if os.environ.get("JAX_PLATFORMS"):
    # The image's sitecustomize pins jax_platforms in-process; honor an
    # explicit env override (JAX_PLATFORMS=cpu for smoke runs).
    import jax as _jax

    _jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax
import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.models.blocks import ResidualBlock
from range_view_3d_detection_tpu.models import quantized

STAGES = {
    # name: (H, W, C_in, C_out, num_blocks) at flagship batch 2
    "res3": (64, 113, 256, 512, 5),
    "res3a": (64, 226, 128, 256, 5),
    "res2": (64, 452, 64, 128, 3),
}


def _quant_tree(mod, variables, x):
    with quantized.quantization("calib"):
        _, state = mod.apply(
            variables, x, False, mutable=["quant_stats"]
        )
    stats = jax.device_get(state["quant_stats"])

    def to_scales(node):
        out = {}
        for k, v in node.items():
            if isinstance(v, dict):
                out[k] = to_scales(v)
            elif k.endswith("_absmax"):
                m = float(np.asarray(v))
                out[k[: -len("_absmax")] + "_scale"] = np.asarray(
                    m / 127.0 if m > 0 else 1.0, np.float32
                )
        return out

    return to_scales(stats)


def _fold(x: jnp.ndarray, f: int, r: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B*f, H, ceil(W/f) + 2r, C) overlapping chunks, zero
    edge halos (matches the convs' zero padding). W not divisible by f is
    right-padded with zeros; those fake columns' outputs are cropped by
    ``_unfold`` — the true right edge still sees the zero halo the unfolded
    conv pads with, so interior outputs are exact."""
    b, h, w, c = x.shape
    wc = -(-w // f)  # ceil
    xp = jnp.pad(x, ((0, 0), (0, 0), (r, r + wc * f - w), (0, 0)))
    chunks = [
        xp[:, :, i * wc : i * wc + wc + 2 * r, :] for i in range(f)
    ]
    return jnp.concatenate(chunks, axis=0)


def _unfold(y: jnp.ndarray, f: int, r: int, w: int) -> jnp.ndarray:
    b_f, h, wc2, c = y.shape
    b = b_f // f
    core = y[:, :, r : wc2 - r, :]
    return jnp.concatenate(
        [core[i * b : (i + 1) * b] for i in range(f)], axis=2
    )[:, :, :w, :]


def _time(fn, x, iters):
    fn(x).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(x)
    out.block_until_ready()
    return (time.perf_counter() - t0) / iters * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stage", default="res3", choices=sorted(STAGES))
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--folds", type=int, nargs="+", default=[1, 2, 4])
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    h, w, cin, cout, nb = STAGES[args.stage]
    r = 2 * nb  # receptive radius: two 3x3 convs per BasicBlock
    dtype = jnp.bfloat16
    mod = ResidualBlock(
        cout, num_blocks=nb, strides=(1, 1), dtype=dtype,
        param_dtype=jnp.float32,
    )
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.normal(size=(args.batch, h, w, cin)), dtype
    )
    variables = mod.init(jax.random.PRNGKey(0), x, False)
    if args.int8:
        variables = {**variables, "quant": _quant_tree(mod, variables, x)}

    def run(xin):
        if args.int8:
            with quantized.quantization("int8"):
                return mod.apply(variables, xin, False)
        return mod.apply(variables, xin, False)

    base = jax.jit(run)
    ref = np.asarray(base(x), np.float32)
    print(
        f"stage={args.stage} {args.batch}x{h}x{w} {cin}->{cout} "
        f"blocks={nb} halo r={r} int8={args.int8}"
    )
    for f in args.folds:
        if f == 1:
            ms = _time(base, x, args.iters)
            print(f"  fold 1 (baseline): {ms:7.3f} ms")
            continue
        @jax.jit
        def folded(xin, f=f):
            return _unfold(run(_fold(xin, f, r)), f, r, w)

        got = np.asarray(folded(x), np.float32)
        # Interior + chunk-boundary columns are exact (true-value halos).
        # The outermost r columns differ by construction: the unfolded
        # stage zero-pads at EVERY conv, while the folded edge halo is
        # zero only at the input (conv(0) = bias != 0 propagates). A
        # production integration would mask per conv; for the timing
        # question this is irrelevant.
        interior = slice(r, w - r)
        err = np.abs(got[:, :, interior] - ref[:, :, interior]).max()
        edge = np.abs(got - ref).max()
        assert err < 0.05, f"fold {f} interior mismatch: {err}"
        ms = _time(folded, x, args.iters)
        waste = (-(-w // f) + 2 * r) * f / w - 1
        print(
            f"  fold {f}: {ms:7.3f} ms  (+{waste:.0%} halo compute, "
            f"interior max|err| {err:.3g}, outer-edge {edge:.3g})"
        )


if __name__ == "__main__":
    main()
