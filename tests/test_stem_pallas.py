"""Fused Pallas stem kernel equivalence (interpret mode on CPU).

The kernel (``kernels/stem_pallas.py``) must match the flax accumulate
eval path bit-for-bit in f32 (both are the reference MetaKernel
semantics, ``stems/__init__.py:64-85``). On the real chip it runs at
94% MXU peak (1.46 ms/frame vs ~4-6 ms of separate XLA ops;
BENCH_NOTES "Round-2" section).
"""

import dataclasses

import jax
import numpy as np
import pytest

from range_view_3d_detection_tpu.kernels.stem_pallas import meta_kernel_fused
from range_view_3d_detection_tpu.models.detector import Detector


def test_kernel_matches_reference_math():
    """Direct oracle: loop-based numpy evaluation of the stem formula."""
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 6, 16, 8
    g = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w1 = (rng.normal(size=(C, C)) * 0.2).astype(np.float32)
    k = (rng.normal(size=(9, C, C)) * 0.2).astype(np.float32)
    a0 = rng.uniform(0.5, 1.5, C).astype(np.float32)
    b0 = rng.normal(size=C).astype(np.float32)
    a1 = rng.uniform(0.5, 1.5, C).astype(np.float32)
    b1 = rng.normal(size=C).astype(np.float32)

    got = np.asarray(
        meta_kernel_fused(
            g, f, w1, k, a0, b0, a1, b1, interpret=True
        )
    )

    def view(x, dy, dx):
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return xp[:, dy : dy + H, dx : dx + W]

    want = np.zeros((B, H, W, C), np.float32)
    idx = 0
    for dy in range(3):
        for dx in range(3):
            x0 = view(g, dy, dx) - g
            h = np.maximum(x0 * a0 + b0, 0.0)
            p = np.maximum(h @ w1 * a1 + b1, 0.0)
            want += (p * view(f, dy, dx)) @ k[idx]
            idx += 1
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_detector_pallas_stem_equals_accumulate():
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_batch, tiny_config

    cfg = tiny_config(stem_type="META")
    b = tiny_batch(B=2)
    m = Detector(cfg)
    v = m.init(
        jax.random.PRNGKey(0),
        b["features"],
        b["cart"],
        b["mask"],
        train=True,
    )
    out_acc = m.apply(v, b["features"], b["cart"], b["mask"], train=False)
    mp = Detector(dataclasses.replace(cfg, stem_pallas=True))
    out_pal = mp.apply(v, b["features"], b["cart"], b["mask"], train=False)
    for key in ("logits", "regressands"):
        np.testing.assert_allclose(
            np.asarray(out_acc["head"][1][0][key]),
            np.asarray(out_pal["head"][1][0][key]),
            atol=1e-5,
            rtol=1e-5,
        )


def test_i8_kernel_matches_quantized_oracle():
    """int8 fused stem vs a numpy oracle of the identical quantized
    math (symmetric per-tensor activations, per-output-channel int8
    weights, int32 accumulation — the Int8Conv contract with the
    activation scales folded into the BN affines)."""
    from range_view_3d_detection_tpu.kernels.stem_pallas import (
        meta_kernel_fused_i8,
    )

    rng = np.random.default_rng(3)
    B, H, W, C = 1, 5, 16, 8
    g = rng.normal(size=(B, H, W, C)).astype(np.float32)
    f = rng.normal(size=(B, H, W, C)).astype(np.float32)
    w1_i8 = rng.integers(-127, 128, size=(C, C)).astype(np.int8)
    k_i8 = rng.integers(-127, 128, size=(9, C, C)).astype(np.int8)
    a0 = rng.uniform(0.5, 1.5, C).astype(np.float32)
    b0 = rng.normal(size=C).astype(np.float32)
    a1 = (rng.uniform(0.5, 1.5, C) * 1e-2).astype(np.float32)
    b1 = rng.normal(size=C).astype(np.float32)
    kdq = (rng.uniform(0.5, 1.5, (9, C)) * 1e-3).astype(np.float32)

    got = np.asarray(
        meta_kernel_fused_i8(
            g, f, w1_i8, k_i8, a0, b0, a1, b1, kdq, interpret=True
        )
    )

    def view(x, dy, dx):
        xp = np.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        return xp[:, dy : dy + H, dx : dx + W]

    want = np.zeros((B, H, W, C), np.float32)
    idx = 0
    for dy in range(3):
        for dx in range(3):
            x0 = view(g, dy, dx) - g
            hq = np.minimum(
                np.round(np.maximum(x0 * a0 + b0, 0.0)), 127.0
            ).astype(np.int32)
            z = hq @ w1_i8.astype(np.int32)
            p = np.maximum(z.astype(np.float32) * a1 + b1, 0.0)
            pq = np.clip(
                np.round(p * view(f, dy, dx)), -127.0, 127.0
            ).astype(np.int32)
            want += (pq @ k_i8[idx].astype(np.int32)).astype(
                np.float32
            ) * kdq[idx]
            idx += 1
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_detector_int8_stem_close_to_fp(monkeypatch):
    """Calibration sows the stem activation scales (accumulate path),
    and the int8 fused stem + int8 conv blocks track the fp forward
    within the same relative-error gate as the full-network PTQ test.
    The int8 stem is opt-in at serving (RV3D_STEM_INT8=1 — it measured
    slower than the bf16 kernel on v5e, BENCH_NOTES r4); forced on here
    to keep its numerics covered."""
    import sys

    sys.path.insert(0, "tests")
    from test_model import tiny_batch, tiny_config

    from range_view_3d_detection_tpu.models import stems
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_scales,
        quantization,
    )

    monkeypatch.setenv("RV3D_STEM_INT8", "1")

    cfg = dataclasses.replace(
        tiny_config(stem_type="META"), stem_pallas=True
    )
    b = tiny_batch(B=2)
    m = Detector(cfg)
    v = m.init(
        jax.random.PRNGKey(0),
        b["features"],
        b["cart"],
        b["mask"],
        train=False,
    )
    qtree = calibrate_scales(
        m, v, [(b["features"], b["cart"], b["mask"])]
    )
    flat = jax.tree_util.tree_leaves_with_path(qtree)
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert any("stem_hh_scale" in p for p in paths), paths
    assert any("stem_pf_scale" in p for p in paths), paths

    want = m.apply(v, b["features"], b["cart"], b["mask"], train=False)
    with quantization("int8"):
        got = m.apply(
            {**v, "quant": qtree},
            b["features"],
            b["cart"],
            b["mask"],
            train=False,
        )
    assert stems.LAST_STEM_PATH == "pallas_int8"
    for key in ("logits", "regressands"):
        a = np.asarray(got["head"][1][0][key])
        w = np.asarray(want["head"][1][0][key])
        rms = np.sqrt(np.mean((a - w) ** 2))
        ref = np.sqrt(np.mean(w**2)) + 1e-9
        assert rms / ref < 0.10, (key, rms, ref)
