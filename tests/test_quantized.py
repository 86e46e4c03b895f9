"""int8 PTQ serving tests: Int8Conv exactness on grid-aligned inputs,
full-network closeness to the fp path, scope filtering, and artifact
roundtrip through the quantized serving path.

The quantized path is serving-only, beyond reference capability (the
reference serves fp16 CUDA — ``tools/benchmark.py:60-63``); these tests
certify it against this repo's own fp path.
"""

import sys
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from test_export import _inputs, _small_cfg  # noqa: E402


def _folded_model(seed=0):
    from export import fold_batch_norms

    from range_view_3d_detection_tpu.models.detector import Detector

    cfg = _small_cfg()
    model = Detector(cfg)
    f, c, m = _inputs(seed=seed)
    variables = model.init(jax.random.PRNGKey(7), f, c, m, train=False)
    return cfg, model, fold_batch_norms(jax.device_get(variables))


def test_int8_conv_exact_on_grid_inputs():
    """With weights already on the int8 grid and inputs already on the
    activation-scale grid, quantization introduces ZERO rounding error:
    Int8Conv must match the fp convolution bit-for-bit (int32
    accumulation is exact for these magnitudes)."""
    import flax.linen as nn

    from range_view_3d_detection_tpu.models.quantized import Int8Conv

    rng = np.random.default_rng(0)
    cin, cout = 8, 8
    s_in = 0.25
    # Integer weights with per-cout absmax pinned to exactly 127: the
    # per-cout scale becomes absmax/127 = s_w, and w / w_scale rounds
    # back to the integers exactly.
    w_int = rng.integers(-127, 128, size=(3, 3, cin, cout)).astype(
        np.float32
    )
    w_int[0, 0, 0, :] = 127.0
    s_w = 0.01
    w = (w_int * s_w).astype(np.float32)
    x = (rng.integers(-100, 100, size=(1, 4, 8, cin)) * s_in).astype(
        np.float32
    )

    conv = Int8Conv(
        features=cout,
        kernel_size=(3, 3),
        strides=(1, 1),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    got = np.asarray(
        conv.apply({"params": {"kernel": w}}, jnp.asarray(x), jnp.float32(s_in))
    )

    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    want = np.asarray(
        jax.lax.conv_general_dilated(
            jnp.asarray(x), jnp.asarray(w), (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=dn,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_calibrate_and_full_int8_close_to_fp():
    """Calibrated full-network int8 tracks the fp forward within a small
    relative error on random inputs, and the calib sow covers every
    BN-bearing conv block (backbone + stem fusion + head towers)."""
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_scales,
        quantization,
    )

    cfg, model, folded = _folded_model()
    batches = [_inputs(seed=s) for s in range(2)]
    qtree = calibrate_scales(model, folded, batches)

    # Scales exist for the head towers AND the backbone.
    flat = jax.tree_util.tree_leaves_with_path(qtree)
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert any("DetectionHead" in p for p in paths)
    assert any("RangeNet" in p for p in paths)
    # aggregation upsample deconvs are quantized too
    assert any("TorchConvTranspose" in p for p in paths)
    assert all(np.asarray(v) > 0 for _, v in flat)

    f, c, m = _inputs(seed=9)
    want = model.apply(folded, f, c, m, train=False)
    with quantization("int8"):
        got = model.apply({**folded, "quant": qtree}, f, c, m, train=False)

    for key in ("logits", "regressands"):
        a = np.asarray(got["head"][1][0][key])
        b = np.asarray(want["head"][1][0][key])
        rms = np.sqrt(np.mean((a - b) ** 2))
        ref = np.sqrt(np.mean(b**2)) + 1e-9
        assert rms / ref < 0.10, (key, rms, ref)
    np.testing.assert_array_equal(
        np.asarray(got["strided"][1]["mask"]),
        np.asarray(want["strided"][1]["mask"]),
    )


def test_scope_filter_heads_only():
    """filter_scope("heads") drops every backbone scale; the int8 apply
    then quantizes only the towers (backbone output must be bitwise
    identical to fp, so logits differ from fp only through the tower)."""
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_scales,
        filter_scope,
        quantization,
    )

    cfg, model, folded = _folded_model()
    qtree = calibrate_scales(model, folded, [_inputs(seed=0)])
    heads_only = filter_scope(qtree, "heads")

    flat = jax.tree_util.tree_leaves_with_path(heads_only)
    paths = ["/".join(str(p) for p in kp) for kp, _ in flat]
    assert paths and all("DetectionHead" in p for p in paths)

    f, c, m = _inputs(seed=3)
    want = model.apply(folded, f, c, m, train=False)
    with quantization("int8"):
        got = model.apply(
            {**folded, "quant": heads_only}, f, c, m, train=False
        )
    for key in ("logits", "regressands"):
        a = np.asarray(got["head"][1][0][key])
        b = np.asarray(want["head"][1][0][key])
        rms = np.sqrt(np.mean((a - b) ** 2))
        ref = np.sqrt(np.mean(b**2)) + 1e-9
        assert rms / ref < 0.05, (key, rms, ref)


def test_fake_quant_ste():
    """fake_quant's forward is the int8 reconstruction grid; its gradient
    is identity (straight-through estimator)."""
    from range_view_3d_detection_tpu.models.quantized import fake_quant

    x = jnp.asarray([0.03, -0.549, 2.0, -200.0])
    s = jnp.float32(0.1)
    got = np.asarray(fake_quant(x, s))
    want = np.clip(np.round(np.asarray(x) / 0.1), -127, 127) * 0.1
    np.testing.assert_allclose(got, want, rtol=1e-6)
    g = jax.grad(lambda v: fake_quant(v, s).sum())(x)
    np.testing.assert_allclose(np.asarray(g), 1.0)


def test_qat_conv_matches_int8_conv():
    """Module-level contract: on the SAME input + scales, QATConv's fp
    STE reconstruction equals Int8Conv's int32-accumulate + dequant to
    fp32 accumulation noise. (End-to-end the two forwards drift apart
    by CASCADED requantization-boundary flips — an ε difference entering
    a downstream conv can round to a different int8 step — which the
    e2e test below bounds separately.)"""
    import flax.linen as nn

    from range_view_3d_detection_tpu.models.quantized import (
        Int8Conv,
        QATConv,
    )

    rng = np.random.default_rng(3)
    cin, cout = 16, 16
    w = rng.normal(size=(3, 3, cin, cout)).astype(np.float32) * 0.2
    x = rng.normal(size=(1, 8, 16, cin)).astype(np.float32) * 2.0
    s_in = jnp.float32(np.abs(x).max() / 127.0)
    kw = dict(
        features=cout,
        kernel_size=(3, 3),
        strides=(1, 1),
        padding=((1, 1), (1, 1)),
        use_bias=False,
        kernel_init=nn.initializers.zeros,
        bias_init=nn.initializers.zeros,
        dtype=jnp.float32,
        param_dtype=jnp.float32,
    )
    vars_ = {"params": {"kernel": w}}
    got_i8 = np.asarray(Int8Conv(**kw).apply(vars_, jnp.asarray(x), s_in))
    got_qat = np.asarray(QATConv(**kw).apply(vars_, jnp.asarray(x), s_in))
    np.testing.assert_allclose(got_qat, got_i8, rtol=1e-5, atol=1e-5)


def test_qat_forward_tracks_int8_serving():
    """End-to-end, the "qat" eval forward must track the int8 serving
    forward MORE closely than the fp forward does (it models the same
    quantized math; the residual is cascaded boundary flips — measured
    ~3% rel RMS on this random-init net vs ~7% for fp-vs-int8), and stay
    within the int8-vs-fp certification bound."""
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_scales,
        quantization,
    )

    cfg, model, folded = _folded_model()
    qtree = calibrate_scales(model, folded, [_inputs(seed=s) for s in range(2)])
    f, c, m = _inputs(seed=5)
    got_fp = model.apply(folded, f, c, m, train=False)
    with quantization("int8"):
        got_i8 = model.apply({**folded, "quant": qtree}, f, c, m, train=False)
    with quantization("qat"):
        got_qat = model.apply({**folded, "quant": qtree}, f, c, m, train=False)
    for key in ("logits", "regressands"):
        b = np.asarray(got_i8["head"][1][0][key])
        a = np.asarray(got_qat["head"][1][0][key])
        fp = np.asarray(got_fp["head"][1][0][key])
        rms_qat = np.sqrt(np.mean((a - b) ** 2))
        rms_fp = np.sqrt(np.mean((fp - b) ** 2))
        ref = np.sqrt(np.mean(b**2)) + 1e-9
        assert rms_qat / ref < 0.10, (key, rms_qat, ref)
        assert rms_qat < rms_fp * 0.8, (key, rms_qat, rms_fp)


def test_qat_train_step_overfits():
    """make_train_step(quant_tree=...) runs the STE fake-quant forward:
    loss must still decrease under QAT (gradients flow through the
    rounding), proving the fine-tune path trains."""
    from test_model import tiny_batch, tiny_config

    from range_view_3d_detection_tpu.models.detector import Detector
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_scales,
    )
    from range_view_3d_detection_tpu.training import (
        optim,
        state as state_lib,
    )

    cfg = tiny_config()
    batch = tiny_batch()
    tx, _ = optim.make_optimizer(1e-3, 100, debug=True)
    st = state_lib.create_state(jax.random.PRNGKey(0), cfg, tx, batch)
    model = Detector(cfg)
    qtree = calibrate_scales(
        model,
        {"params": st.params, "batch_stats": st.batch_stats},
        [(batch["features"], batch["cart"], batch["mask"])],
    )
    step = state_lib.make_train_step(cfg, tx, quant_tree=qtree)
    st1, m0 = step(jax.tree_util.tree_map(jnp.copy, st), batch)
    losses = [float(m0["loss"])]
    for _ in range(40):
        st1, m = step(st1, batch)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all(), losses[::10]
    assert losses[-1] < losses[0] * 0.6, losses[::10]


def test_quantized_artifact_roundtrip(tmp_path):
    """--quantize export ships quant.msgpack; loading takes the int8 path
    by default and its decoded detections track the fp path."""
    from export import export_artifact, load_artifact

    from range_view_3d_detection_tpu.models.decoder import DecoderConfig

    cfg, model, _ = _folded_model()
    f0, c0, m0 = _inputs(seed=0)
    variables = model.init(jax.random.PRNGKey(3), f0, c0, m0, train=False)
    art = tmp_path / "art"
    export_artifact(
        variables,
        cfg,
        DecoderConfig(nms_cap=64, num_post_nms=16),
        art,
        quantize_batches=[_inputs(seed=s) for s in range(2)],
    )
    assert (art / "quant.msgpack").exists()

    predict_q, _, _ = load_artifact(art)  # auto -> int8
    predict_fp, _, _ = load_artifact(art, quantized=False)
    f, c, m = _inputs(seed=4)
    q = predict_q(f, c, m)
    fp = predict_fp(f, c, m)

    sq, sf = np.asarray(q.scores), np.asarray(fp.scores)
    # scores are sigmoid outputs in [0, 1]; PTQ shifts them only slightly
    assert np.max(np.abs(sq - sf)) < 0.08
    # the kept set and box geometry agree on confident detections
    kq, kf = np.asarray(q.keep), np.asarray(fp.keep)
    agree = (kq == kf).mean()
    assert agree > 0.9, agree
    both = kq & kf
    if both.any():
        np.testing.assert_allclose(
            np.asarray(q.cuboids)[both],
            np.asarray(fp.cuboids)[both],
            atol=0.5,
        )
