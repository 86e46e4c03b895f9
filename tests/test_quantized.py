"""int8 PTQ head tests: exactness on grid-aligned inputs, closeness on
random inputs, and artifact roundtrip through the quantized serving path.

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


def test_quantized_tower_exact_on_grid_inputs():
    """With weights already on the int8 grid and inputs already on the
    activation-scale grid, quantization introduces ZERO rounding error:
    the int8 tower must match an fp tower bit-for-bit (up to fp32
    accumulation order)."""
    from range_view_3d_detection_tpu.models.quantized import (
        quantized_tower_apply,
    )

    rng = np.random.default_rng(0)
    cin, cout = 8, 8
    s_in = 0.25
    w_int = rng.integers(-50, 50, size=(3, 3, cin, cout))
    w_scale = np.full((cout,), 0.5, np.float32)
    feats = (rng.integers(-100, 100, size=(1, 4, 8, cin)) * s_in).astype(
        np.float32
    )
    bn_scale = rng.normal(size=cout).astype(np.float32) * 0.1 + 1.0
    bn_bias = rng.normal(size=cout).astype(np.float32) * 0.1
    final_k = rng.normal(size=(1, 1, cout, 2)).astype(np.float32) * 0.1
    final_b = np.zeros(2, np.float32)

    qtower = {
        "blocks": [
            {
                "kernel_i8": w_int.astype(np.int8),
                "mult": (s_in * w_scale * bn_scale).astype(np.float32),
                "bias": bn_bias,
            }
        ],
        "final": {"kernel": final_k, "bias": final_b},
        "scales": [s_in],
    }
    got = np.asarray(quantized_tower_apply(qtower, jnp.asarray(feats)))

    # fp reference with the SAME torch-style padding
    w_fp = w_int.astype(np.float32) * w_scale
    dn = jax.lax.conv_dimension_numbers(
        feats.shape, w_fp.shape, ("NHWC", "HWIO", "NHWC")
    )
    y = jax.lax.conv_general_dilated(
        jnp.asarray(feats), jnp.asarray(w_fp), (1, 1),
        ((1, 1), (1, 1)), dimension_numbers=dn,
    )
    y = jax.nn.relu(y * bn_scale + bn_bias)
    want = np.asarray(
        jax.lax.conv_general_dilated(
            y.astype(jnp.bfloat16),
            jnp.asarray(final_k, jnp.bfloat16),
            (1, 1),
            ((0, 0), (0, 0)),
            dimension_numbers=jax.lax.conv_dimension_numbers(
                y.shape, final_k.shape, ("NHWC", "HWIO", "NHWC")
            ),
        ).astype(jnp.float32)
        + final_b
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_quantized_head_close_to_fp():
    """PTQ int8 towers track the fp head within a small relative error on
    random inputs (per-channel weights + calibrated activation scales)."""
    from range_view_3d_detection_tpu.models.quantized import (
        calibrate_head_scales,
        make_quantized_forward,
        quantize_head,
    )

    cfg, model, folded = _folded_model()
    batches = [_inputs(seed=s) for s in range(2)]
    scales = calibrate_head_scales(model, folded, batches)
    assert set(scales) == {"cls_s1_t0", "reg_s1_t0"}
    # num_blocks=1 => one quantized block per tower => one scale each
    assert all(len(v) == 1 for v in scales.values())

    qhead = quantize_head(folded["params"], scales)
    forward = make_quantized_forward(folded, qhead, cfg)

    f, c, m = _inputs(seed=9)
    got = forward(f, c, m)
    want = model.apply(folded, f, c, m, train=False)

    for key in ("logits", "regressands"):
        a = np.asarray(got["head"][1][0][key])
        b = np.asarray(want["head"][1][0][key])
        rms = np.sqrt(np.mean((a - b) ** 2))
        ref = np.sqrt(np.mean(b**2)) + 1e-9
        assert rms / ref < 0.05, (key, rms, ref)
    # strided views are shared code — identical
    np.testing.assert_array_equal(
        np.asarray(got["strided"][1]["mask"]),
        np.asarray(want["strided"][1]["mask"]),
    )


def test_quantized_artifact_roundtrip(tmp_path):
    """--quantize export ships qhead.msgpack; loading takes the int8 path
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
    assert (art / "qhead.msgpack").exists()

    predict_q, _, _ = load_artifact(art)  # auto -> int8
    predict_fp, _, _ = load_artifact(art, quantized=False)
    f, c, m = _inputs(seed=4)
    q = predict_q(f, c, m)
    fp = predict_fp(f, c, m)

    sq, sf = np.asarray(q.scores), np.asarray(fp.scores)
    # scores are sigmoid outputs in [0, 1]; PTQ shifts them only slightly
    assert np.max(np.abs(sq - sf)) < 0.05
    # the kept set and box geometry agree on confident detections
    kq, kf = np.asarray(q.keep), np.asarray(fp.keep)
    agree = (kq == kf).mean()
    assert agree > 0.95, agree
    both = kq & kf
    if both.any():
        np.testing.assert_allclose(
            np.asarray(q.cuboids)[both],
            np.asarray(fp.cuboids)[both],
            atol=0.3,
        )
