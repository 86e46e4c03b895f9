"""Phase (subpixel) decomposition of TorchConvTranspose.

The aggregation nodes' transposed convs (kernel ``2*s``, stride ``s``,
padding ``s//2`` — ``models/backbone.py:77-92``, parity with the
reference's ``blocks/__init__.py:150-158``) can lower to the exact phase
decomposition (``models/blocks.py::_phase_merged_kernel``,
``RV3D_DECONV_PHASE=1``; off by default after the hardware A/B read it
~10% slower than XLA's own ``lhs_dilation`` lowering on the int8 serving
point — BENCH_NOTES round 5). These tests pin the decomposition to the
dilated lowering bit-for-bit in value intent: fp forward, int8 forward,
and gradients.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from range_view_3d_detection_tpu.models.blocks import TorchConvTranspose
from range_view_3d_detection_tpu.models import quantized

# Both aggregation node shapes (backbone.py:77-92): (kernel, stride, pad).
NODE_SHAPES = [
    ((3, 8), (1, 4), (1, 2)),
    ((3, 4), (1, 2), (1, 1)),
]


def _mk(kernel, stride, pad, cin=6, cout=5):
    return TorchConvTranspose(
        features=cout, kernel_size=kernel, strides=stride, padding=pad
    )


def _both_paths(fn):
    """Run ``fn()`` with the phase path on and off."""
    out = {}
    for flag in ("1", "0"):
        os.environ["RV3D_DECONV_PHASE"] = flag
        try:
            out[flag] = fn()
        finally:
            os.environ.pop("RV3D_DECONV_PHASE", None)
    return out["1"], out["0"]


@pytest.mark.parametrize("kernel,stride,pad", NODE_SHAPES)
def test_phase_matches_dilated_fp(kernel, stride, pad):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 12, 6)), jnp.float32)
    mod = _mk(kernel, stride, pad)
    params = mod.init(jax.random.PRNGKey(0), x)

    phase, dilated = _both_paths(lambda: mod.apply(params, x))
    assert phase.shape == dilated.shape
    assert phase.shape[2] == x.shape[2] * stride[1]
    np.testing.assert_allclose(
        np.asarray(phase), np.asarray(dilated), rtol=1e-5, atol=1e-5
    )


@pytest.mark.parametrize("kernel,stride,pad", NODE_SHAPES)
def test_phase_matches_dilated_int8(kernel, stride, pad):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(1, 4, 10, 6)), jnp.float32)
    mod = _mk(kernel, stride, pad)
    params = mod.init(jax.random.PRNGKey(1), x)
    variables = {
        **params,
        "quant": {"in_scale": jnp.asarray(0.05, jnp.float32)},
    }

    def run():
        with quantized.quantization("int8"):
            return mod.apply(variables, x)

    phase, dilated = _both_paths(run)
    # Same int8 operands, same int32 accumulation — only summation order
    # differs; the dequantized outputs must agree to fp32 roundoff.
    np.testing.assert_allclose(
        np.asarray(phase), np.asarray(dilated), rtol=1e-5, atol=1e-6
    )


def test_phase_matches_dilated_grads():
    kernel, stride, pad = NODE_SHAPES[0]
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(1, 4, 9, 6)), jnp.float32)
    mod = _mk(kernel, stride, pad)
    params = mod.init(jax.random.PRNGKey(2), x)

    def loss(p, xin):
        y = mod.apply(p, xin)
        return jnp.sum(y * jnp.cos(jnp.arange(y.size).reshape(y.shape)))

    def grads():
        return jax.grad(loss, argnums=(0, 1))(params, x)

    (gp1, gx1), (gp0, gx0) = _both_paths(grads)
    np.testing.assert_allclose(
        np.asarray(gx1), np.asarray(gx0), rtol=1e-4, atol=1e-5
    )
    k1 = np.asarray(jax.tree_util.tree_leaves(gp1)[0])
    k0 = np.asarray(jax.tree_util.tree_leaves(gp0)[0])
    np.testing.assert_allclose(k1, k0, rtol=1e-4, atol=1e-5)


def test_ineligible_shape_uses_dilated_path():
    # kernel width != 2 * stride -> phase path must not engage; both flag
    # settings take the dilated branch and agree exactly.
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(1, 4, 7, 3)), jnp.float32)
    mod = TorchConvTranspose(
        features=4, kernel_size=(3, 6), strides=(1, 4), padding=(1, 2)
    )
    params = mod.init(jax.random.PRNGKey(3), x)
    phase, dilated = _both_paths(lambda: mod.apply(params, x))
    np.testing.assert_array_equal(np.asarray(phase), np.asarray(dilated))
