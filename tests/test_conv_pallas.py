"""Fused int8 conv kernel (kernels/conv_pallas.py) vs the XLA path.

The kernel must be bit-identical to ``Int8Conv``'s lax lowering: same
int8 operands, int32 accumulation, f32 dequant — only the s32
accumulator's residency changes (VMEM scratch vs HBM round trip).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from range_view_3d_detection_tpu.kernels.conv_pallas import conv3x3_i8_fused


def _lax_ref(x_i8, w_hwio_i8, dq, stride_w):
    acc = jax.lax.conv_general_dilated(
        x_i8,
        w_hwio_i8,
        window_strides=(1, stride_w),
        padding=((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * dq


@pytest.mark.parametrize(
    "shape,stride_w",
    [
        ((2, 8, 40, 32), 1),
        ((1, 5, 33, 16), 1),  # odd width, odd height
        ((2, 8, 40, 32), 2),
        ((1, 6, 18, 8), 2),
    ],
)
def test_conv3x3_i8_fused_matches_lax(shape, stride_w):
    rng = np.random.default_rng(0)
    B, H, W, Cin = shape
    Cout = 24
    x = rng.integers(-127, 128, size=shape, dtype=np.int8)
    w = rng.integers(-127, 128, size=(3, 3, Cin, Cout), dtype=np.int8)
    dq = rng.uniform(1e-3, 2e-2, size=(Cout,)).astype(np.float32)

    ref = _lax_ref(jnp.asarray(x), jnp.asarray(w), jnp.asarray(dq), stride_w)
    got = conv3x3_i8_fused(
        jnp.asarray(x),
        jnp.asarray(w).reshape(9, Cin, Cout),
        jnp.asarray(dq),
        stride_w=stride_w,
        out_dtype=jnp.float32,
        interpret=True,
    )
    assert got.shape == ref.shape
    # f32 out_dtype: the dequant product is computed identically -> exact.
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_int8conv_routes_through_kernel(monkeypatch):
    """Int8Conv with RV3D_CONV_PALLAS=1 equals the default path."""
    from range_view_3d_detection_tpu.models.quantized import Int8Conv

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(2, 6, 24, 16)).astype(np.float32))
    in_scale = jnp.float32(0.05)

    def build():
        return Int8Conv(
            features=16,
            kernel_size=(3, 3),
            strides=(1, 1),
            padding=((1, 1), (1, 1)),
            use_bias=False,
            kernel_init=jax.nn.initializers.lecun_normal(),
            bias_init=jax.nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
        )

    monkeypatch.delenv("RV3D_CONV_PALLAS", raising=False)
    mod = build()
    variables = mod.init(jax.random.PRNGKey(0), x, in_scale)
    ref = mod.apply(variables, x, in_scale)

    monkeypatch.setenv("RV3D_CONV_PALLAS", "1")
    got = build().apply(variables, x, in_scale)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=0, atol=0
    )


def test_gate_rejects_ineligible(monkeypatch):
    """Bias-carrying / wide / strided-height convs stay on the XLA path."""
    from range_view_3d_detection_tpu.models import quantized

    class Fake:
        kernel_size = (3, 3)
        strides = (1, 1)
        padding = ((1, 1), (1, 1))
        use_bias = False
        features = 64

    x = jnp.zeros((1, 4, 16, 64), jnp.int8)
    monkeypatch.setenv("RV3D_CONV_PALLAS", "1")
    assert quantized._use_conv_pallas(Fake(), x)

    f = Fake()
    f.use_bias = True
    assert not quantized._use_conv_pallas(f, x)
    f = Fake()
    f.strides = (2, 1)
    assert not quantized._use_conv_pallas(f, x)
    f = Fake()
    f.strides = (1, 2)
    assert quantized._use_conv_pallas(f, x)
    # odd width cannot split into even/odd column phases
    assert not quantized._use_conv_pallas(
        f, jnp.zeros((1, 4, 15, 64), jnp.int8)
    )
    f = Fake()
    f.features = 512
    assert not quantized._use_conv_pallas(f, x)
    monkeypatch.delenv("RV3D_CONV_PALLAS")
    assert not quantized._use_conv_pallas(Fake(), x)
