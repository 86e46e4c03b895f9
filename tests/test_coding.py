"""Box coding round-trip tests (reference: math/ops/coding.py semantics)."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops import coding


def _random_boxes_and_points(n, seed=0):
    rng = np.random.default_rng(seed)
    cart = rng.uniform(-60, 60, size=(n, 3)).astype(np.float32)
    cart[:, 2] = rng.uniform(-3, 3, n)
    boxes = np.stack(
        [
            cart[:, 0] + rng.uniform(-2, 2, n),
            cart[:, 1] + rng.uniform(-2, 2, n),
            cart[:, 2] + rng.uniform(-1, 1, n),
            rng.uniform(0.5, 10, n),
            rng.uniform(0.5, 4, n),
            rng.uniform(0.5, 3, n),
            rng.uniform(-np.pi, np.pi, n),
        ],
        axis=-1,
    ).astype(np.float32)
    return boxes, cart


def test_roundtrip_azimuth_invariant():
    boxes, cart = _random_boxes_and_points(512)
    enc = coding.encode_boxes(jnp.asarray(boxes), jnp.asarray(cart))
    dec = np.asarray(coding.decode_boxes(enc, jnp.asarray(cart)))
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=2e-3)
    dyaw = np.arctan2(
        np.sin(dec[:, 6] - boxes[:, 6]), np.cos(dec[:, 6] - boxes[:, 6])
    )
    np.testing.assert_allclose(dyaw, 0.0, atol=2e-3)


def test_roundtrip_plain():
    boxes, cart = _random_boxes_and_points(256, seed=3)
    enc = coding.encode_boxes(
        jnp.asarray(boxes), jnp.asarray(cart), azimuth_invariant=False
    )
    dec = np.asarray(
        coding.decode_boxes(enc, jnp.asarray(cart), azimuth_invariant=False)
    )
    np.testing.assert_allclose(dec[:, :6], boxes[:, :6], atol=2e-3)


def test_azimuth_invariance_property():
    """Rotating the scene about +z must leave azimuth-invariant encodings unchanged."""
    boxes, cart = _random_boxes_and_points(128, seed=7)
    theta = 0.9
    c, s = np.cos(theta), np.sin(theta)
    rot = np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)

    cart_r = cart @ rot.T
    boxes_r = boxes.copy()
    boxes_r[:, :3] = boxes[:, :3] @ rot.T
    boxes_r[:, 6] = boxes[:, 6] + theta

    enc = np.asarray(coding.encode_boxes(jnp.asarray(boxes), jnp.asarray(cart)))
    enc_r = np.asarray(coding.encode_boxes(jnp.asarray(boxes_r), jnp.asarray(cart_r)))
    np.testing.assert_allclose(enc, enc_r, atol=1e-3)


def test_encoding_layout():
    """Channel layout: offset(3), log-dims(3), sin, cos."""
    cart = jnp.array([[10.0, 0.0, 0.0]])  # azimuth 0 -> frames coincide
    box = jnp.array([[11.0, 0.5, 0.25, 4.0, 2.0, 1.0, 0.5]])
    enc = np.asarray(coding.encode_boxes(box, cart))[0]
    np.testing.assert_allclose(enc[:3], [1.0, 0.5, 0.25], atol=1e-6)
    np.testing.assert_allclose(enc[3:6], np.log([4.0, 2.0, 1.0]), atol=1e-6)
    np.testing.assert_allclose(enc[6:], [np.sin(0.5), np.cos(0.5)], atol=1e-6)
