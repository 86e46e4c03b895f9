"""Loss + affinity-assignment tests vs torch-free oracles."""

import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.ops import assignment, losses


def _sigmoid(x):
    return 1 / (1 + np.exp(-x))


def test_bce_matches_numpy():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(64,)).astype(np.float32) * 3
    t = rng.uniform(size=(64,)).astype(np.float32)
    got = np.asarray(losses.sigmoid_bce(jnp.asarray(x), jnp.asarray(t)))
    p = _sigmoid(x.astype(np.float64))
    want = -(t * np.log(p) + (1 - t) * np.log(1 - p))
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_varifocal_semantics():
    """fg: target-weighted bce; bg: alpha * p^gamma * bce (functional/__init__.py:8-27)."""
    x = jnp.array([2.0, -1.0])
    t = jnp.array([0.8, 0.0])
    got = np.asarray(losses.varifocal_loss(x, t, alpha=0.75, gamma=2.0))
    bce = np.asarray(losses.sigmoid_bce(x, t))
    p = _sigmoid(np.array([2.0, -1.0]))
    np.testing.assert_allclose(got[0], 0.8 * bce[0], atol=1e-6)
    np.testing.assert_allclose(got[1], 0.75 * p[1] ** 2 * bce[1], atol=1e-6)


def test_penalty_reduced_focal():
    x = jnp.array([1.0, 0.5])
    t = jnp.array([1.0, 0.3])
    got = np.asarray(losses.penalty_reduced_focal_loss(x, t, alpha=2.0, gamma=2.0))
    bce = np.asarray(losses.sigmoid_bce(x, t))
    p = _sigmoid(np.array([1.0, 0.5]))
    want0 = (1 - p[0]) ** 2 * bce[0] + 2.0 * (1 - 1.0) ** 4 * p[0] ** 2 * bce[0]
    want1 = 2.0 * (1 - 0.3) ** 4 * p[1] ** 2 * bce[1]
    np.testing.assert_allclose(got, [want0, want1], rtol=1e-5)


def test_gaussian_affinity_targets():
    """k=inf Gaussian path: affinity = exp(-||dctr||/sigma^2) at fg pixels."""
    B, H, W, C = 1, 4, 8, 3
    rng = np.random.default_rng(1)
    cart = rng.uniform(5, 20, size=(B, H, W, 3)).astype(np.float32)
    reg_t = rng.normal(0, 0.1, size=(B, H, W, 8)).astype(np.float32)
    reg_t[..., 3:6] = rng.uniform(0.3, 1.5, size=(B, H, W, 3))
    reg_p = reg_t + rng.normal(0, 0.05, size=(B, H, W, 8)).astype(np.float32)

    labels = rng.integers(0, C + 1, size=(B, H, W)).astype(np.int32)
    winner = np.where(labels < C, rng.integers(0, 4, size=(B, H, W)), -1).astype(
        np.int32
    )
    valid = np.ones((B, H, W), bool)

    out = assignment.compute_classification_targets(
        jnp.asarray(reg_p),
        jnp.asarray(reg_t),
        jnp.asarray(labels),
        jnp.asarray(winner),
        jnp.asarray(cart),
        jnp.asarray(valid),
        num_categories=C,
        affinity_fn="GAUSSIAN",
        sigma=0.75,
    )
    aff = np.asarray(out.affinities)
    fg = np.asarray(out.foreground_mask)
    bg = np.asarray(out.background_mask)
    rw = np.asarray(out.regression_weights)

    assert aff.shape == (B, H, W, C)
    # fg pixels are exactly winner>=0 pixels (gaussian > 0 everywhere).
    np.testing.assert_array_equal(fg, winner >= 0)
    np.testing.assert_array_equal(bg, ~(winner >= 0))
    np.testing.assert_array_equal(rw, labels < C)
    # affinity mass only on the labeled channel.
    for c in range(C):
        off_channel = (labels != c) & (aff[..., c] > 0)
        assert not off_channel.any()
    # at a fg pixel, affinity equals the gaussian of decoded-center distance.
    ys, xs = np.nonzero(fg[0])
    if len(ys):
        y, x = ys[0], xs[0]
        lab = labels[0, y, x]
        if lab < C:
            assert 0 < aff[0, y, x, lab] <= 1.0


def test_bev_affinity_runs():
    B, H, W, C = 1, 2, 4, 2
    rng = np.random.default_rng(2)
    cart = rng.uniform(5, 20, size=(B, H, W, 3)).astype(np.float32)
    reg = rng.normal(0, 0.1, size=(B, H, W, 8)).astype(np.float32)
    labels = np.zeros((B, H, W), np.int32)
    winner = np.zeros((B, H, W), np.int32)
    valid = np.ones((B, H, W), bool)
    out = assignment.compute_classification_targets(
        jnp.asarray(reg),
        jnp.asarray(reg),
        jnp.asarray(labels),
        jnp.asarray(winner),
        jnp.asarray(cart),
        jnp.asarray(valid),
        num_categories=C,
        affinity_fn="BEV",
    )
    # identical pred/target boxes -> IoU 1 at fg pixels.
    np.testing.assert_allclose(
        np.asarray(out.affinities)[..., 0], 1.0, atol=1e-3
    )
