"""MetaKernel stacked vs loop-accumulate path equivalence."""

import jax
import jax.numpy as jnp
import numpy as np

from range_view_3d_detection_tpu.models.stems import MetaKernel


def test_meta_kernel_paths_agree():
    rng = np.random.default_rng(0)
    B, H, W, C = 1, 4, 16, 5
    feats = jnp.asarray(rng.normal(size=(B, H, W, C)).astype(np.float32))
    cart = jnp.asarray(rng.uniform(5, 20, (B, H, W, 3)).astype(np.float32))

    loop = MetaKernel(8, inference_accumulate=True)
    stacked = MetaKernel(8, inference_accumulate=False)
    variables = loop.init(jax.random.PRNGKey(0), feats, cart, train=False)

    a = loop.apply(variables, feats, cart, train=False)
    b = stacked.apply(variables, feats, cart, train=False)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
    assert np.isfinite(np.asarray(a)).all()


def test_meta_kernel_train_path_runs():
    rng = np.random.default_rng(1)
    feats = jnp.asarray(rng.normal(size=(1, 4, 8, 5)).astype(np.float32))
    cart = jnp.asarray(rng.uniform(5, 20, (1, 4, 8, 3)).astype(np.float32))
    m = MetaKernel(8)
    variables = m.init(jax.random.PRNGKey(0), feats, cart, train=True)
    out, mutated = m.apply(
        variables, feats, cart, train=True, mutable=["batch_stats"]
    )
    assert out.shape == (1, 4, 8, 8)
    assert "batch_stats" in mutated
