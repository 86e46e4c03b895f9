"""Model forward-pass shape tests + a tiny overfit smoke test.

The overfit test mirrors the reference's correctness oracle
(``scripts/debug-overfit.sh``): loss on a fixed tiny scene must decrease
substantially within a few dozen steps.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from range_view_3d_detection_tpu.models.decoder import DecoderConfig
from range_view_3d_detection_tpu.models.detector import (
    DetectorConfig,
    TargetsConfig,
)
from range_view_3d_detection_tpu.training import optim, state as state_lib

H, W, C = 8, 64, 5
K = 8


def tiny_config(**kw):
    defaults = dict(
        tasks=((0, ("CAR", "PED")),),
        in_channels=C,
        layers=(16, 16, 16, 16, 16),
        stem_type="META",
        fpn=((1, 32),),
        fpn_kernel_sizes=((1, (3, 3)),),
        classification_head_channels=16,
        regression_head_channels=16,
        num_classification_blocks=2,
        num_regression_blocks=2,
        max_boxes=K,
        dtype="float32",
    )
    defaults.update(kw)
    return DetectorConfig(**defaults)


def tiny_batch(B=2, seed=0):
    rng = np.random.default_rng(seed)
    az = np.linspace(-np.pi, np.pi, W, endpoint=False)
    incl = np.linspace(-0.3, 0.1, H)
    r = rng.uniform(5, 30, size=(B, H, W)).astype(np.float32)
    cart = np.stack(
        [
            r * np.cos(incl[None, :, None]) * np.cos(az[None, None, :]),
            r * np.cos(incl[None, :, None]) * np.sin(az[None, None, :]),
            r * np.sin(incl[None, :, None]),
        ],
        axis=-1,
    ).astype(np.float32)
    mask = rng.uniform(size=(B, H, W)) > 0.05
    features = np.concatenate(
        [rng.uniform(0, 1, (B, H, W, 2)).astype(np.float32), cart], axis=-1
    )
    boxes = np.zeros((B, K, 7), np.float32)
    box_valid = np.zeros((B, K), bool)
    for b in range(B):
        for k in range(3):
            y, x = rng.integers(0, H), rng.integers(0, W)
            boxes[b, k, :3] = cart[b, y, x]
            boxes[b, k, 3:6] = rng.uniform(2, 8, 3)
            boxes[b, k, 6] = rng.uniform(-np.pi, np.pi)
            box_valid[b, k] = True
    return {
        "features": jnp.asarray(features),
        "cart": jnp.asarray(cart),
        "mask": jnp.asarray(mask),
        "boxes": jnp.asarray(boxes),
        "box_valid": jnp.asarray(box_valid),
        "box_task": jnp.zeros((B, K), jnp.int32),
        "box_offset": jnp.asarray(
            rng.integers(0, 2, size=(B, K)).astype(np.int32)
        ),
    }


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config()
    batch = tiny_batch()
    tx, _ = optim.make_optimizer(1e-3, 100, debug=True)
    st = state_lib.create_state(jax.random.PRNGKey(0), cfg, tx, batch)
    return cfg, batch, tx, st


def test_forward_shapes(setup):
    cfg, batch, tx, st = setup
    fwd = state_lib.make_forward(cfg)
    out = fwd(
        {"params": st.params, "batch_stats": st.batch_stats},
        batch["features"],
        batch["cart"],
        batch["mask"],
    )
    assert out["head"][1][0]["logits"].shape == (2, H, W, 2)
    assert out["head"][1][0]["regressands"].shape == (2, H, W, 8)
    assert out["strided"][1]["cart"].shape == (2, H, W, 3)


def test_train_step_and_overfit(setup):
    cfg, batch, tx, st = setup
    step = state_lib.make_train_step(cfg, tx)
    # The train step donates its input state; other tests reuse the shared
    # fixture, so hand the step a copy.
    st = jax.tree_util.tree_map(jnp.copy, st)
    st1, m0 = step(st, batch)
    assert np.isfinite(float(m0["loss"]))
    losses = [float(m0["loss"])]
    for _ in range(40):
        st1, m = step(st1, batch)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_eval_step_decodes(setup):
    cfg, batch, tx, st = setup
    dec_cfg = DecoderConfig(
        subsampling_rates=(2, 1, 1), nms_cap=64, min_confidence=0.0
    )
    ev = state_lib.make_eval_step(cfg, dec_cfg, use_nms=True)
    res = ev(st, batch)
    assert res.cuboids.shape[0] == 2
    assert res.cuboids.shape[-1] == 7
    assert np.isfinite(np.asarray(res.cuboids)).all()


def test_multiscale_fpn():
    cfg = tiny_config(
        fpn=((1, 32), (2, 16)),
        fpn_kernel_sizes=((1, (3, 3)), (2, (3, 3))),
    )
    batch = tiny_batch()
    tx, _ = optim.make_optimizer(1e-3, 10, debug=True)
    st = state_lib.create_state(jax.random.PRNGKey(1), cfg, tx, batch)
    step = state_lib.make_train_step(cfg, tx)
    _, m = step(st, batch)
    assert np.isfinite(float(m["loss"]))
    assert "classification_loss/s2" in m


def test_remat_train_step():
    """Per-stage remat path produces finite loss and matching grads shape."""
    import dataclasses

    cfg = dataclasses.replace(tiny_config(), remat=True)
    batch = tiny_batch()
    tx, _ = optim.make_optimizer(1e-3, 10, debug=True)
    st = state_lib.create_state(jax.random.PRNGKey(2), cfg, tx, batch)
    step = state_lib.make_train_step(cfg, tx)
    st, m = step(st, batch)
    assert np.isfinite(float(m["loss"]))


def test_remat_scope_matches_remat_off():
    """Scoped remat (any subset) is a pure memory/time trade: the loss is
    bit-identical to remat off — checkpointing must never change math."""
    import dataclasses

    batch = tiny_batch()
    tx, _ = optim.make_optimizer(1e-3, 10, debug=True)
    losses = {}
    for name, kw in (
        ("off", dict(remat=False)),
        ("stem+loss", dict(remat=True, remat_scope=("stem", "loss"))),
        ("heads", dict(remat=True, remat_scope=("heads",))),
        ("all", dict(remat=True)),
    ):
        cfg = dataclasses.replace(tiny_config(), **kw)
        st = state_lib.create_state(jax.random.PRNGKey(2), cfg, tx, batch)
        _, m = state_lib.make_train_step(cfg, tx)(st, batch)
        losses[name] = float(m["loss"])
    base = losses["off"]
    for name, v in losses.items():
        np.testing.assert_allclose(v, base, rtol=1e-6, err_msg=name)
