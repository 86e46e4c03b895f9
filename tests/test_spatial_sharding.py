"""Width (azimuth) sharding tests on the virtual 8-device CPU mesh.

Round-3 design (``parallel/spatial.py``): per-op halo exchange makes the
width-sharded network EXACT vs the global model — forward, loss, and
gradients — not a bounded-halo approximation. These tests assert that
equivalence end-to-end.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from range_view_3d_detection_tpu.parallel.mesh import make_mesh
from range_view_3d_detection_tpu.parallel.spatial import (
    exchange_halo,
    width_sharded_apply,
    width_sharded_forward,
    width_sharding,
    width_shardings,
)


def test_halo_exchange_matches_roll():
    """Sharded halo exchange + identity == circularly padded global slices."""
    from jax.sharding import PartitionSpec as P

    mesh = make_mesh(num_data=1, num_model=8)
    B, H, W, C = 1, 2, 64, 3
    halo = 2
    x = np.arange(B * H * W * C, dtype=np.float32).reshape(B, H, W, C)

    def local(x):
        return exchange_halo(x, halo, "model")

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=P("data", None, "model", None),
        out_specs=P("data", None, "model", None),
    )
    xg = jax.device_put(jnp.asarray(x), width_shardings(mesh)[0])
    out = np.asarray(fn(xg))  # (B, H, 8 * (8 + 2*halo), C)
    shard_w = W // 8
    for d in range(8):
        blk = out[:, :, d * (shard_w + 2 * halo) : (d + 1) * (shard_w + 2 * halo)]
        lo = (d * shard_w - halo) % W
        want = np.concatenate(
            [x[:, :, (lo + i) % W][:, :, None] for i in range(shard_w + 2 * halo)],
            axis=2,
        )
        np.testing.assert_array_equal(blk, want)


@pytest.mark.parametrize("strides", [(1, 1), (1, 2)])
def test_width_sharded_conv_exact(strides):
    """A width-sharded ConvNormAct == the global one (incl. stride)."""
    from range_view_3d_detection_tpu.models.blocks import ConvNormAct

    mesh = make_mesh(num_data=1, num_model=8)
    B, H, W, C = 1, 4, 64, 3

    conv = ConvNormAct(8, kernel_size=(3, 3), strides=strides)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    variables = conv.init(jax.random.PRNGKey(0), jnp.asarray(x))

    def apply_fn(v, f, c, m):
        y = conv.apply(v, f)
        return {"head": {1: {"y": y}}, "strided": {1: {"cart": c, "mask": m}}}

    r4, r3 = width_shardings(mesh)
    fg = jax.device_put(jnp.asarray(x), r4)
    cg = jax.device_put(jnp.zeros((B, H, W, 3), jnp.float32), r4)
    mg = jax.device_put(jnp.ones((B, H, W), bool), r3)

    out = width_sharded_forward(apply_fn, mesh, variables, fg, cg, mg)
    got = np.asarray(out["head"][1]["y"])
    ref = np.asarray(conv.apply(variables, jnp.asarray(x)))
    np.testing.assert_allclose(got, ref, atol=1e-6)


def test_width_sharded_deconv_exact():
    """AggregationBlock (transposed conv upsample) sharded == global."""
    from range_view_3d_detection_tpu.models.blocks import AggregationBlock

    mesh = make_mesh(num_data=1, num_model=4)
    B, H = 1, 4
    W_coarse, C1, C2 = 16, 8, 12  # upsampled x4 -> W 64

    blk = AggregationBlock(
        C1, kernel_size=(3, 8), strides=(1, 4), padding=(1, 2), num_blocks=2
    )
    rng = np.random.default_rng(1)
    x1 = rng.normal(size=(B, H, W_coarse * 4, C1)).astype(np.float32)
    x2 = rng.normal(size=(B, H, W_coarse, C2)).astype(np.float32)
    variables = blk.init(
        jax.random.PRNGKey(0), jnp.asarray(x1), jnp.asarray(x2), False
    )

    ref = np.asarray(blk.apply(variables, jnp.asarray(x1), jnp.asarray(x2), False))

    from jax.sharding import NamedSharding, PartitionSpec as P

    r4 = NamedSharding(mesh, P("data", None, "model", None))
    x1g = jax.device_put(jnp.asarray(x1), r4)
    x2g = jax.device_put(jnp.asarray(x2), r4)

    def local(v, a, b):
        with width_sharding("model"):
            return blk.apply(v, a, b, False)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P("data", None, "model", None), P("data", None, "model", None)),
        out_specs=P("data", None, "model", None),
    )
    got = np.asarray(fn(variables, x1g, x2g))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("kernel,strides,padding", [
    ((3, 3), (1, 1), (1, 1)),  # width-stride-1, kw>1: seam reads cross shards
    ((3, 2), (1, 2), (1, 0)),  # no-overlap upsample: zero halo, plain path
])
def test_width_sharded_deconv_stride1_exact(kernel, strides, padding):
    """TorchConvTranspose halo gating keys on the kernel footprint, not on
    sw > 1: a width-stride-1 transposed conv with kw > 1 still reads across
    shard seams and must exchange a halo."""
    from range_view_3d_detection_tpu.models.blocks import TorchConvTranspose

    mesh = make_mesh(num_data=1, num_model=4)
    B, H, W, C = 1, 4, 32, 8
    blk = TorchConvTranspose(
        features=6, kernel_size=kernel, strides=strides, padding=padding
    )
    rng = np.random.default_rng(3)
    x = rng.normal(size=(B, H, W, C)).astype(np.float32)
    variables = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ref = np.asarray(blk.apply(variables, jnp.asarray(x)))

    from jax.sharding import NamedSharding, PartitionSpec as P

    xg = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, None, "model", None)))

    def local(v, a):
        with width_sharding("model"):
            return blk.apply(v, a)

    fn = jax.shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(None, None, "model", None)),
        out_specs=P(None, None, "model", None),
    )
    got = np.asarray(fn(variables, xg))
    np.testing.assert_allclose(got, ref, atol=1e-5)


@pytest.mark.parametrize("stem", ["BASIC", "META"])
def test_width_sharded_detector_exact(stem):
    """Full tiny detector, width-sharded eval forward == global forward."""
    from range_view_3d_detection_tpu.models.detector import Detector
    from tests.test_model import tiny_batch, tiny_config

    mesh = make_mesh(num_data=1, num_model=2)
    cfg = tiny_config(stem_type=stem)
    batch = tiny_batch(B=1)
    model = Detector(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["features"],
        batch["cart"],
        batch["mask"],
        train=False,
    )

    ref = model.apply(
        variables, batch["features"], batch["cart"], batch["mask"], train=False
    )

    r4, r3 = width_shardings(mesh)
    fg = jax.device_put(batch["features"], r4)
    cg = jax.device_put(batch["cart"], r4)
    mg = jax.device_put(batch["mask"], r3)
    out = width_sharded_forward(
        lambda v, f, c, m: model.apply(v, f, c, m, train=False),
        mesh,
        variables,
        fg,
        cg,
        mg,
    )
    for s in ref["head"]:
        for t in ref["head"][s]:
            for name in ("logits", "regressands"):
                np.testing.assert_allclose(
                    np.asarray(out["head"][s][t][name]),
                    np.asarray(ref["head"][s][t][name]),
                    atol=2e-5,
                    err_msg=f"{stem} s{s} t{t} {name}",
                )


def test_width_sharded_train_step_exact():
    """Width-sharded TRAINING: loss, gradients, and BatchNorm batch
    statistics all match the global model (the round-2 review's "exact,
    not approximate" requirement — VERDICT item 4)."""
    from range_view_3d_detection_tpu.models.detector import (
        Detector,
        detection_loss,
    )
    from tests.test_model import tiny_batch, tiny_config

    mesh = make_mesh(num_data=1, num_model=2)
    cfg = tiny_config(stem_type="META")
    batch = tiny_batch(B=1)
    model = Detector(cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        batch["features"],
        batch["cart"],
        batch["mask"],
        train=True,
    )
    params = variables["params"]
    stats = variables["batch_stats"]

    sharded_apply = width_sharded_apply(model, mesh, train=True)
    r4, r3 = width_shardings(mesh)
    fg = jax.device_put(batch["features"], r4)
    cg = jax.device_put(batch["cart"], r4)
    mg = jax.device_put(batch["mask"], r3)

    def loss_sharded(params):
        out, mutated = sharded_apply(
            {"params": params, "batch_stats": stats}, fg, cg, mg
        )
        loss, _ = detection_loss(out, batch, cfg)
        return loss, mutated["batch_stats"]

    def loss_global(params):
        out, mutated = model.apply(
            {"params": params, "batch_stats": stats},
            batch["features"],
            batch["cart"],
            batch["mask"],
            train=True,
            mutable=["batch_stats"],
        )
        loss, _ = detection_loss(out, batch, cfg)
        return loss, mutated["batch_stats"]

    (l_s, bs_s), g_s = jax.jit(
        jax.value_and_grad(loss_sharded, has_aux=True)
    )(params)
    (l_g, bs_g), g_g = jax.jit(
        jax.value_and_grad(loss_global, has_aux=True)
    )(params)

    np.testing.assert_allclose(float(l_s), float(l_g), rtol=1e-5)

    flat_s = jax.tree_util.tree_leaves_with_path(g_s)
    flat_g = dict(jax.tree_util.tree_leaves_with_path(g_g))
    for path, leaf in flat_s:
        want = flat_g[path]
        scale = max(float(jnp.abs(want).max()), 1e-6)
        err = float(jnp.abs(leaf - want).max()) / scale
        assert err < 1e-4, f"grad {jax.tree_util.keystr(path)}: {err:.2e}"

    stats_s = dict(jax.tree_util.tree_leaves_with_path(bs_s))
    for path, want in jax.tree_util.tree_leaves_with_path(bs_g):
        got = stats_s[path]
        np.testing.assert_allclose(
            np.asarray(got),
            np.asarray(want),
            rtol=1e-4,
            atol=1e-6,
            err_msg=f"batch_stats {jax.tree_util.keystr(path)}",
        )
