"""Numerical parity: flax/JAX model vs the reference torch implementation.

These tests import the REFERENCE'S OWN torch code (``/root/reference/src``,
via ``reference_shims`` — only non-torch glue like torchvision's
``Conv2dNormActivation`` is stand-in), build each reference module at
rv-av2-like configurations, transplant its weights into the corresponding
flax module (OIHW -> HWIO etc.), feed both the same tensors, and assert
activation-level agreement. This converts "protocol clone, oracle
validated" into "audited against the reference implementation":

  - blocks: BasicBlock / ResidualBlock / AggregationBlock
    (``nn/blocks/__init__.py``) incl. the strided Conv2dSame padding rule
    (``nn/modules/conv.py:25-80``) and transposed-conv semantics
  - stems: MetaKernel (all three flax paths: stacked, accumulate, fused
    Pallas in interpret mode) and RangePartition
    (``nn/stems/__init__.py:12-128``)
  - backbone: full RangeBackbone multi-scale forward
    (``nn/backbones/dla.py:16-131``) and stem+backbone composition
  - heads: DenseHead towers incl. focal-prior bias
    (``nn/heads/dense_head.py:13-76``)
  - coding: encode_regression_targets / decode_range_view
    (``nn/heads/detection_head.py:460-493``, ``math/ops/coding.py:80-144``)
  - losses: varifocal / penalty-reduced focal / torchvision focal
    (``nn/functional/__init__.py``, ``nn/losses/classification.py``)

All comparisons run eval-mode fp32 on CPU with randomized parameters AND
randomized BatchNorm running statistics (so affine/statistics mapping
errors cannot cancel).
"""

from __future__ import annotations

import numpy as np
import pytest

import reference_shims

if not reference_shims.install():
    pytest.skip("reference checkout or torch unavailable", allow_module_level=True)

import torch  # noqa: E402
from torch import nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from torchbox3d.nn import functional as ref_functional  # noqa: E402
from torchbox3d.nn.backbones.dla import (  # noqa: E402
    RangeBackbone as RefRangeBackbone,
)
from torchbox3d.nn.blocks import (  # noqa: E402
    AggregationBlock as RefAggregationBlock,
    BasicBlock as RefBasicBlock,
    ResidualBlock as RefResidualBlock,
)
from torchbox3d.nn.heads.dense_head import DenseHead as RefDenseHead  # noqa: E402
from torchbox3d.nn.heads.detection_head import (  # noqa: E402
    encode_regression_targets,
)
from torchbox3d.math.ops.coding import decode_range_view  # noqa: E402
from torchbox3d.nn.stems import (  # noqa: E402
    MetaKernel as RefMetaKernel,
    RangePartition as RefRangePartition,
)

from range_view_3d_detection_tpu.models.backbone import (  # noqa: E402
    RangeBackbone as JxRangeBackbone,
)
from range_view_3d_detection_tpu.models.blocks import (  # noqa: E402
    AggregationBlock as JxAggregationBlock,
    BasicBlock as JxBasicBlock,
    ResidualBlock as JxResidualBlock,
)
from range_view_3d_detection_tpu.models.heads import (  # noqa: E402
    DenseHead as JxDenseHead,
)
from range_view_3d_detection_tpu.models.stems import (  # noqa: E402
    MetaKernel as JxMetaKernel,
    RangePartition as JxRangePartition,
)
from range_view_3d_detection_tpu.ops import coding as jx_coding  # noqa: E402
from range_view_3d_detection_tpu.ops import losses as jx_losses  # noqa: E402

# --------------------------------------------------------------------------
# Transplant helpers: torch modules -> flax param/batch_stats trees.
# --------------------------------------------------------------------------


def t2n(t: torch.Tensor) -> np.ndarray:
    return t.detach().cpu().numpy()


def conv_kernel(conv: tnn.Conv2d) -> np.ndarray:
    """(O, I, kh, kw) -> (kh, kw, I, O)."""
    return np.ascontiguousarray(t2n(conv.weight).transpose(2, 3, 1, 0))


def deconv_kernel(deconv: tnn.ConvTranspose2d) -> np.ndarray:
    """ConvTranspose2d (I, O, kh, kw) -> lhs-dilated-conv HWIO.

    ``TorchConvTranspose`` computes cross-correlation of the dilated input
    with its stored kernel; the equivalent of torch's transposed conv is
    the spatially flipped kernel.
    """
    w = t2n(deconv.weight)[:, :, ::-1, ::-1]
    return np.ascontiguousarray(w.transpose(2, 3, 0, 1))


def bn_entries(bn: tnn.BatchNorm2d):
    params = {"scale": t2n(bn.weight), "bias": t2n(bn.bias)}
    stats = {"mean": t2n(bn.running_mean), "var": t2n(bn.running_var)}
    return params, stats


def cna_entries(conv: tnn.Conv2d, bn: tnn.BatchNorm2d | None):
    """ConvNormAct <- (Conv2d [, BatchNorm2d])."""
    p = {"Conv_0": {"kernel": conv_kernel(conv)}}
    if conv.bias is not None:
        p["Conv_0"]["bias"] = t2n(conv.bias)
    s = {}
    if bn is not None:
        p["BatchNorm_0"], s["BatchNorm_0"] = bn_entries(bn)
    return p, s


def basic_block_tree(bb: RefBasicBlock):
    p, s = {}, {}
    p["ConvNormAct_0"], s["ConvNormAct_0"] = cna_entries(
        bb.net[0].conv, bb.net[1]
    )
    p["ConvNormAct_1"], s["ConvNormAct_1"] = cna_entries(
        bb.net[3].conv, bb.net[4]
    )
    if bb.projection_block is not None:
        p["ConvNormAct_2"], s["ConvNormAct_2"] = cna_entries(
            bb.projection_block[0].conv, bb.projection_block[1]
        )
    return p, s


def residual_block_tree(rb: RefResidualBlock):
    p, s = {}, {}
    for i, bb in enumerate(rb.blocks):
        p[f"BasicBlock_{i}"], s[f"BasicBlock_{i}"] = basic_block_tree(bb)
    return p, s


def aggregation_block_tree(ab: RefAggregationBlock):
    p = {"TorchConvTranspose_0": {"kernel": deconv_kernel(ab.upscale)}}
    s = {}
    p["BatchNorm_0"], s["BatchNorm_0"] = bn_entries(ab.normalization)
    p["ResidualBlock_0"], s["ResidualBlock_0"] = residual_block_tree(ab.block)
    return p, s


def backbone_tree(net: RefRangeBackbone):
    p, s = {}, {}
    stages = [net.res1, net.res2a, net.res2, net.res3a, net.res3]
    for i, rb in enumerate(stages):
        p[f"ResidualBlock_{i}"], s[f"ResidualBlock_{i}"] = residual_block_tree(rb)
    # flax creation order: agg2, agg1, agg2a, agg3.
    aggs = [net.agg2, net.agg1, net.agg2a, net.agg3]
    for i, ab in enumerate(aggs):
        p[f"AggregationBlock_{i}"], s[f"AggregationBlock_{i}"] = (
            aggregation_block_tree(ab)
        )
    return p, s


def meta_kernel_tree(mk: RefMetaKernel):
    n2 = mk.num_neighbors**2
    C = mk.out_channels
    p, s = {}, {}
    p["BasicBlock_0"], s["BasicBlock_0"] = basic_block_tree(mk.projection)
    for i, layer in enumerate(mk.positional_kernel):
        conv, bn = layer[0], layer[1]
        # 1x1 conv (O, I, 1, 1) -> (I, O) matmul kernel.
        p[f"pos_{i}_conv_kernel"] = np.ascontiguousarray(
            t2n(conv.weight)[:, :, 0, 0].T
        )
        p[f"pos_{i}_bn_scale"] = t2n(bn.weight)
        p[f"pos_{i}_bn_bias"] = t2n(bn.bias)
        s[f"pos_{i}_bn_mean"] = t2n(bn.running_mean)
        s[f"pos_{i}_bn_var"] = t2n(bn.running_var)
    # Fusion layer 0: torch flat input channel = c * n2 + neighbor
    # (unfold is channel-major); flax blocked kernel is (neighbor, c, out).
    w0 = t2n(mk.fusion_kernel[0][0].weight)[:, :, 0, 0]  # (O, n2*C)
    w0 = w0.reshape(w0.shape[0], C, n2)  # (O, c, n)
    p["fusion1_kernel"] = np.ascontiguousarray(w0.transpose(2, 1, 0))
    p["fusion1_bn"], s["fusion1_bn"] = bn_entries(mk.fusion_kernel[0][1])
    for i in range(1, len(mk.fusion_kernel)):
        layer = mk.fusion_kernel[i]
        p[f"fusion_{i}"], s[f"fusion_{i}"] = cna_entries(layer[0], layer[1])
    return p, s


def dense_head_tree(dh: RefDenseHead):
    p, s = {}, {}
    for i, block in enumerate(dh.blocks[:-1]):
        p[f"ConvNormAct_{i}"], s[f"ConvNormAct_{i}"] = cna_entries(
            block[0], block[1]
        )
    i = len(dh.blocks) - 1
    p[f"ConvNormAct_{i}"], _ = cna_entries(dh.blocks[-1][0], None)
    return p, s


def randomize(module: tnn.Module, seed: int) -> tnn.Module:
    """Randomize BN affines + running statistics so statistics-mapping
    errors cannot hide behind (0, 1) defaults. Conv weights keep their
    (seeded) torch default init."""
    g = torch.Generator().manual_seed(seed)
    with torch.no_grad():
        for m in module.modules():
            if isinstance(m, tnn.BatchNorm2d):
                m.weight.uniform_(0.5, 1.5, generator=g)
                m.bias.normal_(0.0, 0.3, generator=g)
                m.running_mean.normal_(0.0, 0.3, generator=g)
                m.running_var.uniform_(0.5, 1.5, generator=g)
    module.eval()
    return module


def assert_close(ref: np.ndarray, got: np.ndarray, tol: float, what: str):
    ref = np.asarray(ref, np.float64)
    got = np.asarray(got, np.float64)
    assert ref.shape == got.shape, (what, ref.shape, got.shape)
    scale = max(float(np.abs(ref).max()), 1e-3)
    err = float(np.abs(ref - got).max()) / scale
    assert err < tol, f"{what}: scale-relative max err {err:.3e} >= {tol:g}"


def nchw(x: np.ndarray) -> torch.Tensor:
    return torch.from_numpy(np.ascontiguousarray(x.transpose(0, 3, 1, 2)))


def rng_img(shape, seed, scale=1.0):
    return (
        np.random.default_rng(seed).standard_normal(shape).astype(np.float32)
        * scale
    )


# --------------------------------------------------------------------------
# Blocks
# --------------------------------------------------------------------------


@pytest.mark.parametrize(
    "stride,project", [((1, 1), False), ((1, 1), True), ((1, 2), True)]
)
def test_basic_block_parity(stride, project):
    torch.manual_seed(0)
    ref = randomize(
        RefBasicBlock(16, 16, stride=stride, kernel_size=3, project=project), 1
    )
    x = rng_img((2, 8, 32, 16), 2)
    with torch.no_grad():
        want = t2n(ref(nchw(x))).transpose(0, 2, 3, 1)

    jxm = JxBasicBlock(16, kernel_size=(3, 3), strides=stride, project=project)
    p, s = basic_block_tree(ref)
    got = jxm.apply({"params": p, "batch_stats": s}, jnp.asarray(x), False)
    assert_close(want, np.asarray(got), 1e-5, f"BasicBlock{stride}")


def test_residual_block_parity():
    torch.manual_seed(3)
    ref = randomize(RefResidualBlock(16, 24, num_blocks=3, stride=(1, 2)), 4)
    x = rng_img((2, 8, 32, 16), 5)
    with torch.no_grad():
        want = t2n(ref(nchw(x))).transpose(0, 2, 3, 1)
    jxm = JxResidualBlock(24, num_blocks=3, strides=(1, 2))
    p, s = residual_block_tree(ref)
    got = jxm.apply({"params": p, "batch_stats": s}, jnp.asarray(x), False)
    assert_close(want, np.asarray(got), 1e-5, "ResidualBlock")


@pytest.mark.parametrize(
    "ks,stride,padding", [((3, 8), (1, 4), (1, 2)), ((3, 4), (1, 2), (1, 1))]
)
def test_aggregation_block_parity(ks, stride, padding):
    torch.manual_seed(6)
    ref = randomize(
        RefAggregationBlock(
            16, 32, 16, kernel_size=ks, stride=stride, padding=padding,
            num_blocks=2,
        ),
        7,
    )
    x1 = rng_img((2, 8, 32, 16), 8)
    x2 = rng_img((2, 8, 32 // stride[1], 32), 9)
    with torch.no_grad():
        want = t2n(ref(nchw(x1), nchw(x2))).transpose(0, 2, 3, 1)
    jxm = JxAggregationBlock(
        16, kernel_size=ks, strides=stride, padding=padding, num_blocks=2
    )
    p, s = aggregation_block_tree(ref)
    got = jxm.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x1), jnp.asarray(x2), False
    )
    assert_close(want, np.asarray(got), 1e-5, f"AggregationBlock{ks}")


def test_range_backbone_parity():
    layers = [32, 32, 64, 64, 128]
    torch.manual_seed(10)
    # tuple: @dataclass(unsafe_hash=True) hashes the field, lists are not
    # hashable (the reference passes an omegaconf ListConfig).
    ref = randomize(RefRangeBackbone(layers[0], tuple(layers), layers[0]), 11)
    x = rng_img((2, 8, 64, layers[0]), 12)
    with torch.no_grad():
        want = {
            k: t2n(v).transpose(0, 2, 3, 1)
            for k, v in ref(
                nchw(x), torch.zeros(1), torch.zeros(1)
            ).items()
        }
    jxm = JxRangeBackbone(layers)
    p, s = backbone_tree(ref)
    got = jxm.apply(
        {"params": p, "batch_stats": s}, jnp.asarray(x), train=False
    )
    for stride in (1, 2, 4, 16):
        assert_close(
            want[stride], np.asarray(got[stride]), 5e-5, f"backbone s{stride}"
        )


# --------------------------------------------------------------------------
# Stems
# --------------------------------------------------------------------------


def _meta_kernel_pair(seed=20, in_ch=5, C=24):
    torch.manual_seed(seed)
    ref = randomize(
        RefMetaKernel(
            in_channels=in_ch, out_channels=C, num_neighbors=3, num_layers=2
        ),
        seed + 1,
    )
    feats = rng_img((2, 8, 32, in_ch), seed + 2)
    cart = rng_img((2, 8, 32, 3), seed + 3, scale=20.0)
    with torch.no_grad():
        want = t2n(ref(nchw(feats), nchw(cart))).transpose(0, 2, 3, 1)
    p, s = meta_kernel_tree(ref)
    return want, p, s, feats, cart, C


@pytest.mark.parametrize("path", ["stacked", "accumulate", "pallas"])
def test_meta_kernel_parity(path):
    want, p, s, feats, cart, C = _meta_kernel_pair()
    jxm = JxMetaKernel(
        C,
        num_neighbors=3,
        num_layers=2,
        inference_accumulate=path != "stacked",
        use_pallas_kernel=path == "pallas",
    )
    got = jxm.apply(
        {"params": p, "batch_stats": s},
        jnp.asarray(feats),
        jnp.asarray(cart),
        False,
    )
    assert_close(want, np.asarray(got), 1e-4, f"MetaKernel[{path}]")


def test_meta_kernel_train_path_parity():
    """Train-mode forward (batch statistics) against torch train mode."""
    torch.manual_seed(30)
    ref = randomize(
        RefMetaKernel(in_channels=5, out_channels=16, num_neighbors=3), 31
    )
    ref.train()
    feats = rng_img((2, 8, 32, 5), 32)
    cart = rng_img((2, 8, 32, 3), 33, scale=20.0)
    with torch.no_grad():
        want = t2n(ref(nchw(feats), nchw(cart))).transpose(0, 2, 3, 1)
    jxm = JxMetaKernel(16, num_neighbors=3)
    p, s = meta_kernel_tree(ref)
    got, _ = jxm.apply(
        {"params": p, "batch_stats": s},
        jnp.asarray(feats),
        jnp.asarray(cart),
        True,
        mutable=["batch_stats"],
    )
    assert_close(want, np.asarray(got), 1e-4, "MetaKernel[train]")


def test_range_partition_parity():
    torch.manual_seed(40)
    ref = randomize(
        RefRangePartition(
            in_channels=5, out_channels=16, num_neighbors=3,
            projection_kernel_size=1,
        ),
        41,
    )
    feats = rng_img((2, 8, 32, 5), 42)
    cart = rng_img((2, 8, 32, 3), 43, scale=25.0)
    mask = np.random.default_rng(44).random((2, 8, 32)) > 0.3
    with torch.no_grad():
        want = t2n(
            ref(
                nchw(feats),
                nchw(cart),
                torch.from_numpy(mask[:, None].astype(np.float32)),
            )
        ).transpose(0, 2, 3, 1)
    jxm = JxRangePartition(16, projection_kernel_size=1)
    p, s = basic_block_tree(ref.projection)
    got = jxm.apply(
        {"params": {"BasicBlock_0": p}, "batch_stats": {"BasicBlock_0": s}},
        jnp.asarray(feats),
        jnp.asarray(cart),
        jnp.asarray(mask.astype(np.float32)),
        False,
    )
    assert_close(want, np.asarray(got), 1e-5, "RangePartition")


def test_full_stem_backbone_parity():
    """Stem + backbone composed, the RangeNet forward contract
    (``dla.py:193-208``): multi-scale dict incl. the stride-1 concat."""
    layers = [24, 24, 32, 32, 48]
    in_ch = 5
    torch.manual_seed(50)
    stem = randomize(
        RefMetaKernel(
            in_channels=in_ch, out_channels=layers[0], num_neighbors=3
        ),
        51,
    )
    net = randomize(RefRangeBackbone(layers[0], tuple(layers), layers[0]), 52)
    feats = rng_img((2, 8, 64, in_ch), 53)
    cart = rng_img((2, 8, 64, 3), 54, scale=20.0)
    with torch.no_grad():
        stem_out = stem(nchw(feats), nchw(cart))
        want = {
            k: t2n(v).transpose(0, 2, 3, 1)
            for k, v in net(stem_out, torch.zeros(1), torch.zeros(1)).items()
        }

    from range_view_3d_detection_tpu.models.backbone import RangeNet

    jxm = RangeNet(layers, stem_type="META", num_neighbors=3, num_layers=2)
    sp, ss = meta_kernel_tree(stem)
    bp, bs = backbone_tree(net)
    variables = {
        "params": {"MetaKernel_0": sp, "RangeBackbone_0": bp},
        "batch_stats": {"MetaKernel_0": ss, "RangeBackbone_0": bs},
    }
    got = jxm.apply(
        variables,
        jnp.asarray(feats),
        jnp.asarray(cart),
        jnp.ones((2, 8, 64), bool),
        train=False,
    )
    for stride in (1, 2, 4, 16):
        assert_close(
            want[stride], np.asarray(got[stride]), 2e-4, f"rangenet s{stride}"
        )


# --------------------------------------------------------------------------
# Heads
# --------------------------------------------------------------------------


@pytest.mark.parametrize("prior", [None, 0.01])
def test_dense_head_parity(prior):
    torch.manual_seed(60)
    ref = randomize(
        RefDenseHead(
            in_channels=32,
            out_channels=48,
            num_cls=7,
            kernel_size=3,
            final_kernel_size=1,
            num_blocks=4,
            prior_prob=prior,
        ),
        61,
    )
    x = rng_img((2, 8, 32, 32), 62)
    with torch.no_grad():
        want = t2n(ref(nchw(x), None, None)).transpose(0, 2, 3, 1)
    jxm = JxDenseHead(
        48,
        num_outputs=7,
        kernel_size=(3, 3),
        final_kernel_size=(1, 1),
        num_blocks=4,
        prior_prob=prior,
    )
    p, s = dense_head_tree(ref)
    got = jxm.apply({"params": p, "batch_stats": s}, jnp.asarray(x), False)
    assert_close(want, np.asarray(got), 1e-5, f"DenseHead prior={prior}")


# --------------------------------------------------------------------------
# Coding
# --------------------------------------------------------------------------


def test_decode_range_view_parity():
    rng = np.random.default_rng(70)
    B, H, W = 2, 4, 16
    reg = rng.standard_normal((B, H, W, 8)).astype(np.float32)
    cart = (rng.random((B, H, W, 3)).astype(np.float32) - 0.5) * 80.0
    for azimuth_invariant in (True, False):
        with torch.no_grad():
            want = t2n(
                decode_range_view(
                    nchw(reg), nchw(cart), azimuth_invariant
                )
            ).transpose(0, 2, 3, 1)
        got = np.asarray(
            jx_coding.decode_boxes(
                jnp.asarray(reg),
                jnp.asarray(cart),
                azimuth_invariant=azimuth_invariant,
            )
        )
        # Yaw wraps: compare sin/cos rather than the raw angle.
        assert_close(want[..., :6], got[..., :6], 1e-5, "decode params")
        assert_close(
            np.sin(want[..., 6]), np.sin(got[..., 6]), 1e-5, "decode sin yaw"
        )
        assert_close(
            np.cos(want[..., 6]), np.cos(got[..., 6]), 1e-5, "decode cos yaw"
        )


def test_encode_regression_targets_parity():
    rng = np.random.default_rng(71)
    N, P = 5, 37
    cuboids = np.zeros((N, 9), np.float32)
    cuboids[:, :3] = (rng.random((N, 3)) - 0.5) * 60.0
    cuboids[:, 3:6] = rng.random((N, 3)) * 4.0 + 0.5
    cuboids[:, 6] = (rng.random(N) - 0.5) * 6.0
    points = ((rng.random((P, 3)) - 0.5) * 60.0).astype(np.float32)
    for azimuth_invariant in (True, False):
        with torch.no_grad():
            want = t2n(
                encode_regression_targets(
                    torch.from_numpy(cuboids),
                    torch.from_numpy(points),
                    azimuth_invariant,
                )
            )  # (N, P, 8)
        got = np.asarray(
            jx_coding.encode_boxes(
                jnp.asarray(np.broadcast_to(cuboids[:, None, :7], (N, P, 7))),
                jnp.asarray(np.broadcast_to(points[None, :, :], (N, P, 3))),
                azimuth_invariant=azimuth_invariant,
            )
        )
        assert_close(want, got, 1e-5, "encode targets")


# --------------------------------------------------------------------------
# Losses
# --------------------------------------------------------------------------


def _loss_inputs(seed=80):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((4, 33)).astype(np.float32) * 3.0
    targets = rng.random((4, 33)).astype(np.float32)
    # Exact zeros and ones exercise the fg/bg masks.
    targets[targets < 0.3] = 0.0
    targets[targets > 0.9] = 1.0
    return logits, targets


def test_varifocal_loss_parity():
    logits, targets = _loss_inputs()
    with torch.no_grad():
        want = t2n(
            ref_functional.varifocal_loss(
                torch.from_numpy(logits),
                torch.from_numpy(targets),
                alpha=0.75,
                gamma=2.0,
                reduction="none",
            )
        )
    got = np.asarray(
        jx_losses.varifocal_loss(
            jnp.asarray(logits), jnp.asarray(targets), alpha=0.75, gamma=2.0
        )
    )
    assert_close(want, got, 1e-6, "varifocal")


def test_penalty_reduced_focal_loss_parity():
    logits, targets = _loss_inputs(81)
    with torch.no_grad():
        want = t2n(
            ref_functional.penalty_reduced_focal_loss(
                torch.from_numpy(logits),
                torch.from_numpy(targets),
                alpha=0.25,
                gamma=2,
                reduction="none",
            )
        )
    got = np.asarray(
        jx_losses.penalty_reduced_focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), alpha=0.25, gamma=2.0
        )
    )
    assert_close(want, got, 1e-6, "penalty-reduced focal")


def test_focal_loss_parity():
    """Reference FocalLoss delegates to torchvision's sigmoid_focal_loss
    (losses/classification.py:83) with library-default alpha/gamma."""
    import torchvision.ops as tv_ops

    logits, targets = _loss_inputs(82)
    with torch.no_grad():
        want = t2n(
            tv_ops.sigmoid_focal_loss(
                torch.from_numpy(logits), torch.from_numpy(targets)
            )
        )
    got = np.asarray(
        jx_losses.focal_loss(
            jnp.asarray(logits), jnp.asarray(targets), alpha=0.25, gamma=2.0
        )
    )
    assert_close(want, got, 1e-6, "focal")
