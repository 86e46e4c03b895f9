"""Post-training int8 quantization of the detection-head towers (serving).

The flagship model is MXU-bound and >55% of its device time is the eight
512-channel head-tower convolutions (BENCH_NOTES.md round-2/3 profiles).
TPU v5e runs int8 matmuls at ~2x the bf16 MXU rate, and a measured probe
(round 3) shows an int8 conv chain at this exact shape running ~1.4x
faster than bf16 end-to-end *including* requantization epilogues. This
module converts the DenseHead towers of a **BN-folded serving artifact**
(``tools/export.py::fold_batch_norms``) to int8:

- weights: symmetric per-output-channel int8 (absmax / 127);
- activations: symmetric per-tensor int8, scales calibrated by running
  the bf16 model over a few batches and recording per-block absmax
  (flax ``capture_intermediates``);
- each tower block becomes ``conv_int8 -> int32`` followed by a fused
  elementwise epilogue ``relu(acc * (s_in * s_w * s_bn) + b_bn)``
  requantized straight to the next block's int8 scale — XLA fuses the
  whole epilogue into the convolution;
- the final 1x1 prediction conv stays in bf16/fp32 (it is <2% of tower
  FLOPs and its output feeds fp32 decoding).

This is a serving-only transform: training and the parity path are
untouched. Reference analog: none (the reference serves fp16 CUDA —
``tools/benchmark.py:60-63``); this is TPU-native headroom beyond parity.
"""

from __future__ import annotations

from typing import Any, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

Pytree = Any

_INT8_MAX = 127.0


# ---------------------------------------------------------------------------
# Calibration
# ---------------------------------------------------------------------------


def calibrate_head_scales(
    model,
    variables: Pytree,
    batches: Sequence[Tuple[np.ndarray, np.ndarray, np.ndarray]],
) -> Dict[str, List[float]]:
    """Per-tower, per-block activation scales from bf16 forward passes.

    Returns ``{tower_name: [s_0, ..., s_{n_quant-1}]}`` — one scale per
    QUANTIZED block (the ``n_total - 1`` Conv+BN+ReLU blocks; the final
    fp prediction conv needs none): ``s_0`` covers the backbone features
    feeding the tower and ``s_i`` (i>0) the ReLU output of block ``i-1``.

    The capture forward runs inside ONE jit with on-device absmax
    reduction: only per-block scalars cross the host boundary (eager
    capture at flagship shapes means hundreds of dispatches and ~1 GB of
    intermediate buffers — and through the remote-TPU tunnel of this
    image, readback at ~25 MB/s).
    """
    from range_view_3d_detection_tpu.models.backbone import RangeNet
    from range_view_3d_detection_tpu.models.blocks import ConvNormAct

    @jax.jit
    def _absmax(v, feats, cart, mask):
        _, state = model.apply(
            v,
            feats,
            cart,
            mask,
            train=False,
            capture_intermediates=lambda mdl, _m: isinstance(
                mdl, (ConvNormAct, RangeNet)
            ),
            mutable=["intermediates"],
        )
        inter = state["intermediates"]
        multi = inter["RangeNet_0"]["__call__"][0]
        feats_max = {
            int(s): jnp.max(jnp.abs(x.astype(jnp.float32)))
            for s, x in multi.items()
        }
        head = inter.get("DetectionHead_0", {})
        out = {}
        for tower_name, blocks in head.items():
            n = len([k for k in blocks if k.startswith("ConvNormAct_")])
            vals = [feats_max[_tower_stride(tower_name)]]
            for i in range(n - 2):  # block i output feeds block i+1
                o = blocks[f"ConvNormAct_{i}"]["__call__"][0]
                vals.append(jnp.max(jnp.abs(o.astype(jnp.float32))))
            out[tower_name] = jnp.stack(vals)
        return out

    absmax: Dict[str, np.ndarray] = {}
    for feats, cart, mask in batches:
        res = jax.device_get(_absmax(variables, feats, cart, mask))
        for k, v in res.items():
            v = np.asarray(v, np.float64)
            cur = absmax.get(k)
            absmax[k] = v if cur is None else np.maximum(cur, v)
    return {
        k: [float(m) / _INT8_MAX if m > 0 else 1.0 for m in v]
        for k, v in absmax.items()
    }


def _tower_stride(tower_name: str) -> int:
    # "cls_s{stride}_t{task}" / "reg_s{stride}_t{task}"
    return int(tower_name.split("_s")[1].split("_t")[0])


# ---------------------------------------------------------------------------
# Weight quantization
# ---------------------------------------------------------------------------


def quantize_head(
    folded_params: Pytree, act_scales: Dict[str, List[float]]
) -> Dict[str, Any]:
    """int8-quantize every DenseHead tower of a BN-folded params tree.

    Returns ``{tower_name: {"blocks": [...], "final": {...}, "scales": [...]}}``
    where each tower block carries the int8 kernel, the per-output-channel
    fused dequant multiplier, and the folded-BN bias.
    """
    head = folded_params["DetectionHead_0"]
    qhead: Dict[str, Any] = {}
    for tower_name, tower in head.items():
        n_total = len([k for k in tower if k.startswith("ConvNormAct_")])
        scales = act_scales[tower_name]
        if len(scales) != n_total - 1:
            raise ValueError(
                f"{tower_name}: {len(scales)} activation scales for "
                f"{n_total - 1} quantized blocks"
            )
        blocks = []
        for i in range(n_total - 1):
            blk = tower[f"ConvNormAct_{i}"]
            w = np.asarray(blk["Conv_0"]["kernel"], np.float32)  # HWIO
            w_scale = np.maximum(
                np.abs(w).max(axis=(0, 1, 2)) / _INT8_MAX, 1e-12
            )  # per cout
            w_i8 = np.clip(
                np.rint(w / w_scale), -_INT8_MAX, _INT8_MAX
            ).astype(np.int8)
            bn = blk["BatchNorm_0"]
            bn_scale = np.asarray(bn["scale"], np.float32)
            bn_bias = np.asarray(bn["bias"], np.float32)
            blocks.append(
                {
                    "kernel_i8": w_i8,
                    # acc_i32 * mult + bias == bf16-path conv+BN output
                    "mult": (scales[i] * w_scale * bn_scale).astype(
                        np.float32
                    ),
                    "bias": bn_bias,
                }
            )
        final = tower[f"ConvNormAct_{n_total - 1}"]["Conv_0"]
        qhead[tower_name] = {
            "blocks": blocks,
            "final": {
                "kernel": np.asarray(final["kernel"], np.float32),
                "bias": np.asarray(final["bias"], np.float32),
            },
            "scales": [float(s) for s in scales],
        }
    return qhead


# ---------------------------------------------------------------------------
# Quantized forward
# ---------------------------------------------------------------------------


def _conv(x: Array, w: Array, accum_dtype=None) -> Array:
    """Stride-1 conv with the model's torch-style fixed (k-1)//2 padding."""
    kh, kw = w.shape[0], w.shape[1]
    pad = (
        ((kh - 1) // 2, (kh - 1) - (kh - 1) // 2),
        ((kw - 1) // 2, (kw - 1) - (kw - 1) // 2),
    )
    dn = jax.lax.conv_dimension_numbers(
        x.shape, w.shape, ("NHWC", "HWIO", "NHWC")
    )
    kwargs = {}
    if accum_dtype is not None:
        kwargs["preferred_element_type"] = accum_dtype
    return jax.lax.conv_general_dilated(
        x, w, (1, 1), pad, dimension_numbers=dn, **kwargs
    )


def quantized_tower_apply(qtower: Dict[str, Any], feats: Array) -> Array:
    """int8 tower forward; numerically tracks the bf16 DenseHead path."""
    scales = qtower["scales"]
    x = jnp.clip(
        jnp.round(feats.astype(jnp.float32) / scales[0]), -_INT8_MAX, _INT8_MAX
    ).astype(jnp.int8)
    for i, blk in enumerate(qtower["blocks"]):
        acc = _conv(x, blk["kernel_i8"], accum_dtype=jnp.int32)
        y = acc.astype(jnp.float32) * blk["mult"] + blk["bias"]
        y = jax.nn.relu(y)
        if i + 1 < len(scales):
            # requantize straight to the next block's input scale
            x = jnp.clip(
                jnp.round(y / scales[i + 1]), -_INT8_MAX, _INT8_MAX
            ).astype(jnp.int8)
        else:
            x = y  # feeds the fp final conv
    final = qtower["final"]
    out = _conv(x.astype(jnp.bfloat16), final["kernel"].astype(jnp.bfloat16))
    return out.astype(jnp.float32) + final["bias"]


def quantized_head_apply(
    qhead: Dict[str, Any],
    multiscale: Dict[int, Array],
    tasks: Dict[int, Sequence[str]],
) -> Dict[int, Dict[int, Dict[str, Array]]]:
    """DetectionHead-forward clone over int8 towers.

    Output structure matches ``models/heads.py::DetectionHead.__call__``:
    ``{stride: {task_id: {"logits", "regressands"}}}``.
    """
    out: Dict[int, Dict[int, Dict[str, Array]]] = {}
    strides = sorted({_tower_stride(n) for n in qhead})
    for stride in strides:
        out[stride] = {}
        for task_id in tasks:
            task_id = int(task_id)
            out[stride][task_id] = {
                "logits": quantized_tower_apply(
                    qhead[f"cls_s{stride}_t{task_id}"], multiscale[stride]
                ),
                "regressands": quantized_tower_apply(
                    qhead[f"reg_s{stride}_t{task_id}"], multiscale[stride]
                ),
            }
    return out


# ---------------------------------------------------------------------------
# End-to-end serving predict
# ---------------------------------------------------------------------------


def make_quantized_forward(variables: Pytree, qhead: Dict[str, Any], det_cfg):
    """Forward fn: bf16 RangeNet backbone + int8 head towers.

    Returns the same ``{"head", "strided"}`` structure as
    ``Detector.__call__`` so the standard decoder applies unchanged.
    The backbone runs from the artifact's ``RangeNet_0`` subtree (module
    names are deterministic in the flax tree).
    """
    from range_view_3d_detection_tpu.models.backbone import RangeNet
    from range_view_3d_detection_tpu.models.detector import strided_views

    backbone = RangeNet(
        layers=det_cfg.layers,
        stem_type=det_cfg.stem_type,
        num_neighbors=det_cfg.num_neighbors,
        num_layers=det_cfg.num_stem_layers,
        projection_kernel_size=det_cfg.projection_kernel_size,
        remat=det_cfg.remat,
        stem_pallas=det_cfg.stem_pallas,
        dtype=det_cfg.compute_dtype,
        param_dtype=jnp.float32,
    )
    bb_vars = {
        "params": variables["params"]["RangeNet_0"],
        "batch_stats": variables.get("batch_stats", {}).get("RangeNet_0", {}),
    }
    tasks = det_cfg.tasks_dict

    def forward(feats: Array, cart: Array, mask: Array):
        maskf = mask[..., None].astype(jnp.float32)
        multiscale = backbone.apply(bb_vars, feats, cart, maskf, train=False)
        head_out = quantized_head_apply(qhead, multiscale, tasks)
        return {
            "head": head_out,
            "strided": strided_views(cart, mask, det_cfg),
        }

    return forward
