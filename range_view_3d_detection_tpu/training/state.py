"""Train state + jitted train/eval steps.

The reference's Lightning ``training_step``/``validation_step`` hooks
(``nn/arch/detector.py:238-247,316-390``) become two pure functions closed
over a static ``DetectorConfig`` and compiled once. BatchNorm statistics
live in a ``batch_stats`` collection carried through the state.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Tuple

import flax
import jax
import jax.numpy as jnp
import optax
from jax import Array

from range_view_3d_detection_tpu.models.decoder import DecoderConfig, decode
from range_view_3d_detection_tpu.models.detector import (
    Detector,
    DetectorConfig,
    compute_batch_targets,
    detection_loss,
)


@flax.struct.dataclass
class TrainState:
    step: Array
    params: Any
    batch_stats: Any
    opt_state: Any


def create_state(
    rng: Array,
    config: DetectorConfig,
    tx: optax.GradientTransformation,
    sample_batch: Dict[str, Array],
) -> TrainState:
    import numpy as np

    from range_view_3d_detection_tpu.parallel.mesh import fetch_local

    model = Detector(config)
    # Initialize from host copies so init never mixes device placements
    # (the sample batch may already be sharded over a mesh — multi-host,
    # only this process's rows are addressable); callers device_put the
    # returned state onto their mesh.
    variables = model.init(
        rng,
        np.asarray(fetch_local(sample_batch["features"])[:1]),
        np.asarray(fetch_local(sample_batch["cart"])[:1]),
        np.asarray(fetch_local(sample_batch["mask"])[:1]),
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
    )


def make_train_step(
    config: DetectorConfig,
    tx: optax.GradientTransformation,
    *,
    quant_tree: Any = None,
    state_shardings: Any = None,
):
    """Jitted train step; with ``quant_tree`` (a calibrated ``quant``
    collection, models/quantized.py) the forward runs under the "qat"
    context — STE fake-quant on every scale-bearing conv — so fine-tuning
    optimizes the weights against serving-time int8 quantization error.
    Scales stay frozen (standard QAT practice: ranges fixed, weights
    adapt); only params train.

    ``state_shardings``: a TrainState-shaped tree of ``NamedSharding``
    (e.g. ``parallel.mesh.zero1_state_sharding``) pinned onto the output
    state, so sharded optimizer moments stay sharded across steps
    (without the constraint XLA may re-replicate them — or worse, pick a
    different output sharding than the input's, forcing a recompile
    every step)."""
    model = Detector(config)

    def apply_model(params, batch_stats, features, cart, mask):
        # Per-stage rematerialization (config.remat) is wired inside the
        # modules via nn.remat.
        variables = {"params": params, "batch_stats": batch_stats}
        if quant_tree is not None:
            variables["quant"] = quant_tree
            from range_view_3d_detection_tpu.models.quantized import (
                quantization,
            )

            with quantization("qat"):
                return model.apply(
                    variables,
                    features,
                    cart,
                    mask,
                    train=True,
                    mutable=["batch_stats"],
                )
        return model.apply(
            variables,
            features,
            cart,
            mask,
            train=True,
            mutable=["batch_stats"],
        )

    # Donate the previous state: params/opt-state buffers are reused
    # in-place (ignored on CPU; saves ~0.5 GB HBM for the flagship).
    @functools.partial(jax.jit, donate_argnums=(0,))
    def train_step(
        state: TrainState, batch: Dict[str, Array]
    ) -> Tuple[TrainState, Dict[str, Array]]:
        # Targets are param-independent: compute them outside the
        # differentiated closure so their buffers (interior masks etc.)
        # are free to be released before the backward pass.
        tgts = jax.lax.stop_gradient(compute_batch_targets(batch, config))

        # Rematerialize the loss region (config.remat): the affinity +
        # varifocal + L1 elementwise chains hold several hundred MB of
        # (B, H, W, C) fp32 intermediates for the backward pass;
        # recomputing them from the (much smaller) head outputs frees that
        # headroom — together with the stem layout fix this is what lets
        # flagship batch 2 train on a 16 GB chip (costs ~6% step time).
        def loss_from_outputs(outputs):
            return detection_loss(outputs, batch, config, tgts=tgts)

        if config.remat and "loss" in config.remat_scope:
            loss_from_outputs = jax.checkpoint(loss_from_outputs)

        def loss_fn(params):
            outputs, mutated = apply_model(
                params,
                state.batch_stats,
                batch["features"],
                batch["cart"],
                batch["mask"],
            )
            loss, metrics = loss_from_outputs(outputs)
            return loss, (metrics, mutated["batch_stats"])

        (loss, (metrics, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(state.params)
        updates, new_opt_state = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        metrics["grad_norm"] = optax.global_norm(grads)
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_stats,
            opt_state=new_opt_state,
        )
        if state_shardings is not None:
            new_state = jax.lax.with_sharding_constraint(
                new_state, state_shardings
            )
        return new_state, metrics

    return train_step


def make_eval_step(
    config: DetectorConfig,
    decoder_config: DecoderConfig,
    *,
    use_nms: bool = True,
):
    """Validation forward + decode (``validation_step``, detector.py:316-390).

    Inference runs the net in eval mode (running BN stats, fp16-autocast in
    the reference -> bf16 compute here) and decodes to fixed-size
    detections on device.
    """
    model = Detector(config)
    tasks = config.tasks_dict

    @jax.jit
    def eval_step(state: TrainState, batch: Dict[str, Array]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["features"],
            batch["cart"],
            batch["mask"],
            train=False,
        )
        return decode(outputs, decoder_config, tasks, use_nms=use_nms)

    return eval_step


def make_val_step(
    config: DetectorConfig,
    decoder_config: DecoderConfig,
    *,
    use_nms: bool = True,
):
    """Validation step with loss computation + decoding in one jit
    (``validation_step`` computes both — detector.py:316-390)."""
    model = Detector(config)
    tasks = config.tasks_dict

    @jax.jit
    def val_step(state: TrainState, batch: Dict[str, Array]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["features"],
            batch["cart"],
            batch["mask"],
            train=False,
        )
        _, metrics = detection_loss(outputs, batch, config)
        result = decode(outputs, decoder_config, tasks, use_nms=use_nms)
        val_metrics = {f"val/{k}": v for k, v in metrics.items()}
        return result, val_metrics

    return val_step


def make_scoremap_step(config: DetectorConfig):
    """Per-stride range-image panels for training visualization: max-class
    score map per task plus the strided validity mask, image 0 only (the
    per-stride score/likelihood panels of the reference's
    ``rendering/tensorboard.py:354-387``, logged every ``train_log_freq``).
    """
    model = Detector(config)

    @jax.jit
    def scoremap_step(state: TrainState, batch: Dict[str, Array]):
        outputs = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            batch["features"],
            batch["cart"],
            batch["mask"],
            train=False,
        )
        maps: Dict[str, Array] = {}
        for stride in sorted(outputs["head"]):
            for tid in sorted(outputs["head"][stride]):
                logits = outputs["head"][stride][tid]["logits"]
                maps[f"stride{stride}/task{tid}/score"] = jax.nn.sigmoid(
                    logits[0].astype(jnp.float32)
                ).max(axis=-1)
            maps[f"stride{stride}/mask"] = (
                outputs["strided"][stride]["mask"][0].astype(jnp.float32)
            )
        return maps

    return scoremap_step


def make_forward(config: DetectorConfig):
    """Plain jittable forward (benchmark / graft entry)."""
    model = Detector(config)

    @jax.jit
    def forward(variables, features, cart, mask):
        return model.apply(variables, features, cart, mask, train=False)

    return forward
