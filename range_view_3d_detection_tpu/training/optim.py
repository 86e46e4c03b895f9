"""Optimizer + LR schedule.

Capability parity with ``src/torchbox3d/nn/meta/arch.py::configure_optimizers``
(47-75): AdamW + OneCycle stepped per optimizer step, optional
``max_lr *= sqrt(num_devices * batch_size)`` scaling, and global-norm
gradient clipping (``conf/trainer/train.yaml:12`` — clip 35.0).

``optax.cosine_onecycle_schedule`` matches torch ``OneCycleLR`` defaults
(cos annealing, pct_start=0.3, div_factor=25, final_div_factor=1e4).
"""

from __future__ import annotations

import math

import optax


def onecycle_schedule(
    max_lr: float,
    total_steps: int,
    *,
    pct_start: float = 0.3,
    div_factor: float = 25.0,
    final_div_factor: float = 1e4,
) -> optax.Schedule:
    return optax.cosine_onecycle_schedule(
        transition_steps=max(total_steps, 1),
        peak_value=max_lr,
        pct_start=pct_start,
        div_factor=div_factor,
        final_div_factor=final_div_factor,
    )


def scaled_max_lr(
    max_lr: float, num_devices: int, batch_size: int, *, enable: bool
) -> float:
    """sqrt linear LR scaling (``nn/meta/arch.py:63-66``)."""
    if enable:
        return max_lr * math.sqrt(num_devices * batch_size)
    return max_lr


def make_optimizer(
    max_lr: float,
    total_steps: int,
    *,
    weight_decay: float = 0.01,
    grad_clip_norm: float = 35.0,
    num_devices: int = 1,
    batch_size: int = 1,
    use_linear_lr_scaling: bool = False,
    debug: bool = False,
    accumulate_steps: int = 1,
) -> tuple[optax.GradientTransformation, optax.Schedule]:
    """AdamW + OneCycle + clip-by-global-norm.

    In debug mode the reference skips the scheduler entirely
    (``nn/meta/arch.py:58-59``) — constant LR.

    ``accumulate_steps`` > 1 reproduces PyTorch-Lightning's
    ``accumulate_grad_batches``: micro-batch gradients are averaged for
    k steps and the (clipped) update applies on the k-th — how the
    reference's SOTA global batch 16 (4 GPUs x batch 4,
    ``scripts/train.sh``) fits on a 16 GB v5e chip that holds batch 2.
    ``total_steps`` counts OPTIMIZER steps (micro steps / k); the sqrt
    LR rule scales by the effective global batch, matching the
    reference's semantics where ``batch_size`` is already the
    per-optimizer-step batch.
    """
    lr = scaled_max_lr(
        max_lr,
        num_devices,
        batch_size * max(accumulate_steps, 1),
        enable=use_linear_lr_scaling,
    )
    if debug:
        schedule: optax.Schedule = optax.constant_schedule(lr)
    else:
        schedule = onecycle_schedule(lr, total_steps)
    tx = optax.chain(
        optax.clip_by_global_norm(grad_clip_norm),
        optax.adamw(learning_rate=schedule, weight_decay=weight_decay),
    )
    if accumulate_steps > 1:
        # MultiSteps keeps the running MEAN of the k micro-gradients and
        # applies the inner chain (clip-after-accumulation, like PTL) on
        # the k-th; inner schedule counts advance per applied update.
        tx = optax.MultiSteps(
            tx, every_k_schedule=accumulate_steps
        ).gradient_transformation()
    return tx, schedule
