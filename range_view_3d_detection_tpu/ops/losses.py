"""Classification / regression losses.

Capability parity with ``src/torchbox3d/nn/functional/__init__.py`` (8-49)
and ``src/torchbox3d/nn/losses/classification.py`` — pure-JAX elementwise
formulations that XLA fuses into the surrounding computation.

All losses return *unreduced* per-element values (the reference uses
``reduction: "none"`` and normalizes downstream in
``reduce_multiscale_loss``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array


def sigmoid_bce(logits: Array, targets: Array) -> Array:
    """Numerically-stable binary cross-entropy with logits (elementwise)."""
    # max(x, 0) - x*t + log(1 + exp(-|x|))
    return (
        jnp.maximum(logits, 0.0)
        - logits * targets
        + jnp.log1p(jnp.exp(-jnp.abs(logits)))
    )


def varifocal_loss(
    logits: Array, targets: Array, *, alpha: float = 0.75, gamma: float = 2.0
) -> Array:
    """Varifocal loss (VFNet): target-weighted BCE on foreground, down-weighted
    background by ``alpha * p^gamma``.

    Parity with ``varifocal_loss`` (``nn/functional/__init__.py:8-27``):
    foreground = target > 0 weighted by the (soft, IoU/affinity) target;
    background = target == 0.
    """
    bce = sigmoid_bce(logits, targets)
    p = jax.nn.sigmoid(logits)
    fg = (targets > 0.0).astype(bce.dtype)
    bg = (targets == 0.0).astype(bce.dtype)
    return fg * targets * bce + alpha * bg * jnp.power(p, gamma) * bce


def focal_loss(
    logits: Array, targets: Array, *, alpha: float = 0.25, gamma: float = 2.0
) -> Array:
    """Sigmoid focal loss (RetinaNet), elementwise.

    The reference's ``FocalLoss`` delegates to torchvision's
    ``sigmoid_focal_loss`` with default alpha/gamma
    (``losses/classification.py:82``).
    """
    bce = sigmoid_bce(logits, targets)
    p = jax.nn.sigmoid(logits)
    p_t = p * targets + (1.0 - p) * (1.0 - targets)
    loss = bce * jnp.power(1.0 - p_t, gamma)
    if alpha >= 0:
        alpha_t = alpha * targets + (1.0 - alpha) * (1.0 - targets)
        loss = alpha_t * loss
    return loss


def penalty_reduced_focal_loss(
    logits: Array, targets: Array, *, alpha: float, gamma: float
) -> Array:
    """CenterNet-style penalty-reduced focal loss
    (``nn/functional/__init__.py:30-49``).

    Parity note: like the reference, the background term multiplies the
    penalty by the *soft-target* BCE (``-t log p - (1-t) log(1-p)``),
    not canonical CenterNet's pure ``-log(1-p)``; for soft targets near
    1 the dominant term rewards raising ``p``. The reference ships the
    same formula (and never uses this loss in its active configs), so
    the deviation is reproduced rather than silently "fixed"."""
    bce = sigmoid_bce(logits, targets)
    p = jax.nn.sigmoid(logits)
    fg = (targets == 1.0).astype(bce.dtype)
    bg_penalty = jnp.power(1.0 - targets, 4.0)
    fg_loss = fg * jnp.power(1.0 - p, gamma) * bce
    bg_loss = alpha * bg_penalty * jnp.power(p, gamma) * bce
    return fg_loss + bg_loss


def l1_loss(inputs: Array, targets: Array) -> Array:
    """Elementwise L1 (reference uses ``torch.nn.L1Loss(reduction="none")``)."""
    return jnp.abs(inputs - targets)
