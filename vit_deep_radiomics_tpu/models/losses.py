"""Focal and cross-modal focal losses.

Math-parity implementations of the reference losses
(/root/reference/src/train_models.py:332-405), including PyTorch
``nll_loss`` weighting semantics:

* ``reduction='sum'``  → Σᵢ αᵧᵢ · ℓᵢ                  (FocalLoss, :404)
* ``reduction='mean'`` → Σᵢ αᵧᵢ · ℓᵢ / Σᵢ αᵧᵢ         (CrossModal, :364-375)

Both take one-hot targets (the trainer feeds one-hot labels,
train_models.py:136-139) and an optional per-example weight vector so
padded batch entries drop out under static shapes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["focal_loss", "cross_modal_focal_loss"]


def _prep(targets_onehot, alpha, num_classes):
    class_idx = jnp.argmax(targets_onehot, axis=-1)
    if alpha is None:
        alpha = jnp.ones((num_classes,), jnp.float32)
    else:
        alpha = jnp.asarray(alpha, jnp.float32)
    return class_idx, alpha


def focal_loss(
    logits: jax.Array,
    targets_onehot: jax.Array,
    gamma: float = 2.0,
    alpha=None,
    example_weight: jax.Array | None = None,
) -> jax.Array:
    """Multi-class focal loss, sum reduction (train_models.py:381-405).

    loss = Σᵢ αᵧᵢ · (1 - pᵧᵢ)^γ · (-log pᵧᵢ)
    """
    logits = jnp.atleast_2d(logits).astype(jnp.float32)
    targets_onehot = jnp.atleast_2d(targets_onehot)
    class_idx, alpha = _prep(targets_onehot, alpha, logits.shape[-1])

    logpt = jax.nn.log_softmax(logits, axis=-1)
    pt = jnp.exp(logpt)
    focal = (1.0 - pt) ** gamma * logpt
    picked = jnp.take_along_axis(focal, class_idx[:, None], axis=-1)[:, 0]
    w = alpha[class_idx]
    if example_weight is not None:
        w = w * jnp.asarray(example_weight, jnp.float32)
    return -jnp.sum(w * picked)


def cross_modal_focal_loss(
    logits_petct: jax.Array,
    logits_ct: jax.Array,
    logits_pet: jax.Array,
    targets_onehot: jax.Array,
    gamma_bimodal: float = 1.0,
    gamma_unimodal: float = 2.0,
    alpha=None,
    beta: float = 0.6,
    eps: float = 1e-8,
    example_weight: jax.Array | None = None,
) -> jax.Array:
    """Cross-modal focal loss (train_models.py:332-378).

    The joint term is a focal loss with γ_bimodal; the per-modality terms
    are gated by the harmonic-mean agreement
    ``pt_mean = 2·pt_ct·pt_pet / (pt_ct + pt_pet + ε)`` so a modality is
    down-weighted when both modalities already agree confidently:

    total = β·L_petct + (1-β)·(L_ct + L_pet),  each L a weighted mean.
    """
    logits_petct = jnp.atleast_2d(logits_petct).astype(jnp.float32)
    logits_ct = jnp.atleast_2d(logits_ct).astype(jnp.float32)
    logits_pet = jnp.atleast_2d(logits_pet).astype(jnp.float32)
    targets_onehot = jnp.atleast_2d(targets_onehot)
    class_idx, alpha = _prep(targets_onehot, alpha, logits_petct.shape[-1])

    logpt_joint = jax.nn.log_softmax(logits_petct, axis=-1)
    logpt_ct = jax.nn.log_softmax(logits_ct, axis=-1)
    logpt_pet = jax.nn.log_softmax(logits_pet, axis=-1)

    pt_joint = jnp.exp(logpt_joint)
    pt_ct = jnp.exp(logpt_ct)
    pt_pet = jnp.exp(logpt_pet)
    pt_mean = (2.0 * pt_ct * pt_pet) / (pt_ct + pt_pet + eps)

    def weighted_mean_nll(modulated_logpt):
        picked = jnp.take_along_axis(
            modulated_logpt, class_idx[:, None], axis=-1
        )[:, 0]
        w = alpha[class_idx]
        if example_weight is not None:
            w = w * jnp.asarray(example_weight, jnp.float32)
        return -jnp.sum(w * picked) / jnp.maximum(jnp.sum(w), eps)

    loss_joint = weighted_mean_nll((1.0 - pt_joint) ** gamma_bimodal * logpt_joint)
    loss_ct = weighted_mean_nll((1.0 - pt_mean * pt_ct) ** gamma_unimodal * logpt_ct)
    loss_pet = weighted_mean_nll((1.0 - pt_mean * pt_pet) ** gamma_unimodal * logpt_pet)

    return beta * loss_joint + (1.0 - beta) * (loss_ct + loss_pet)
