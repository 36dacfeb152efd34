"""Losses: classification CE + the selection-penalty ("policy") loss.

compute_policy_loss mirrors reference utils/utils.py:166-184 exactly,
including the quirks documented in SURVEY.md: the blockdrop variant squares
the per-video mean selection, gates it on (detached) top-1 correctness, and
adds a `gammas * (1 - correct)` term that is constant w.r.t. parameters
(it shifts the logged loss but produces no gradient).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import optax


def cross_entropy(logits: jax.Array, targets: jax.Array) -> jax.Array:
    """Mean CE. Integer targets (N,) or soft/multi-hot targets (N, K)
    (the reference's nn.CrossEntropyLoss accepts both)."""
    if targets.ndim == 1:
        losses = optax.softmax_cross_entropy_with_integer_labels(
            logits, targets.astype(jnp.int32))
    else:
        losses = optax.softmax_cross_entropy(logits, targets)
    return jnp.mean(losses)


def compute_policy_loss(penalty_type: str, selection: jax.Array,
                        cost_weights: Sequence[float], gammas: float,
                        cls_logits: jax.Array, cls_targets: jax.Array
                        ) -> jax.Array:
    """selection: (N, S, M) 0/1 decisions (straight-through grads attached).

    'mean': sum_m w_m * mean(selection_m)            (reference utils.py:169-171)
    'blockdrop': correctness-gated squared per-video selection rate plus the
    constant gammas term                             (reference utils.py:173-183)
    """
    num_modality = selection.shape[-1]
    w = jnp.asarray(cost_weights, selection.dtype)
    if penalty_type == "mean":
        per_mod = jnp.mean(selection, axis=(0, 1))  # (M,)
        return jnp.sum(w * per_mod)
    if penalty_type != "blockdrop":
        raise ValueError(f"unknown penalty_type {penalty_type!r}")

    top1 = jnp.argmax(jax.lax.stop_gradient(cls_logits), axis=-1)
    if cls_targets.ndim > 1:  # multi-hot -> any positive class counts
        correct = jnp.take_along_axis(cls_targets, top1[:, None], axis=1)[:, 0]
        correct = (correct > 0).astype(cls_logits.dtype)
    else:
        correct = (top1 == cls_targets).astype(cls_logits.dtype)

    sel = jnp.mean(selection, axis=1)       # per-video per-modality rate (N, M)
    sel = sel * sel                          # squared
    gated = jnp.mean(correct[:, None] * sel, axis=0)  # (M,)
    loss = jnp.sum(w[:num_modality] * gated)
    # constant-w.r.t.-params logging term (reference utils/utils.py:183)
    loss = loss + jnp.mean((1.0 - correct) * gammas)
    return loss
