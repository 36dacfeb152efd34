"""Straight-through Gumbel-softmax.

Matches torch.nn.functional.gumbel_softmax(hard=True) semantics used by the
reference policy head (reference models/policy_net.py:283-290): forward pass
emits a hard one-hot of the perturbed argmax; backward pass uses the soft
softmax gradient (straight-through estimator). The decision is the LAST
column of the 2-way one-hot (reference models/policy_net.py:289).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def gumbel_softmax_hard(rng: jax.Array, logits: jax.Array, tau) -> jax.Array:
    """Hard ST Gumbel-softmax sample, shape = logits (... , K)."""
    gumbels = jax.random.gumbel(rng, logits.shape, dtype=logits.dtype)
    y_soft = jax.nn.softmax((logits + gumbels) / tau, axis=-1)
    idx = jnp.argmax(y_soft, axis=-1)
    y_hard = jax.nn.one_hot(idx, logits.shape[-1], dtype=logits.dtype)
    # forward: y_hard; backward: d(y_soft)
    return y_hard + y_soft - jax.lax.stop_gradient(y_soft)


def gumbel_decision(rng: jax.Array, logits: jax.Array, tau) -> jax.Array:
    """ON/OFF decision = last column of the hard 2-way sample
    (reference models/policy_net.py:283-290)."""
    return gumbel_softmax_hard(rng, logits, tau)[..., -1]
