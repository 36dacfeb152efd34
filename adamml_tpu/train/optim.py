"""Two-optimizer setup.

The reference keeps separate SGD(main net) and Adam(policy net) optimizers,
rebuilt at every stage transition (reference train_adamml.py:250-257,
387-395, 520-528). Here each optimizer owns its parameter SUBTREE (the flax
param dict splits at 'main_net' / 'policy_net'), and stage freezing is a
static flag on the compiled step: frozen subtrees get neither updates nor
optimizer-state advancement -- exactly the requires_grad=False +
gated-optimizer-step semantics of the reference (utils/utils.py:395-400)
without DDP's find_unused_parameters crutch.

Update rules match torch exactly:
  SGD: L2 weight decay added to the gradient, heavy-ball momentum
       (dampening 0), optional nesterov.
  Adam: L2 decay added to the gradient (torch Adam, NOT AdamW), b1=0.9,
        b2=0.999, eps=1e-8, bias correction.
The learning rate is applied as a final scale at update time so the jitted
step takes lr as a plain scalar argument (no recompile per epoch).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax
import jax.flatten_util  # registers jax.flatten_util.ravel_pytree
import jax.numpy as jnp
import optax


def sgd_transform(momentum: float, nesterov: bool, weight_decay: float
                  ) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    if momentum:
        parts.append(optax.trace(decay=momentum, nesterov=nesterov))
    return optax.chain(*parts) if parts else optax.identity()


def adam_transform(weight_decay: float, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8) -> optax.GradientTransformation:
    parts = []
    if weight_decay:
        parts.append(optax.add_decayed_weights(weight_decay))
    parts.append(optax.scale_by_adam(b1=b1, b2=b2, eps=eps))
    return optax.chain(*parts)


@dataclasses.dataclass
class OptimizerBundle:
    """Transformation + its state over one parameter subtree."""

    tx: optax.GradientTransformation
    state: Any

    @classmethod
    def create(cls, tx: optax.GradientTransformation, params) -> "OptimizerBundle":
        return cls(tx=tx, state=tx.init(params))

    def update(self, grads, params, lr):
        updates, new_state = self.tx.update(grads, self.state, params)
        new_params = jax.tree_util.tree_map(
            lambda p, u: p - lr * u.astype(p.dtype), params, updates)
        return new_params, OptimizerBundle(self.tx, new_state)


@dataclasses.dataclass(frozen=True)
class FusedSGD:
    """torch-SGD over ONE raveled parameter vector.

    The per-tensor optax path emits one update per parameter tensor
    (hundreds of tiny elementwise kernels); raveling collapses the whole
    update into a handful of full-width passes, which measures dramatically
    faster on the TPU runtime (see tools/bench_update.py / BENCH.md).
    Matches torch SGD exactly: L2 decay added to the grad, heavy-ball
    momentum (dampening 0), optional nesterov.
    """

    momentum: float
    nesterov: bool
    weight_decay: float

    def init(self, params):
        if not self.momentum:
            return {}
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return {"trace": jnp.zeros_like(flat)}

    def apply(self, grads, state, params, lr):
        """(new_params, new_state); lr applied here (scalar arg, no
        recompiles across epochs)."""
        flat_p, unravel = jax.flatten_util.ravel_pytree(params)
        flat_g, _ = jax.flatten_util.ravel_pytree(grads)
        flat_g = flat_g.astype(jnp.float32)
        g = flat_g + self.weight_decay * flat_p if self.weight_decay else flat_g
        if self.momentum:
            v = self.momentum * state["trace"] + g
            upd = g + self.momentum * v if self.nesterov else v
            state = {"trace": v}
        else:
            upd = g
        return unravel(flat_p - lr * upd), state


@dataclasses.dataclass(frozen=True)
class FusedAdam:
    """torch-Adam (L2 decay in the grad, NOT AdamW) over one raveled
    vector; bias-corrected, eps outside the sqrt like torch/optax."""

    weight_decay: float
    b1: float = 0.9
    b2: float = 0.999
    eps: float = 1e-8

    def init(self, params):
        flat, _ = jax.flatten_util.ravel_pytree(params)
        return {"mu": jnp.zeros_like(flat), "nu": jnp.zeros_like(flat),
                "count": jnp.zeros((), jnp.int32)}

    def apply(self, grads, state, params, lr):
        flat_p, unravel = jax.flatten_util.ravel_pytree(params)
        flat_g, _ = jax.flatten_util.ravel_pytree(grads)
        flat_g = flat_g.astype(jnp.float32)
        g = flat_g + self.weight_decay * flat_p if self.weight_decay else flat_g
        count = state["count"] + 1
        mu = self.b1 * state["mu"] + (1.0 - self.b1) * g
        nu = self.b2 * state["nu"] + (1.0 - self.b2) * jnp.square(g)
        t = count.astype(jnp.float32)
        mu_hat = mu / (1.0 - self.b1 ** t)
        nu_hat = nu / (1.0 - self.b2 ** t)
        upd = mu_hat / (jnp.sqrt(nu_hat) + self.eps)
        new_state = {"mu": mu, "nu": nu, "count": count}
        return unravel(flat_p - lr * upd), new_state


def build_optimizer(kind: str, cfg_optim):
    """Measured defaults (BENCH.md): FusedSGD beats per-tensor SGD (1.3x in
    isolation) so main uses it; fused Adam LOSES in the full step (82.9 vs
    69.5 ms policy-phase flagship -- the 3 extra ravel/unravel passes over
    its two state vectors outweigh the per-tensor overhead), so policy keeps
    per-tensor optax Adam. --no_fused_update forces per-tensor everywhere."""
    fused = getattr(cfg_optim, "fused_update", True)
    if kind == "main":  # SGD (reference train_adamml.py:254-257)
        if fused:
            return FusedSGD(cfg_optim.momentum, cfg_optim.nesterov,
                            cfg_optim.weight_decay)
        return sgd_transform(cfg_optim.momentum, cfg_optim.nesterov,
                             cfg_optim.weight_decay)
    if kind == "policy":  # Adam (reference train_adamml.py:251)
        return adam_transform(cfg_optim.weight_decay)
    raise ValueError(kind)


def clip_by_global_norm(grads, max_norm: Optional[float]):
    """Whole-model global-norm clip (reference utils/utils.py:392-393)."""
    if max_norm is None:
        return grads
    norm = optax.global_norm(grads)
    scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
    return jax.tree_util.tree_map(lambda g: g * scale, grads)
