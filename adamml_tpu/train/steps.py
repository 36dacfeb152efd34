"""Jitted train / eval steps.

One compiled step covers forward, loss, backward, clip, masked two-optimizer
update, and on-device metrics. Stage freezing is a static flag -- frozen
subtrees are dead code to XLA, matching the reference's gated optimizer
stepping (reference utils/utils.py:395-400). BatchNorm statistics update for
BOTH subnets whenever training (the reference's model.train() covers the
frozen net too, reference utils/utils.py:335).

Under GSPMD jit with the batch sharded over the mesh 'data' axis, every
batch reduction here (BN moments, loss means, metric means) is a GLOBAL
reduction -- XLA inserts the collectives. Gradient all-reduce falls out of
params being replicated. This subsumes the reference's DDP all-reduce +
explicit metric all_reduce (reference utils/utils.py:369-377) and its opt-in
SyncBN (train_adamml.py:125-127), which becomes the default semantic.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from .losses import compute_policy_loss, cross_entropy
from .optim import clip_by_global_norm
from .train_state import AdaMMLTrainState, StageFlags


def _apply_update(tx, grads, opt_state, params, lr):
    """One optimizer update. Fused optimizers (optim.FusedSGD/FusedAdam)
    consume/produce the raveled vector in a handful of full-width kernels;
    the optax path emits per-tensor updates."""
    if hasattr(tx, "apply"):
        return tx.apply(grads, opt_state, params, lr)
    updates, new_state = tx.update(grads, opt_state, params)
    new_params = jax.tree_util.tree_map(
        lambda p, u: p - lr * u.astype(p.dtype), params, updates)
    return new_params, new_state


def _step_rngs(rng: jax.Array, step: jax.Array) -> dict:
    base = jax.random.fold_in(rng, step)
    return {"gumbel": jax.random.fold_in(base, 0),
            "dropout": jax.random.fold_in(base, 1),
            "policy": jax.random.fold_in(base, 2)}


def _topk_metrics(logits: jax.Array, targets: jax.Array) -> dict:
    """Mean top-1/top-5 in percent; multi-hot targets count top-1 hits on any
    positive class."""
    if targets.ndim > 1:
        top1 = jnp.argmax(logits, axis=-1)
        hit1 = jnp.take_along_axis(targets, top1[:, None], axis=1)[:, 0] > 0
        return {"top1": 100.0 * jnp.mean(hit1.astype(jnp.float32)),
                "top5": jnp.asarray(0.0)}
    k = min(5, logits.shape[-1])
    _, pred = jax.lax.top_k(logits, k)
    correct = pred == targets[:, None]
    top1 = 100.0 * jnp.mean(correct[:, 0].astype(jnp.float32))
    top5 = 100.0 * jnp.mean(jnp.any(correct, axis=1).astype(jnp.float32))
    return {"top1": top1, "top5": top5}


def _adamml_step_fn(model, tx_main, tx_policy, *, flags: StageFlags,
                    penalty_type: str, gammas: float,
                    clip_gradient: Optional[float], has_policy_params: bool):
    """The raw (unjitted) AdaMML train step: (state, inputs, target, lr,
    p_lr, cost_weights, rng) -> (state, metrics)."""

    def step(state: AdaMMLTrainState, inputs, target, lr, p_lr,
             cost_weights, rng):
        rngs = _step_rngs(rng, state.step)

        # Differentiate ONLY the unfrozen subtree(s): the reference freezes
        # via requires_grad=False so torch never runs the frozen net's
        # backward (models/adamml.py:114-132). XLA does DCE the dead
        # backward either way (measured: identical step time and compiled
        # cost), but making the freeze explicit at the AD level keeps the
        # semantics verifiable in the jaxpr rather than an optimizer detail.
        def subtree_live(k):
            return ((k == "main_net" and flags.update_main)
                    or (k == "policy_net" and flags.update_policy
                        and has_policy_params))

        live = {k: v for k, v in state.params.items() if subtree_live(k)}
        frozen = {k: jax.lax.stop_gradient(v)
                  for k, v in state.params.items() if not subtree_live(k)}

        def loss_fn(live_params):
            params = {**frozen, **live_params}
            (logits, decisions), mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, state.temperature, train=True,
                mutable=["batch_stats"], rngs=rngs)
            cls_loss = cross_entropy(logits, target)
            policy_loss = compute_policy_loss(
                penalty_type, decisions, cost_weights, gammas, logits, target)
            total = cls_loss
            if flags.update_policy:
                # reference utils/utils.py:379-382
                total = total + policy_loss
            return total, (logits, decisions, mut["batch_stats"], cls_loss,
                           policy_loss)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(live)
        logits, decisions, new_stats, cls_loss, policy_loss = aux
        # reference clips over model.parameters() where frozen params carry
        # no grads (utils/utils.py:392-393) == clipping the live subtree
        grads = clip_by_global_norm(grads, clip_gradient)

        params = dict(state.params)
        main_opt, policy_opt = state.main_opt, state.policy_opt
        if flags.update_main:
            params["main_net"], main_opt = _apply_update(
                tx_main, grads["main_net"], state.main_opt,
                params["main_net"], lr)
        if flags.update_policy and has_policy_params:
            params["policy_net"], policy_opt = _apply_update(
                tx_policy, grads["policy_net"], state.policy_opt,
                params["policy_net"], p_lr)

        metrics = {"loss": loss, "cls_loss": cls_loss,
                   "policy_loss": policy_loss,
                   "selection": jnp.mean(decisions, axis=(0, 1)),  # (M,)
                   **_topk_metrics(logits, target)}
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  main_opt=main_opt, policy_opt=policy_opt,
                                  step=state.step + 1)
        return new_state, metrics

    return step


def make_adamml_train_step(model, tx_main, tx_policy, *,
                           flags: StageFlags, penalty_type: str,
                           gammas: float, clip_gradient: Optional[float],
                           has_policy_params: bool):
    """Returns jit(step)(state, inputs, target, lr, p_lr, cost_weights, rng)
    -> (state, metrics)."""
    return jax.jit(_adamml_step_fn(
        model, tx_main, tx_policy, flags=flags, penalty_type=penalty_type,
        gammas=gammas, clip_gradient=clip_gradient,
        has_policy_params=has_policy_params), donate_argnums=(0,))


def make_adamml_multi_step(model, tx_main, tx_policy, *, flags: StageFlags,
                           penalty_type: str, gammas: float,
                           clip_gradient: Optional[float],
                           has_policy_params: bool):
    """K REAL optimizer steps per device dispatch, as one lax.scan.

    Identical math to K calls of the single step (each scan iteration
    consumes its own batch and applies its own update; the per-step rng is
    fold_in(rng, state.step) exactly as in the single step). What changes is
    the execution shape: one dispatch, one output materialization, and one
    host round-trip amortize over K steps -- the TPU-idiomatic answer to
    per-step fixed costs (host dispatch, buffer donation bookkeeping,
    transport overhead on relayed runtimes).

    Signature: jit(multi)(state, stacked_inputs, stacked_targets, lr, p_lr,
    cost_weights, rng) -> (state, metrics with leading K axis), where
    stacked_inputs is the per-modality list with a leading K axis.
    """
    inner = _adamml_step_fn(
        model, tx_main, tx_policy, flags=flags, penalty_type=penalty_type,
        gammas=gammas, clip_gradient=clip_gradient,
        has_policy_params=has_policy_params)

    def multi(state, stacked_inputs, stacked_targets, lr, p_lr,
              cost_weights, rng):
        def body(st, xs):
            *inputs, target = xs
            return inner(st, list(inputs), target, lr, p_lr, cost_weights,
                         rng)

        return jax.lax.scan(body, state,
                            tuple(stacked_inputs) + (stacked_targets,))

    return jax.jit(multi, donate_argnums=(0,))


def make_adamml_eval_step(model, num_crops: int = 1):
    """Returns jit(step)(state, inputs, target, rng) ->
    (logits, decisions, loss). Gumbel noise is still sampled at eval, as in
    the reference (F.gumbel_softmax samples under model.eval()).

    num_crops > 1 (multi-crop oversample eval, reference GroupOverSample):
    inputs carry N*num_crops rows (crops folded into batch by the device
    pipeline); logits average over the crops and the reported decisions are
    the canonical center-unflipped crop's."""

    def step(state: AdaMMLTrainState, inputs, target, rng):
        rngs = _step_rngs(rng, state.step)
        logits, decisions = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs, state.temperature, train=False, rngs=rngs)
        if num_crops > 1:
            from ..data.aug_params import OVERSAMPLE_CENTER

            logits = jnp.mean(
                logits.reshape((-1, num_crops) + logits.shape[1:]), axis=1)
            decisions = decisions.reshape(
                (-1, num_crops) + decisions.shape[1:])[
                    :, OVERSAMPLE_CENTER[num_crops]]
        loss = cross_entropy(logits, target)
        return logits, decisions, loss

    return jax.jit(step)


def make_unimodal_train_step(model, tx, *, clip_gradient: Optional[float]):
    """Single-backbone step for train_unimodal (reference
    utils/utils.py:187-265). state.policy_opt is unused (None)."""

    def step(state: AdaMMLTrainState, inputs, target, lr, rng):
        rngs = _step_rngs(rng, state.step)

        def loss_fn(params):
            logits, mut = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                inputs, train=True, mutable=["batch_stats"], rngs=rngs)
            return cross_entropy(logits, target), (logits, mut["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(state.params)
        grads = clip_by_global_norm(grads, clip_gradient)
        params, main_opt = _apply_update(tx, grads, state.main_opt,
                                         state.params, lr)
        metrics = {"loss": loss, **_topk_metrics(logits, target)}
        new_state = state.replace(params=params, batch_stats=new_stats,
                                  main_opt=main_opt, step=state.step + 1)
        return new_state, metrics

    return jax.jit(step, donate_argnums=(0,))


def make_unimodal_eval_step(model, num_crops: int = 1):
    def step(state: AdaMMLTrainState, inputs, target, rng):
        rngs = _step_rngs(rng, state.step)
        logits = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats},
            inputs, train=False, rngs=rngs)
        if num_crops > 1:  # oversample: crops folded into batch; average
            logits = jnp.mean(
                logits.reshape((-1, num_crops) + logits.shape[1:]), axis=1)
        loss = cross_entropy(logits, target)
        return logits, loss

    return jax.jit(step)
