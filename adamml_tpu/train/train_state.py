"""Training state containers.

One pytree carries everything the reference checkpoints (reference
train_adamml.py:373-383): params, BN running stats, both optimizer states,
the Gumbel temperature, and the step counter. Stage and epoch are host-side
ints kept by the curriculum driver.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
from flax import struct

# Curriculum stages (reference opts.py:77-78, train_adamml.py:334-626).
STAGES = ("warmup", "alternative_training", "finetune")


@dataclasses.dataclass(frozen=True)
class StageFlags:
    """Static per-phase flags compiled into the train step.

    warmup / finetune / alternating-main epochs train the main net with the
    policy frozen and zero cost weights (reference train_adamml.py:344-353,
    410-419, 552-564); alternating-policy epochs train the policy with the
    main net frozen and the configured cost weights (train_adamml.py:442-451).
    The policy loss enters the total only while the policy net is training
    (reference utils/utils.py:379-382).
    """

    update_main: bool
    update_policy: bool

    @classmethod
    def main_phase(cls) -> "StageFlags":
        return cls(update_main=True, update_policy=False)

    @classmethod
    def policy_phase(cls) -> "StageFlags":
        return cls(update_main=False, update_policy=True)


class AdaMMLTrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    main_opt: Any
    policy_opt: Any  # None when rng_policy or unimodal
    temperature: jnp.ndarray  # scalar f32 (Gumbel temperature)
    step: jnp.ndarray  # scalar i32

    @classmethod
    def create(cls, params, batch_stats, main_opt, policy_opt,
               temperature: float = 5.0) -> "AdaMMLTrainState":
        return cls(params=params, batch_stats=batch_stats, main_opt=main_opt,
                   policy_opt=policy_opt,
                   temperature=jnp.asarray(temperature, jnp.float32),
                   step=jnp.asarray(0, jnp.int32))
