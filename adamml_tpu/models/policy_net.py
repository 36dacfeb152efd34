"""Policy (decision) network.

Capability twin of the reference policy stack (reference
models/policy_net.py:206-379): per-modality lightweight MobileNetV2 trunks at
160x160 -> concat -> 2-layer MLP(2048) -> LSTMCell(2048 + 2M -> 256) ->
per-modality Linear(256 -> 2) -> straight-through Gumbel decision.

TPU-first restructuring:
  * the reference computes joint features one segment at a time in a Python
    loop (models/policy_net.py:321-327); here all N*S segment feature
    extractions run as ONE batched conv workload (MXU stays full), and only
    the inherently sequential LSTM recurrence is a `lax.scan` over S;
  * the LSTM cell is a fused (feat ⊕ prev-logits) x 4H matmul with torch
    LSTMCell gate order (i, f, g, o) so checkpoints convert 1:1;
  * Gumbel noise comes from the 'gumbel' rng collection, split per scan step.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.gumbel import gumbel_decision
from .mobilenet_v2 import MobileNetV2

JOINT_DIM = 2048     # reference models/policy_net.py:227
LSTM_HIDDEN = 256    # reference models/policy_net.py:277


class _DecisionCell(nn.Module):
    """One LSTM step + decision heads (reference models/policy_net.py:341-365).

    carry: (h, c, prev_logits_flat, tau); x: joint features (N, JOINT_DIM).
    The recurrent input concatenates the previous segment's raw logits
    (zeros at t=0), flattened sample-major as (N, 2M).
    """

    num_modality: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, carry, feat):
        h, c, prev_logits, tau = carry
        feat = feat.astype(self.dtype)
        lstm_in = jnp.concatenate([feat, prev_logits.astype(self.dtype)], axis=-1)
        # torch LSTMCell: gates = W_ih x + b_ih + W_hh h + b_hh, order i,f,g,o
        gates = (nn.Dense(4 * LSTM_HIDDEN, dtype=self.dtype, name="ih")(lstm_in)
                 + nn.Dense(4 * LSTM_HIDDEN, dtype=self.dtype, name="hh")(h))
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c = nn.sigmoid(f) * c + nn.sigmoid(i) * jnp.tanh(g)
        h = nn.sigmoid(o) * jnp.tanh(c)
        logits = jnp.stack(
            [nn.Dense(2, dtype=self.dtype, name=f"fc_{m}")(h)
             for m in range(self.num_modality)], axis=0)  # (M, N, 2)
        logits = logits.astype(jnp.float32)
        decision = gumbel_decision(self.make_rng("gumbel"), logits, tau)  # (M, N)
        # feed raw logits forward, sample-major (reference policy_net.py:353)
        nxt = jnp.transpose(logits, (1, 0, 2)).reshape(h.shape[0], -1)
        return (h, c, nxt, tau), (decision, logits)


class PolicyNet(nn.Module):
    """Inputs: list of per-modality policy streams, each (N, S, F, H, W, C)
    (sound: (N, S, 1, 256, 256, 1)). Returns (decisions, logits) with shapes
    (S, M, N) and (S, M, N, 2), matching the reference contract
    (models/policy_net.py:372-373).
    """

    modality: Tuple[str, ...]
    causality_modeling: Optional[str] = "lstm"
    use_pallas_dw: bool = False
    # rematerialize the trunk conv stacks in the backward pass. The policy
    # backward can only run AFTER the loss, i.e. after the (much larger)
    # main-net forward -- without remat the trunk's saved activations sit on
    # top of the main net's peak for the whole step. Remat re-runs the cheap
    # trunk forward at backward time, when the main net's buffers are gone.
    remat_trunk: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1

    @nn.compact
    def __call__(self, p_x: Sequence[jax.Array], temperature, train: bool = False):
        num_modality = len(self.modality)
        n, s = p_x[0].shape[0], p_x[0].shape[1]

        trunk_cls = MobileNetV2
        if self.remat_trunk:
            # static_argnums: 0 is self; (x, train, features) -> 2, 3 static
            trunk_cls = nn.remat(MobileNetV2, static_argnums=(2, 3))
        feats = []
        for m_i, m in enumerate(self.modality):
            x = p_x[m_i]
            # fold segments into batch, clip-major (free reshape): the
            # reference's policy trunk runs once per segment
            # (models/policy_net.py:321-327); its per-segment train-mode BN
            # moments are recovered by GroupedBatchNorm's interleaved
            # (clips, segments, frames) factorization (seq_groups)
            xf = x.reshape((n * s,) + x.shape[2:])
            trunk = trunk_cls(temporal_pooling=True,
                              use_pallas_dw=self.use_pallas_dw,
                              dtype=self.dtype,
                              bn_axis_name=self.bn_axis_name,
                              bn_groups=self.bn_groups,
                              bn_seq_groups=self.bn_seq_groups,
                              name=f"net_{m}")
            f = trunk(xf, train, True)  # (N*S, F_out, 1280)
            feats.append(jnp.mean(f, axis=1))  # F_out == 1 in reference configs
        joint = jnp.concatenate(feats, axis=-1).astype(self.dtype)
        # 2-layer joint MLP (reference models/policy_net.py:228-231)
        joint = nn.relu(nn.Dense(JOINT_DIM, dtype=self.dtype, name="joint_fc1")(joint))
        joint = nn.relu(nn.Dense(JOINT_DIM, dtype=self.dtype, name="joint_fc2")(joint))
        outs = joint.reshape(n, s, JOINT_DIM)

        tau = jnp.asarray(temperature, jnp.float32)

        if self.causality_modeling is None:
            # per-segment independent heads (reference policy_net.py:330-340)
            flat = outs.reshape(n * s, JOINT_DIM)
            logits = jnp.stack(
                [nn.Dense(2, dtype=self.dtype, name=f"fc_{m}")(flat)
                 for m in range(num_modality)], axis=0)  # (M, N*S, 2)
            logits = logits.astype(jnp.float32)
            decisions = gumbel_decision(self.make_rng("gumbel"), logits, tau)
            decisions = decisions.reshape(num_modality, n, s)
            decisions = jnp.transpose(decisions, (2, 0, 1))       # (S, M, N)
            logits = logits.reshape(num_modality, n, s, 2)
            logits = jnp.transpose(logits, (2, 0, 1, 3))          # (S, M, N, 2)
            return decisions, logits

        if self.causality_modeling != "lstm":
            raise ValueError("unknown causality_modeling "
                             f"{self.causality_modeling!r}")

        scan = nn.scan(
            _DecisionCell,
            variable_broadcast="params",
            split_rngs={"params": False, "gumbel": True},
            in_axes=0, out_axes=0,
        )(num_modality=num_modality, dtype=self.dtype, name="lstm")
        carry0 = (
            jnp.zeros((n, LSTM_HIDDEN), self.dtype),
            jnp.zeros((n, LSTM_HIDDEN), self.dtype),
            jnp.zeros((n, 2 * num_modality), jnp.float32),
            tau,
        )
        seq = jnp.transpose(outs, (1, 0, 2))  # (S, N, JOINT_DIM)
        _, (decisions, logits) = scan(carry0, seq)
        return decisions, logits  # (S, M, N), (S, M, N, 2)
