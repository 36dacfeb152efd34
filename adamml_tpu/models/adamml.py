"""AdaMML wrapper: policy net + main net + decision masking + segment fusion.

Capability twin of reference models/adamml.py:12-171 with TPU-first data
movement:

  * the reference's data_layer reshapes (reference models/adamml.py:42-67)
    vanish -- inputs arrive with explicit (N, S, F, H, W, C) axes and the
    policy stream is built on device (`ops.policy_stream`: bilinear 160x160 +
    frame stride 2, reference models/adamml.py:59-62);
  * the per-segment main-net Python loop (reference models/adamml.py:84-86,
    "run each segment one by one to save memory") becomes ONE batched forward
    with N*S folded into batch -- XLA rematerialization replaces the manual
    memory husbandry and the MXU sees a 5x larger batch;
  * the rgbdiff-as-proxy wiring is preserved: when both rgbdiff and flow are
    requested, the policy consumes rgbdiff and the main net consumes flow
    (reference models/adamml.py:143-152).

Temperature is an argument (carried in training state and checkpoints), with
init 5.0 and x0.965 per alternating epoch handled by the curriculum driver
(reference models/policy_net.py:273, train_adamml.py:516).
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.augment import policy_stream
from .joint_net import JointMainNet
from .policy_net import PolicyNet

INIT_TEMPERATURE = 5.0       # reference models/policy_net.py:273
TEMPERATURE_DECAY = 0.965    # reference models/adamml.py:33


def split_modalities(modality: Sequence[str]) -> Tuple[Tuple[str, ...], Tuple[str, ...]]:
    """(policy modalities, main modalities) with the rgbdiff/flow proxy rule
    (reference models/adamml.py:143-152)."""
    modality = tuple(modality)
    if "rgbdiff" in modality and "flow" in modality:
        p = tuple(m for m in modality if m != "flow")
        m_ = tuple(m for m in modality if m != "rgbdiff")
        return p, m_
    return modality, modality


class AdaMML(nn.Module):
    modality: Tuple[str, ...]
    num_classes: int
    depth: int = 50
    dropout: float = 0.5
    without_t_stride: bool = False
    pooling_method: str = "max"
    fusion_point: str = "logits"
    learnable_lf_weights: bool = False
    causality_modeling: Optional[str] = "lstm"
    rng_policy: bool = False
    rng_threshold: float = 0.5
    policy_input_size: int = 160
    eval_capacity: Optional[float] = None  # real conditional compute at eval
    capacity_groups: int = 1  # pack per data shard (models/joint_net.py)
    use_pallas_dw: bool = False
    remat: bool = False
    remat_stages: Tuple[int, ...] = ()
    # remat the policy trunks so their backward-pass saves don't sit on top
    # of the main net's forward peak (see PolicyNet.remat_trunk)
    remat_policy: bool = True
    fused_tpool: bool = True
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1

    @property
    def p_modality(self) -> Tuple[str, ...]:
        return split_modalities(self.modality)[0]

    @property
    def m_modality(self) -> Tuple[str, ...]:
        return split_modalities(self.modality)[1]

    @nn.compact
    def __call__(self, x: Sequence[jax.Array], temperature=INIT_TEMPERATURE,
                 train: bool = False):
        """x: per-modality list, each (N, S, F, H, W, C); sound is
        (N, S, 1, 256, 256, 1). Returns (logits (N, K), decisions (N, S, M))
        with M = number of MAIN modalities, matching the reference contract
        (reference models/adamml.py:69-91)."""
        p_mod, m_mod = split_modalities(self.modality)
        mod = tuple(self.modality)
        n, s = x[0].shape[0], x[0].shape[1]
        num_modality = len(m_mod)

        if self.rng_policy:
            # RNG baseline (reference models/adamml.py:74-78)
            u = jax.random.uniform(self.make_rng("policy"),
                                   (s, num_modality, n), jnp.float32)
            decisions = (u > self.rng_threshold).astype(jnp.float32)
        else:
            p_x = []
            for m in p_mod:
                t = x[mod.index(m)]
                if m != "sound":
                    t = policy_stream(t, size=self.policy_input_size, stride=2)
                p_x.append(t)
            policy = PolicyNet(modality=p_mod,
                               causality_modeling=self.causality_modeling,
                               use_pallas_dw=self.use_pallas_dw,
                               remat_trunk=self.remat_policy and train,
                               dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               bn_groups=self.bn_groups,
                               bn_seq_groups=s,
                               name="policy_net")
            decisions, _ = policy(p_x, temperature, train=train)  # (S, M, N)

        # main net: fold segments into batch, clip-major (replaces the
        # per-segment loop, reference models/adamml.py:84-86) -- a free
        # reshape, no transpose. The reference's per-segment train-mode
        # BatchNorm statistics are recovered inside the backbones by
        # GroupedBatchNorm's (clips, segments, frames) factorization
        # (seq_groups=s), also transpose-free.
        m_x = []
        for m in m_mod:
            t = x[mod.index(m)]
            m_x.append(t.reshape((n * s,) + t.shape[2:]))
        dec_flat = jnp.transpose(decisions, (1, 2, 0)).reshape(num_modality,
                                                               n * s)
        main = JointMainNet(modality=m_mod, depth=self.depth,
                            num_classes=self.num_classes, dropout=self.dropout,
                            without_t_stride=self.without_t_stride,
                            pooling_method=self.pooling_method,
                            fusion_point=self.fusion_point,
                            learnable_lf_weights=self.learnable_lf_weights,
                            eval_capacity=self.eval_capacity,
                            capacity_groups=self.capacity_groups,
                            use_pallas_dw=self.use_pallas_dw,
                            remat=self.remat,
                            remat_stages=self.remat_stages,
                            fused_tpool=self.fused_tpool,
                            dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                            bn_groups=self.bn_groups,
                            bn_seq_groups=s,
                            name="main_net")
        seg_logits = main(m_x, dec_flat, train=train)  # (N*S, K)
        final = jnp.mean(seg_logits.reshape(n, s, -1), axis=1)  # segment mean
        return final, jnp.transpose(decisions, (2, 0, 1))  # (N, K), (N, S, M)
