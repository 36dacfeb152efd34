"""MobileNetV2 in flax (NHWC), covering both reference variants with one
module:

  * the torchvision-style audio backbone over 1x256x256 log-spectrograms
    (reference models/sound_mobilenet_v2.py:72-175), and
  * the d-li14 160x160 policy trunk with temporal max-pooling injected at the
    first block of the c=64 and c=160 stages (reference
    models/policy_net.py:98-203) -- enable with `temporal_pooling=True`.

Both references share the identical inverted-residual configuration at
width 1.0, so the only structural deltas are the temporal pools and the
classifier head, which are flags here.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.temporal import temporal_pool
from .norm import GroupedBatchNorm

# t (expansion), c (channels), n (blocks), s (stride)
# reference models/sound_mobilenet_v2.py:101-110 == models/policy_net.py:102-111
INVERTED_RESIDUAL_CFG: Tuple[Tuple[int, int, int, int], ...] = (
    (1, 16, 1, 1),
    (6, 24, 2, 2),
    (6, 32, 3, 2),
    (6, 64, 4, 2),
    (6, 96, 3, 1),
    (6, 160, 3, 2),
    (6, 320, 1, 1),
)

LAST_CHANNEL = 1280
# stages whose first block is preceded by temporal pooling in the policy
# trunk (reference models/policy_net.py:120-130: c == 64 and c == 160)
TEMPORAL_POOL_CHANNELS = (64, 160)


def make_divisible(v: float, divisor: int = 8,
                   min_value: Optional[int] = None) -> int:
    """Channel rounding (reference models/sound_mobilenet_v2.py:13-30)."""
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class _ConvBNReLU6(nn.Module):
    features: int
    kernel: int = 3
    strides: int = 1
    groups: int = 1
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1
    bn_seq_inner: int = 1
    use_pallas_dw: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        is_depthwise = (self.use_pallas_dw and self.groups > 1
                        and self.groups == self.features and self.kernel == 3)
        if is_depthwise:
            # same param tree as nn.Conv (a (3, 3, 1, C) 'kernel'), but
            # dispatched through the fused Pallas depthwise kernel on shapes
            # where it beats XLA (ops/pallas/depthwise.py)
            x = _DepthwiseConv(self.features, self.strides, self.dtype,
                               name="conv")(x)
        else:
            x = nn.Conv(self.features, (self.kernel, self.kernel),
                        (self.strides, self.strides),
                        padding=[(self.kernel // 2, self.kernel // 2),
                                 (self.kernel // 2, self.kernel // 2)],
                        feature_group_count=self.groups, use_bias=False,
                        dtype=self.dtype, name="conv")(x)
        x = GroupedBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name,
                             groups=self.bn_groups,
                               seq_groups=self.bn_seq_groups,
                               seq_inner=self.bn_seq_inner, name="bn")(x)
        return jax.nn.relu6(x)


class _DepthwiseConv(nn.Module):
    """3x3 depthwise conv with nn.Conv's parameter layout ((3,3,1,C)
    'kernel') but dispatched through the fused Pallas kernel when
    profitable."""

    features: int
    strides: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        from ..ops.pallas.depthwise import depthwise_conv3x3

        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (3, 3, 1, self.features), jnp.float32)
        w = kernel.reshape(3, 3, self.features).astype(x.dtype)
        return depthwise_conv3x3(x, w, stride=self.strides)


class InvertedResidual(nn.Module):
    """reference models/sound_mobilenet_v2.py:43-69"""
    features: int
    strides: int
    expand_ratio: int
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1
    bn_seq_inner: int = 1
    use_pallas_dw: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.strides == 1 and inp == self.features
        out = x
        if self.expand_ratio != 1:
            out = _ConvBNReLU6(hidden, 1, 1, dtype=self.dtype,
                               bn_axis_name=self.bn_axis_name,
                               bn_groups=self.bn_groups,
                               bn_seq_groups=self.bn_seq_groups,
                               bn_seq_inner=self.bn_seq_inner,
                               name="pw")(out, train)
        out = _ConvBNReLU6(hidden, 3, self.strides, groups=hidden,
                           dtype=self.dtype, bn_axis_name=self.bn_axis_name,
                           bn_groups=self.bn_groups,
                               bn_seq_groups=self.bn_seq_groups,
                               bn_seq_inner=self.bn_seq_inner,
                           use_pallas_dw=self.use_pallas_dw,
                           name="dw")(out, train)
        out = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                      name="pw_linear")(out)
        out = GroupedBatchNorm(use_running_average=not train, momentum=0.9,
                               epsilon=1e-5, dtype=self.dtype,
                               axis_name=self.bn_axis_name,
                               groups=self.bn_groups,
                               seq_groups=self.bn_seq_groups,
                               seq_inner=self.bn_seq_inner, name="bn_linear")(out)
        return x + out if use_res else out


class MobileNetV2(nn.Module):
    """Input (N, F, H, W, C); frames fold into batch around the convs.

    `temporal_pooling=True` reproduces the policy trunk: max-pool over time
    before the first block of the c=64 / c=160 stages while more than one
    frame remains (frames halve twice: 4 -> 2 -> 1).

    `__call__` returns frame-averaged logits (N, K); `features=True` returns
    pooled per-frame embeddings (N, F_out, last_channel) (the reference's
    feature_extraction, models/policy_net.py:142-149).
    """

    num_classes: int = 1000
    width_mult: float = 1.0
    dropout: float = 0.5
    temporal_pooling: bool = False
    # Opt-in fused Pallas depthwise conv (ops/pallas/depthwise.py). The
    # kernel beats XLA 1.5x on large-spatial depthwise blocks in isolation,
    # but inside the full differentiated train graph the custom-VJP fusion
    # boundary costs more than it saves, so XLA convs are the default.
    use_pallas_dw: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1
    bn_seq_inner: int = 1

    @property
    def last_channel(self) -> int:
        return make_divisible(LAST_CHANNEL * max(1.0, self.width_mult))

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        n, f, h, w, c = x.shape
        x = x.astype(self.dtype)
        x = x.reshape(n * f, h, w, c)

        input_channel = make_divisible(32 * self.width_mult)
        x = _ConvBNReLU6(input_channel, 3, 2, dtype=self.dtype,
                         bn_axis_name=self.bn_axis_name,
                         bn_groups=self.bn_groups,
                         bn_seq_groups=self.bn_seq_groups,
                         bn_seq_inner=f,  # frames folded after segments
                         name="features_0")(x, train)

        cur_frames = f
        idx = 1
        for t, ch, nblocks, s in INVERTED_RESIDUAL_CFG:
            out_ch = make_divisible(ch * self.width_mult)
            for i in range(nblocks):
                if (self.temporal_pooling and i == 0
                        and ch in TEMPORAL_POOL_CHANNELS and cur_frames > 1):
                    x = x.reshape((n, cur_frames) + x.shape[1:])
                    x = temporal_pool(x, 3, 2, "max")
                    cur_frames = x.shape[1]
                    x = x.reshape((n * cur_frames,) + x.shape[2:])
                x = InvertedResidual(out_ch, s if i == 0 else 1, t,
                                     dtype=self.dtype,
                                     bn_axis_name=self.bn_axis_name,
                                     bn_groups=self.bn_groups,
                                     bn_seq_groups=self.bn_seq_groups,
                                     bn_seq_inner=cur_frames,
                                     use_pallas_dw=self.use_pallas_dw,
                                     name=f"features_{idx}")(x, train)
                idx += 1

        x = _ConvBNReLU6(self.last_channel, 1, 1, dtype=self.dtype,
                         bn_axis_name=self.bn_axis_name,
                         bn_groups=self.bn_groups,
                         bn_seq_groups=self.bn_seq_groups,
                         bn_seq_inner=cur_frames,
                         name="conv_last")(x, train)
        x = jnp.mean(x, axis=(1, 2))  # (N*F_out, last_channel)

        if features:
            return x.reshape(n, cur_frames, self.last_channel)

        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="classifier")(x)
        x = x.reshape(n, cur_frames, self.num_classes)
        return jnp.mean(x, axis=1).astype(jnp.float32)
