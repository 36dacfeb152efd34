"""ResNet TSN backbone in flax (NHWC, frame axis explicit).

Capability twin of the reference 2D ResNet applied per frame with temporal
max/avg pooling after layers 1-3 (reference models/resnet.py:116-241): with
8 input frames the pools halve time 3x so the head sees 1 frame. Departures
from the reference design, for TPU:

  * NHWC layout and bf16 compute / fp32 params (MXU-native) instead of NCHW
    fp32;
  * frames are an explicit axis folded into batch around convolutions -- the
    reshape dance of reference models/resnet.py:178-180 disappears;
  * BatchNorm optionally reduces over the mesh data axis (sync-BN ==
    lax.pmean of batch moments; reference train_adamml.py:125-127 uses
    torch SyncBatchNorm).

Parameter tree is named to make the torchvision/PyTorch checkpoint converter
(adamml_tpu/ckpt/torch_convert.py) a direct path mapping.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from ..ops.pallas.tpool_fused import fused_bn_add_relu_tpool
from ..ops.temporal import temporal_pool
from .norm import GroupedBatchNorm

# depth -> (block kind, per-stage counts); reference models/resnet.py:123-129
RESNET_LAYERS = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class _ConvBN(nn.Module):
    features: int
    kernel: Tuple[int, int]
    strides: Tuple[int, int] = (1, 1)
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1
    bn_seq_inner: int = 1
    # defer the BN affine: return (conv_out, a, b) with a/b per group so the
    # caller can fuse normalize+add+relu+pool into one Pallas kernel
    # (ops/pallas/tpool_fused.py). BN moments/stats update identically.
    defer_affine: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(self.features, self.kernel, self.strides,
                    padding=[(k // 2, k // 2) for k in self.kernel],
                    use_bias=False, dtype=self.dtype, name="conv")(x)
        bn = GroupedBatchNorm(use_running_average=not train, momentum=0.9,
                              epsilon=1e-5, dtype=self.dtype,
                              axis_name=self.bn_axis_name,
                              groups=self.bn_groups,
                              seq_groups=self.bn_seq_groups,
                              seq_inner=self.bn_seq_inner,
                              return_affine=self.defer_affine, name="bn")
        if self.defer_affine:
            a, b = bn(x)
            return x, a, b
        return bn(x)


class BasicBlock(nn.Module):
    """reference models/resnet.py:46-74"""
    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1
    bn_seq_inner: int = 1
    # defer the final bn-apply + residual-add + relu so a stage-boundary
    # caller can fuse them with the temporal pool; returns
    # (conv_out, identity, a, b). Parameter tree is unchanged.
    defer_epilogue: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = _ConvBN(self.planes, (3, 3), self.strides, self.dtype,
                      self.bn_axis_name, self.bn_groups, self.bn_seq_groups,
                      self.bn_seq_inner, name="cb1")(x, train)
        out = nn.relu(out)
        cb2 = _ConvBN(self.planes, (3, 3), (1, 1), self.dtype,
                      self.bn_axis_name, self.bn_groups, self.bn_seq_groups,
                      self.bn_seq_inner,
                      defer_affine=self.defer_epilogue, name="cb2")
        if self.downsample:
            identity = _ConvBN(self.planes, (1, 1), self.strides, self.dtype,
                               self.bn_axis_name, self.bn_groups, self.bn_seq_groups,
                               self.bn_seq_inner, name="downsample")(x, train)
        if self.defer_epilogue:
            out, a, b = cb2(out, train)
            return out, identity, a, b
        return nn.relu(cb2(out, train) + identity)


class Bottleneck(nn.Module):
    """reference models/resnet.py:77-113"""
    planes: int
    strides: Tuple[int, int] = (1, 1)
    downsample: bool = False
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    bn_seq_groups: int = 1
    bn_seq_inner: int = 1
    defer_epilogue: bool = False

    @nn.compact
    def __call__(self, x, train: bool):
        identity = x
        out = nn.relu(_ConvBN(self.planes, (1, 1), (1, 1), self.dtype,
                              self.bn_axis_name, self.bn_groups,
                              self.bn_seq_groups, self.bn_seq_inner,
                              name="cb1")(x, train))
        out = nn.relu(_ConvBN(self.planes, (3, 3), self.strides, self.dtype,
                              self.bn_axis_name, self.bn_groups,
                              self.bn_seq_groups, self.bn_seq_inner,
                              name="cb2")(out, train))
        cb3 = _ConvBN(self.planes * 4, (1, 1), (1, 1), self.dtype,
                      self.bn_axis_name, self.bn_groups, self.bn_seq_groups,
                      self.bn_seq_inner,
                      defer_affine=self.defer_epilogue, name="cb3")
        if self.downsample:
            identity = _ConvBN(self.planes * 4, (1, 1), self.strides,
                               self.dtype, self.bn_axis_name, self.bn_groups, self.bn_seq_groups,
                               self.bn_seq_inner, name="downsample")(x, train)
        if self.defer_epilogue:
            out, a, b = cb3(out, train)
            return out, identity, a, b
        return nn.relu(cb3(out, train) + identity)


class ResNetTSN(nn.Module):
    """Frame-folded 2D ResNet with temporal pooling between stages.

    Input (N, F, H, W, C); `__call__` returns frame-averaged logits (N, K),
    `features=True` returns the final conv map (N, F_out, h, w, c).
    """

    depth: int = 50
    num_classes: int = 1000
    dropout: float = 0.5
    without_t_stride: bool = False
    pooling_method: str = "max"
    dtype: Any = jnp.float32
    bn_axis_name: Optional[str] = None
    bn_groups: int = 1
    # per-segment BN moment groups (reference runs the main net once per
    # segment, so its train-mode BN statistics are per segment; the AdaMML
    # wrapper folds segments into the batch clip-major and sets this to S --
    # GroupedBatchNorm recovers the per-segment moments by a free
    # (clips, segments, frames) reshape, no transposes)
    bn_seq_groups: int = 1
    # rematerialize block internals in the backward pass: trades recompute
    # (cheap on an underutilized MXU) for activation memory, unlocking
    # larger per-chip batches
    remat: bool = False
    # stage-selective remat: 1-based stage numbers whose blocks remat even
    # when `remat` is False. Stage 1 runs at the largest spatial extent and
    # full frame count, so its block-internal saves dominate the activation
    # footprint while its recompute is a small slice of total FLOPs --
    # remat there buys most of the memory at a fraction of full-backbone
    # remat's recompute (VERDICT r2: whole-backbone remat alone could not
    # fit batch 32)
    remat_stages: Tuple[int, ...] = ()
    # fuse stage-boundary bn-apply+add+relu+temporal-pool into one Pallas
    # kernel (ops/pallas/tpool_fused.py); default ON -- measured faster on
    # the flagship step, bit-identical gradients, same param tree
    fused_tpool: bool = True

    @property
    def feature_dim(self) -> int:
        return 2048 if self.depth >= 50 else 512

    @nn.compact
    def __call__(self, x, train: bool = False, features: bool = False):
        kind, layers = RESNET_LAYERS[self.depth]
        plain_block = BasicBlock if kind == "basic" else Bottleneck
        remat_block = nn.remat(plain_block, static_argnums=(2,))
        expansion = 1 if kind == "basic" else 4

        n, f, h, w, c = x.shape
        x = x.astype(self.dtype)

        def fold(t):
            return t.reshape((t.shape[0] * t.shape[1],) + t.shape[2:])

        def unfold(t, frames):
            return t.reshape((-1, frames) + t.shape[1:])

        x = fold(x)
        # stem (reference models/resnet.py:138-141)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        x = GroupedBatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             axis_name=self.bn_axis_name,
                             groups=self.bn_groups,
                             seq_groups=self.bn_seq_groups,
                             seq_inner=f, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        cur_frames = f
        inplanes = 64
        for stage, blocks in enumerate(layers):
            block = (remat_block
                     if self.remat or (stage + 1) in self.remat_stages
                     else plain_block)
            planes = 64 * (2 ** stage)
            strides = (1, 1) if stage == 0 else (2, 2)
            pool_here = (stage < 3 and not self.without_t_stride
                         and cur_frames > 1)
            # Fuse the last block's bn-apply+add+relu with the temporal pool
            # in one Pallas kernel: avoids the frames-as-sublanes layout XLA
            # picks for reduce-window over frames plus the intermediate
            # materialization (~12 ms/step at batch 8 for stage 1 alone;
            # BENCH.md). Grouped (per-replica) BN requires clips to divide
            # evenly into groups for the per-row affine lookup.
            n_clips = x.shape[0] // cur_frames
            total_groups = max(1, self.bn_groups) * max(1, self.bn_seq_groups)
            fuse_pool = (pool_here and self.fused_tpool
                         and self.pooling_method == "max"
                         and (total_groups <= 1
                              or (x.shape[0] % total_groups == 0
                                  and n_clips % total_groups == 0)))
            for b in range(blocks):
                needs_ds = (b == 0 and
                            (strides != (1, 1) or inplanes != planes * expansion))
                blk = block(planes, strides if b == 0 else (1, 1), needs_ds,
                            self.dtype, self.bn_axis_name, self.bn_groups,
                            self.bn_seq_groups, cur_frames,
                            defer_epilogue=fuse_pool and b == blocks - 1,
                            name=f"layer{stage + 1}_{b}")
                if fuse_pool and b == blocks - 1:
                    y, ident, aff_a, aff_b = blk(x, train)
                    x = fused_bn_add_relu_tpool(
                        unfold(y, cur_frames), unfold(ident, cur_frames),
                        aff_a, aff_b)
                    cur_frames = x.shape[1]
                    x = fold(x)
                else:
                    x = blk(x, train)
                inplanes = planes * expansion
            # temporal pooling after layers 1-3 (reference models/resnet.py:145-154)
            if pool_here and not fuse_pool:
                x = unfold(x, cur_frames)
                x = temporal_pool(x, 3, 2, self.pooling_method)
                cur_frames = x.shape[1]
                x = fold(x)

        if features:
            return unfold(x, cur_frames)

        x = jnp.mean(x, axis=(1, 2))  # global average pool
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=self.dtype, name="fc")(x)
        x = unfold(x, cur_frames)  # (N, F_out, K)
        return jnp.mean(x, axis=1).astype(jnp.float32)
