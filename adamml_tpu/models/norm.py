"""Batch normalization with selectable moment scope.

Under GSPMD jit, a plain flax BatchNorm reduces over the FULL logical batch
-- i.e. torch SyncBatchNorm semantics -- because XLA inserts the cross-shard
collective for the sharded batch axis. But the reference's *default* is
per-replica (local) BN; SyncBN is opt-in via --sync-bn (reference
train_adamml.py:125-127, opts.py:131). This module makes both expressible in
one jit program:

  groups=1           -> global moments (SyncBN; the GSPMD default)
  groups=G           -> moments per contiguous leading-axis group. When G
                        equals the data-parallel mesh size, groups coincide
                        with shards (NamedSharding splits the leading axis
                        into contiguous blocks), so the reduction is
                        shard-local: exact torch per-replica BN, with no
                        cross-chip collective in the moments.

Running statistics under groups>1 follow torch DDP's broadcast_buffers=True
net effect: rank 0's buffers win every step, so we update with group 0's
moments.

Parameter/stat names and dtypes match flax nn.BatchNorm ("scale"/"bias"
params, "mean"/"var" batch_stats, fp32) so checkpoints and the torch
converter are unaffected.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn


class GroupedBatchNorm(nn.Module):
    use_running_average: bool
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Any = jnp.float32
    axis_name: Optional[str] = None
    groups: int = 1
    # seq_groups/seq_inner: groups processed SEQUENTIALLY by the reference
    # (its per-segment main/policy-net loop, reference models/adamml.py:84-86,
    # models/policy_net.py:321-327): train-mode moments are per
    # (segment x replica-group), and running stats fold the seq_groups moment
    # sets sequentially, exactly like S consecutive torch BN forwards.
    # The leading axis is (clips, segments, frames)-ordered -- clip-major, so
    # replica groups stay contiguous leading blocks (no data transposes
    # anywhere) and the factorization (groups, clips/groups, seq_groups,
    # seq_inner) is a free reshape. seq_inner = rows folded AFTER the segment
    # axis (the current frame count at this layer). seq_groups=1 == plain.
    seq_groups: int = 1
    seq_inner: int = 1
    # return the per-group affine (a, b) with a = scale*rsqrt(var+eps) and
    # b = bias - mean*a INSTEAD of applying it, so a consumer can fuse the
    # normalize into its own kernel (ops/pallas/tpool_fused.py). Moments and
    # running-stat updates are computed identically either way.
    return_affine: bool = False

    @nn.compact
    def __call__(self, x):
        features = x.shape[-1]
        ra_mean = self.variable("batch_stats", "mean",
                                lambda: jnp.zeros((features,), jnp.float32))
        ra_var = self.variable("batch_stats", "var",
                               lambda: jnp.ones((features,), jnp.float32))
        scale = self.param("scale", nn.initializers.ones, (features,),
                           jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (features,),
                          jnp.float32)

        def affine(mean_gc, var_gc):
            """(G, C) moments -> (G, C) fused-FMA affine."""
            a = scale * jax.lax.rsqrt(var_gc + self.epsilon)
            return a, bias - mean_gc * a

        if self.use_running_average:
            mean, var = ra_mean.value, ra_var.value
            if self.return_affine:
                return affine(mean[None, None], var[None, None])  # (1, 1, C)
            y = (x.astype(jnp.float32) - mean) * jax.lax.rsqrt(
                var + self.epsilon)
            return (y * scale + bias).astype(self.dtype)

        xf = x.astype(jnp.float32)
        n = x.shape[0]
        r = max(1, self.groups)
        sq = max(1, self.seq_groups)
        si = max(1, self.seq_inner)
        grouped = (r * sq > 1 and n % (r * sq * si) == 0 and n >= r * sq * si)
        if grouped:
            # leading axis (clips, segments, frames)-ordered factors freely
            # into (replica, clips-in-replica, segment, frames): moments per
            # (replica, segment) over (clips, frames, spatial...) per channel
            xg = xf.reshape((r, n // (r * sq * si), sq, si) + x.shape[1:])
            red = (1, 3) + tuple(range(4, xg.ndim - 1))
            mean_g = xg.mean(red)                        # (R, S, C)
            var_g = (jnp.square(xg).mean(red) - jnp.square(mean_g))
            bshape = (r, 1, sq, 1) + (1,) * (xg.ndim - 5) + (features,)
            y = (xg - mean_g.reshape(bshape)) * jax.lax.rsqrt(
                var_g.reshape(bshape) + self.epsilon)
            y = y.reshape(x.shape)
            # running stats see replica-group 0's moments (DDP
            # broadcast_buffers: rank 0's buffers win), one moment set per
            # sequential (segment) group
            upd_mean, upd_var = mean_g[0], var_g[0]      # (S, C)
            count = xg.size // (r * sq * features)       # elems per group/chan
        else:
            # global moments (also the fallback when the batch doesn't split,
            # e.g. model init on a tiny example batch)
            red = tuple(range(xf.ndim - 1))
            mean = xf.mean(red)
            var = jnp.square(xf).mean(red) - jnp.square(mean)
            count = xf.size // features
            if self.axis_name is not None:  # shard_map callers
                mean = jax.lax.pmean(mean, self.axis_name)
                var = jax.lax.pmean(
                    var + jnp.square(xf.mean(red) - mean), self.axis_name)
                count = count * jax.lax.psum(1, self.axis_name)
            y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
            upd_mean, upd_var = mean[None], var[None]    # (1, C)

        if not self.is_initializing():
            m = self.momentum
            # torch stores the UNBIASED variance in running_var (normalize
            # uses the biased one) -- match it for checkpoint/eval parity.
            # count may be traced (psum under shard_map), so keep this as
            # array arithmetic.
            cf = jnp.asarray(count, jnp.float32)
            upd_var = upd_var * jnp.where(cf > 1.0, cf / jnp.maximum(
                cf - 1.0, 1.0), 1.0)
            # sequential fold over the seq (segment) moment sets: identical
            # to the reference applying BN once per segment in its loop --
            # ra <- m^seq * ra + (1-m) * sum_i m^(seq-1-i) * moment_i
            seq = upd_mean.shape[0]
            w = (1.0 - m) * m ** jnp.arange(seq - 1, -1, -1, dtype=jnp.float32)
            ra_mean.value = (m ** seq) * ra_mean.value + w @ upd_mean
            ra_var.value = (m ** seq) * ra_var.value + w @ upd_var
        if self.return_affine:
            if grouped:
                return affine(mean_g, var_g)         # (R, S, C) each
            return affine(mean[None, None], var[None, None])  # (1, 1, C)
        return (y * scale + bias).astype(self.dtype)
