"""GroupedBatchNorm: per-replica vs global moment scope (VERDICT item 7).

The reference's default is LOCAL (per-replica) BatchNorm; torch SyncBN is
opt-in (reference train_adamml.py:125-127, opts.py:131). groups=G must
reproduce torch local BN on a G-way sharded batch; groups=1 must reproduce
torch SyncBN (= BN over the full batch)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from adamml_tpu.models.norm import GroupedBatchNorm


def _run(x, groups, train=True, variables=None):
    bn = GroupedBatchNorm(use_running_average=not train, momentum=0.9,
                          epsilon=1e-5, groups=groups)
    if variables is None:
        variables = bn.init(jax.random.PRNGKey(0), x)
    if train:
        y, updated = bn.apply(variables, x, mutable=["batch_stats"])
        return np.asarray(y), jax.device_get(updated["batch_stats"])
    return np.asarray(bn.apply(variables, x)), None


def _torch_bn(x_np):
    """One train-mode torch BatchNorm2d step on NHWC numpy input."""
    c = x_np.shape[-1]
    bn = torch.nn.BatchNorm2d(c, eps=1e-5, momentum=0.1)
    bn.train()
    with torch.no_grad():
        y = bn(torch.from_numpy(x_np).permute(0, 3, 1, 2))
    return y.permute(0, 2, 3, 1).numpy()


class TestGroupedBatchNorm:
    def setup_method(self):
        rng = np.random.RandomState(0)
        # deliberately different distributions per half so local/global differ
        a = rng.randn(4, 6, 6, 8).astype(np.float32)
        b = rng.randn(4, 6, 6, 8).astype(np.float32) * 3.0 + 2.0
        self.x = np.concatenate([a, b], axis=0)  # (8, 6, 6, 8)

    def test_global_matches_torch_syncbn(self):
        y, _ = _run(jnp.asarray(self.x), groups=1)
        want = _torch_bn(self.x)  # full batch == SyncBN over one "world"
        np.testing.assert_allclose(y, want, atol=1e-4)

    def test_grouped_matches_torch_local_bn(self):
        y, _ = _run(jnp.asarray(self.x), groups=2)
        want = np.concatenate([_torch_bn(self.x[:4]), _torch_bn(self.x[4:])],
                              axis=0)
        np.testing.assert_allclose(y, want, atol=1e-4)

    def test_local_and_global_diverge(self):
        y1, _ = _run(jnp.asarray(self.x), groups=1)
        y2, _ = _run(jnp.asarray(self.x), groups=2)
        assert np.abs(y1 - y2).max() > 0.1

    def test_running_stats_use_group0(self):
        # DDP broadcast_buffers=True: rank 0's buffers win every step.
        # torch running_var stores the UNBIASED variance (ddof=1).
        _, stats = _run(jnp.asarray(self.x), groups=2)
        m0 = self.x[:4].mean(axis=(0, 1, 2))
        v0 = self.x[:4].var(axis=(0, 1, 2), ddof=1)
        np.testing.assert_allclose(stats["mean"], 0.1 * m0, atol=1e-5)
        np.testing.assert_allclose(stats["var"], 0.9 + 0.1 * v0, atol=1e-5)

    def test_indivisible_batch_falls_back_to_global(self):
        x = jnp.asarray(self.x[:6])  # 6 rows, 4 groups -> global fallback
        y, _ = _run(x, groups=4)
        want = _torch_bn(np.asarray(x))
        np.testing.assert_allclose(y, want, atol=1e-4)

    def test_eval_uses_running_stats_regardless_of_groups(self):
        bn = GroupedBatchNorm(use_running_average=False, groups=2)
        variables = bn.init(jax.random.PRNGKey(0), jnp.asarray(self.x))
        ya, _ = _run(jnp.asarray(self.x), groups=2, train=False,
                     variables=variables)
        yb, _ = _run(jnp.asarray(self.x), groups=1, train=False,
                     variables=variables)
        np.testing.assert_allclose(ya, yb, atol=1e-6)

    def test_param_tree_matches_flax_batchnorm(self):
        from flax import linen as nn

        x = jnp.asarray(self.x)
        ours = GroupedBatchNorm(use_running_average=False).init(
            jax.random.PRNGKey(0), x)
        ref = nn.BatchNorm(use_running_average=False).init(
            jax.random.PRNGKey(0), x)
        assert jax.tree_util.tree_structure(ours) == \
            jax.tree_util.tree_structure(ref)

    def test_grouped_under_sharded_jit(self):
        # per-replica BN on an actually-sharded batch compiles and matches
        # the unsharded grouped result
        from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

        mesh = Mesh(np.asarray(jax.devices()).reshape(8, 1), ("data", "model"))
        x = jnp.asarray(self.x)
        xs = jax.device_put(x, NamedSharding(mesh, P("data")))
        bn = GroupedBatchNorm(use_running_average=False, groups=8)
        variables = bn.init(jax.random.PRNGKey(0), x)

        @jax.jit
        def f(v, t):
            return bn.apply(v, t, mutable=["batch_stats"])[0]

        np.testing.assert_allclose(np.asarray(f(variables, xs)),
                                   np.asarray(f(variables, x)), atol=1e-5)


def test_running_var_matches_torch_unbiased():
    """torch BatchNorm stores the UNBIASED variance in running_var while
    normalizing with the biased one; running_mean is the plain mean."""
    rng = np.random.default_rng(5)
    x_np = rng.normal(size=(6, 7, 7, 3)).astype(np.float32) * 2.0 + 0.5
    bn = GroupedBatchNorm(use_running_average=False, momentum=0.9)
    v = bn.init(jax.random.PRNGKey(0), x_np)
    _, mut = bn.apply(v, x_np, mutable=["batch_stats"])

    tbn = torch.nn.BatchNorm2d(3, momentum=0.1, eps=1e-5)
    tbn.train()
    tbn(torch.from_numpy(np.transpose(x_np, (0, 3, 1, 2)).copy()))
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["mean"]),
                               tbn.running_mean.detach().numpy(), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(mut["batch_stats"]["var"]),
                               tbn.running_var.detach().numpy(), rtol=1e-5)
