import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from adamml_tpu.train.losses import cross_entropy, compute_policy_loss
from adamml_tpu.train.schedulers import lr_at_epoch, ReduceLROnPlateau
from adamml_tpu.train.optim import (sgd_transform, adam_transform,
                                    clip_by_global_norm)


class TestLosses:
    def test_cross_entropy_matches_torch(self):
        rng = np.random.default_rng(0)
        logits = rng.normal(size=(8, 5)).astype(np.float32)
        labels = rng.integers(0, 5, size=(8,))
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(labels)))
        theirs = float(torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(labels)))
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_soft_cross_entropy_matches_torch(self):
        rng = np.random.default_rng(1)
        logits = rng.normal(size=(6, 4)).astype(np.float32)
        gt = (rng.random((6, 4)) > 0.5).astype(np.float32)
        ours = float(cross_entropy(jnp.asarray(logits), jnp.asarray(gt)))
        theirs = float(torch.nn.functional.cross_entropy(
            torch.tensor(logits), torch.tensor(gt)))
        assert ours == pytest.approx(theirs, rel=1e-5)

    def test_policy_loss_blockdrop_matches_reference_formula(self):
        """Hand-compute the blockdrop penalty exactly as reference
        utils/utils.py:173-183 via torch."""
        rng = np.random.default_rng(2)
        n, s, m = 6, 4, 2
        selection = (rng.random((n, s, m)) > 0.4).astype(np.float32)
        logits = rng.normal(size=(n, 5)).astype(np.float32)
        targets = rng.integers(0, 5, size=(n,))
        cost_weights = [1.0, 0.05]
        gammas = 10.0

        sel_t = torch.tensor(selection)
        log_t = torch.tensor(logits)
        tgt_t = torch.tensor(targets)
        top1 = torch.argmax(log_t.detach(), dim=-1)
        correctness = (top1 == tgt_t).float()
        sel_mean = sel_t.mean(dim=1)
        sel_sq = sel_mean * sel_mean
        expected = torch.tensor(0.0)
        for w, pl in zip(cost_weights, sel_sq.chunk(chunks=m, dim=-1)):
            expected = expected + w * torch.mean(correctness * pl.squeeze(-1))
        expected = expected + torch.mean(
            (torch.ones_like(correctness) - correctness) * gammas)

        ours = float(compute_policy_loss(
            "blockdrop", jnp.asarray(selection), cost_weights, gammas,
            jnp.asarray(logits), jnp.asarray(targets)))
        assert ours == pytest.approx(float(expected), rel=1e-5)

    def test_policy_loss_mean(self):
        selection = jnp.asarray(np.array([[[1.0, 0.0], [1.0, 1.0]]]))
        loss = compute_policy_loss("mean", selection, [2.0, 4.0], 0.0,
                                   jnp.zeros((1, 3)), jnp.zeros((1,)))
        # mean over (N,S): m0 = 1.0, m1 = 0.5 -> 2*1 + 4*0.5 = 4
        assert float(loss) == pytest.approx(4.0)

    def test_blockdrop_zero_cost_weights_constant(self):
        """During warmup/finetune cost weights are zero -> only the constant
        gammas term remains (no gradient to the policy)."""
        n, s, m = 4, 3, 2
        selection = jnp.ones((n, s, m))

        def f(sel):
            return compute_policy_loss("blockdrop", sel, [0.0, 0.0], 10.0,
                                       jnp.ones((n, 5)), jnp.zeros((n,),
                                                                   jnp.int32))

        g = jax.grad(f)(selection)
        np.testing.assert_allclose(np.asarray(g), 0.0)


class TestSchedulers:
    def test_multisteps(self):
        for epoch, expected in [(0, 0.1), (9, 0.1), (10, 0.01), (14, 0.01),
                                (15, 0.001), (30, 0.001)]:
            got = lr_at_epoch("multisteps", 0.1, epoch, [10, 15], 20)
            assert got == pytest.approx(expected)

    def test_step(self):
        assert lr_at_epoch("step", 1.0, 0, [10], 100) == 1.0
        assert lr_at_epoch("step", 1.0, 10, [10], 100) == pytest.approx(0.1)
        assert lr_at_epoch("step", 1.0, 25, [10], 100) == pytest.approx(0.01)

    def test_cosine(self):
        assert lr_at_epoch("cosine", 2.0, 0, [], 50) == pytest.approx(2.0)
        assert lr_at_epoch("cosine", 2.0, 50, [], 50) == pytest.approx(0.0, abs=1e-9)
        assert lr_at_epoch("cosine", 2.0, 25, [], 50) == pytest.approx(1.0)

    def test_plateau(self):
        p = ReduceLROnPlateau(1.0, patience=2)
        for _ in range(3):
            p.step(5.0)
        assert p.lr == 1.0  # first call sets best, then 2 bad epochs
        p.step(5.0)  # third bad epoch > patience -> decay
        assert p.lr == pytest.approx(0.1)
        p.step(1.0)  # improvement resets
        assert p.lr == pytest.approx(0.1)


class TestOptimizers:
    def _roundtrip(self, tx, torch_opt_fn, steps=5, lr=0.1):
        rng = np.random.default_rng(0)
        w0 = rng.normal(size=(4, 3)).astype(np.float32)
        target = rng.normal(size=(4, 3)).astype(np.float32)

        # torch side
        wt = torch.tensor(w0.copy(), requires_grad=True)
        opt = torch_opt_fn([wt], lr)
        for _ in range(steps):
            opt.zero_grad()
            loss = ((wt - torch.tensor(target)) ** 2).sum()
            loss.backward()
            opt.step()

        # jax side
        params = {"w": jnp.asarray(w0)}
        state = tx.init(params)
        for _ in range(steps):
            grads = jax.grad(
                lambda p: jnp.sum((p["w"] - target) ** 2))(params)
            updates, state = tx.update(grads, state, params)
            params = jax.tree_util.tree_map(lambda p, u: p - lr * u,
                                            params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]),
                                   wt.detach().numpy(), rtol=2e-4, atol=2e-5)

    def test_sgd_momentum_matches_torch(self):
        self._roundtrip(
            sgd_transform(momentum=0.9, nesterov=False, weight_decay=1e-4),
            lambda p, lr: torch.optim.SGD(p, lr, momentum=0.9,
                                          weight_decay=1e-4))

    def test_sgd_nesterov_matches_torch(self):
        self._roundtrip(
            sgd_transform(momentum=0.9, nesterov=True, weight_decay=1e-4),
            lambda p, lr: torch.optim.SGD(p, lr, momentum=0.9, nesterov=True,
                                          weight_decay=1e-4))

    def test_adam_matches_torch(self):
        self._roundtrip(
            adam_transform(weight_decay=1e-4),
            lambda p, lr: torch.optim.Adam(p, lr, weight_decay=1e-4))

    def test_clip_by_global_norm(self):
        grads = {"a": jnp.ones((3,)) * 3.0, "b": jnp.ones((4,)) * 4.0}
        clipped = clip_by_global_norm(grads, 1.0)
        norm = float(jnp.sqrt(sum(jnp.sum(g ** 2)
                                  for g in jax.tree_util.tree_leaves(clipped))))
        assert norm == pytest.approx(1.0, rel=1e-4)
        same = clip_by_global_norm(grads, 1e9)
        np.testing.assert_allclose(np.asarray(same["a"]), 3.0)


class TestFusedOptimizers:
    """FusedSGD/FusedAdam (raveled-vector updates) must match the per-tensor
    optax path bit-for-bit in math (same torch semantics)."""

    def _tree(self):
        import numpy as np
        rng = np.random.RandomState(0)
        return {
            "a": {"kernel": jnp.asarray(rng.randn(16, 8), jnp.float32),
                  "bias": jnp.asarray(rng.randn(8), jnp.float32)},
            "b": {"scale": jnp.asarray(rng.randn(8), jnp.float32)},
        }

    def _grads(self, step):
        import numpy as np
        rng = np.random.RandomState(100 + step)
        return {
            "a": {"kernel": jnp.asarray(rng.randn(16, 8), jnp.float32) * 0.1,
                  "bias": jnp.asarray(rng.randn(8), jnp.float32) * 0.1},
            "b": {"scale": jnp.asarray(rng.randn(8), jnp.float32) * 0.1},
        }

    def _run_pair(self, fused_tx, optax_tx, lr, steps=5):
        import numpy as np
        from adamml_tpu.train.steps import _apply_update

        p_f, s_f = self._tree(), fused_tx.init(self._tree())
        p_o, s_o = self._tree(), optax_tx.init(self._tree())
        for t in range(steps):
            g = self._grads(t)
            p_f, s_f = _apply_update(fused_tx, g, s_f, p_f, lr)
            p_o, s_o = _apply_update(optax_tx, g, s_o, p_o, lr)
        for x, y in zip(jax.tree_util.tree_leaves(p_f),
                        jax.tree_util.tree_leaves(p_o)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                       rtol=1e-6, atol=1e-7)

    def test_fused_sgd_matches_optax(self):
        from adamml_tpu.train.optim import FusedSGD, sgd_transform

        self._run_pair(FusedSGD(0.9, False, 1e-4),
                       sgd_transform(0.9, False, 1e-4), 0.01)

    def test_fused_sgd_nesterov_matches_optax(self):
        from adamml_tpu.train.optim import FusedSGD, sgd_transform

        self._run_pair(FusedSGD(0.9, True, 1e-4),
                       sgd_transform(0.9, True, 1e-4), 0.01)

    def test_fused_adam_matches_optax(self):
        from adamml_tpu.train.optim import FusedAdam, adam_transform

        self._run_pair(FusedAdam(1e-4), adam_transform(1e-4), 0.001)

    def test_fused_sgd_matches_torch(self):
        import numpy as np
        import torch
        from adamml_tpu.train.optim import FusedSGD
        from adamml_tpu.train.steps import _apply_update

        w0 = np.random.RandomState(7).randn(4, 3).astype(np.float32)
        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.SGD([tw], lr=0.01, momentum=0.9, weight_decay=1e-4)
        tx = FusedSGD(0.9, False, 1e-4)
        p, s = {"w": jnp.asarray(w0)}, tx.init({"w": jnp.asarray(w0)})
        for t in range(4):
            g = np.random.RandomState(50 + t).randn(4, 3).astype(np.float32)
            opt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            opt.step()
            p, s = _apply_update(tx, {"w": jnp.asarray(g)}, s, p, 0.01)
        np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)

    def test_fused_adam_matches_torch(self):
        import numpy as np
        import torch
        from adamml_tpu.train.optim import FusedAdam
        from adamml_tpu.train.steps import _apply_update

        w0 = np.random.RandomState(9).randn(4, 3).astype(np.float32)
        tw = torch.nn.Parameter(torch.from_numpy(w0.copy()))
        opt = torch.optim.Adam([tw], lr=0.001, weight_decay=1e-4)
        tx = FusedAdam(1e-4)
        p, s = {"w": jnp.asarray(w0)}, tx.init({"w": jnp.asarray(w0)})
        for t in range(4):
            g = np.random.RandomState(80 + t).randn(4, 3).astype(np.float32)
            opt.zero_grad()
            tw.grad = torch.from_numpy(g.copy())
            opt.step()
            p, s = _apply_update(tx, {"w": jnp.asarray(g)}, s, p, 0.001)
        np.testing.assert_allclose(np.asarray(p["w"]), tw.detach().numpy(),
                                   rtol=1e-5, atol=1e-6)
