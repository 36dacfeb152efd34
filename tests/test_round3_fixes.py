"""Round-3 fixes: per-batch eval Gumbel noise, hostfile parsing, optimizer
layout guard, steps_per_dispatch fail-loudly, display logging cadence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from adamml_tpu.train.engine import train_epoch, validate


class _FakeLoader:
    def __init__(self, batches):
        self.batches = batches

    def set_epoch(self, e):
        self.epoch = e

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class _Logger:
    def __init__(self):
        self.lines = []

    def log(self, m):
        self.lines.append(m)


class TestEvalRngPerBatch:
    def test_validate_folds_fresh_rng_per_batch(self):
        """The engine must hand each eval batch a distinct rng (the reference
        samples fresh Gumbel noise per forward; reference
        models/policy_net.py:283-290)."""
        seen = []

        def eval_step(state, inputs, target, rng):
            seen.append(np.asarray(jax.device_get(rng)))
            return inputs, jnp.asarray(0.0)

        batches = [{"x": np.zeros((2, 3), np.float32),
                    "y": np.zeros((2,), np.int64)} for _ in range(3)]

        def preprocess(hb):
            return jnp.asarray(hb["x"]), jnp.asarray(hb["y"])

        validate(_FakeLoader(batches), preprocess, eval_step, None,
                 adamml=False, rng=jax.random.PRNGKey(7))
        assert len(seen) == 3
        assert not np.array_equal(seen[0], seen[1])
        assert not np.array_equal(seen[1], seen[2])

    def test_eval_decisions_differ_across_identical_batches(self):
        """Two IDENTICAL eval batches must draw different Gumbel noise and
        (at temperature 5.0) different decisions (VERDICT r2 weak #2)."""
        from adamml_tpu.models.adamml import AdaMML
        from adamml_tpu.train.steps import make_adamml_eval_step
        from adamml_tpu.train.train_state import AdaMMLTrainState

        model = AdaMML(modality=("rgb", "sound"), num_classes=6, depth=18,
                       causality_modeling="lstm", policy_input_size=32)
        n, s = 2, 3
        rgb = jax.random.normal(jax.random.PRNGKey(0), (n, s, 4, 48, 48, 3))
        snd = jax.random.normal(jax.random.PRNGKey(1), (n, s, 1, 64, 64, 1))
        inputs = [rgb, snd]
        v = model.init({"params": jax.random.PRNGKey(0),
                        "gumbel": jax.random.PRNGKey(1)},
                       inputs, 5.0, train=False)
        state = AdaMMLTrainState.create(dict(v["params"]),
                                        v.get("batch_stats", {}), {}, None)
        eval_step = make_adamml_eval_step(model)
        target = jnp.zeros((n,), jnp.int32)

        batches = [{"i": 0}, {"i": 1}]

        def preprocess(hb):
            return inputs, target  # identical content for both batches

        out = validate(_FakeLoader(batches), preprocess, eval_step, state,
                       adamml=True, modality=["rgb", "sound"],
                       rng=jax.random.PRNGKey(3), num_segments=s)
        sel = out["all_selections"]  # (2n, S, M) -- two gathered batches
        assert sel.shape[0] == 2 * n
        assert not np.array_equal(sel[:n], sel[n:]), \
            "identical eval batches drew identical Gumbel noise"


class TestHostfileParsing:
    def test_exact_match_rank_and_master(self):
        from adamml_tpu.cli.train_adamml import parse_hostfile

        lines = ["node1 slots=4\n", "node10 slots=4\n", "node2\n", "\n"]
        coord, nproc, rank = parse_hostfile(lines, "node10.cluster.local")
        assert coord == "node1:10598"
        assert nproc == 3
        assert rank == 1  # exact match: node10 must NOT match node1

    def test_substring_bug_fixed(self):
        from adamml_tpu.cli.train_adamml import parse_hostfile

        _, _, rank = parse_hostfile(["node1\n", "node10\n"], "node1")
        assert rank == 0
        _, _, rank = parse_hostfile(["node1\n", "node10\n"], "node10")
        assert rank == 1

    def test_missing_host_is_loud(self):
        from adamml_tpu.cli.train_adamml import parse_hostfile

        with pytest.raises(RuntimeError, match="not found"):
            parse_hostfile(["node1\n", "node2\n"], "node3")

    def test_duplicate_host_is_loud(self):
        from adamml_tpu.cli.train_adamml import parse_hostfile

        with pytest.raises(RuntimeError, match="ambiguous"):
            parse_hostfile(["node1\n", "node1\n"], "node1")

    def test_empty_hostfile_is_loud(self):
        from adamml_tpu.cli.train_adamml import parse_hostfile

        with pytest.raises(RuntimeError, match="empty"):
            parse_hostfile(["\n"], "node1")


class TestOptimLayoutGuard:
    def _cfg(self, fused):
        from adamml_tpu.configs.config import ExperimentConfig

        cfg = ExperimentConfig()
        cfg.optim.fused_update = fused
        return cfg

    def test_mismatch_raises_clear_error(self):
        from adamml_tpu.train.curriculum import _check_optim_layout

        with pytest.raises(RuntimeError, match="optimizer layout"):
            _check_optim_layout(self._cfg(True),
                                {"optim_layout": "per_tensor"}, "ckpt")
        with pytest.raises(RuntimeError, match="no_fused_update"):
            _check_optim_layout(self._cfg(False),
                                {"optim_layout": "fused"}, "ckpt")

    def test_match_and_legacy_pass(self):
        from adamml_tpu.train.curriculum import _check_optim_layout

        _check_optim_layout(self._cfg(True), {"optim_layout": "fused"}, "p")
        _check_optim_layout(self._cfg(False),
                            {"optim_layout": "per_tensor"}, "p")
        _check_optim_layout(self._cfg(True), {}, "p")  # pre-guard checkpoint

    def test_meta_records_layout(self, tmp_path):
        """Checkpoint meta written by the trainers carries optim_layout."""
        from adamml_tpu.train.curriculum import _optim_layout

        assert _optim_layout(self._cfg(True)) == "fused"
        assert _optim_layout(self._cfg(False)) == "per_tensor"


class TestUnimodalStepsPerDispatch:
    def test_rejected_loudly(self):
        from adamml_tpu.configs.config import ExperimentConfig
        from adamml_tpu.train.curriculum import UnimodalTrainer

        cfg = ExperimentConfig()
        cfg.optim.steps_per_dispatch = 2
        with pytest.raises(ValueError, match="steps_per_dispatch"):
            UnimodalTrainer(cfg)


class TestDisplayCadenceWithMultiDispatch:
    def test_logs_fire_with_k2_display_2(self):
        """With steps_per_dispatch K=2 the old `i % display == 0` gate never
        fired for most (K, display) pairs; the cadence is now tied to the
        dispatched-step counter (ADVICE r2)."""
        k = 2
        batches = [{"x": np.full((2,), float(i)), "y": np.zeros((2,), np.int64)}
                   for i in range(6)]

        def preprocess(hb):
            return ([jnp.asarray(hb["x"])], jnp.asarray(hb["y"]))

        def multi_step_fn(state, stacked, targets, lr, p_lr, cw, rng):
            return state, {"loss": jnp.zeros((k,)), "top1": jnp.zeros((k,)),
                           "top5": jnp.zeros((k,)),
                           "selection": jnp.zeros((k, 1))}

        def step_fn(state, inputs, target, lr, p_lr, cw, rng):
            return state, {"loss": jnp.asarray(0.0), "top1": jnp.asarray(0.0),
                           "top5": jnp.asarray(0.0),
                           "selection": jnp.zeros((1,))}

        logger = _Logger()
        _, summary = train_epoch(
            _FakeLoader(batches), preprocess, step_fn, 0, lr=0.1,
            adamml=True, modality=["rgb"], display=2, rank=0, logger=logger,
            epoch=0, multi_step_fn=multi_step_fn, steps_per_dispatch=k)
        assert summary["num_batch"] == 6
        assert len(logger.lines) >= 2, \
            "no intra-epoch progress lines with K=2, display=2"
        assert "Wall" in logger.lines[0]
        assert "wall_time" in summary
