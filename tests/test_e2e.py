"""End-to-end tests: the full AdaMML curriculum + unimodal training on
synthetic data, on the virtual 8-device CPU mesh. This is the distributed
test harness the reference never had (SURVEY.md section 4)."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

# full-curriculum runs: many cold XLA:CPU compiles (test tiers: README)
pytestmark = pytest.mark.slow

from adamml_tpu.configs.config import ExperimentConfig


def tiny_cfg(tmp_path, modality=("rgb", "sound"), **over):
    cfg = ExperimentConfig()
    cfg.model.backbone_net = "adamml"
    cfg.model.depth = 18
    cfg.model.groups = 4
    cfg.model.num_segments = 2
    cfg.model.modality = list(modality)
    cfg.model.num_classes = 5
    cfg.model.causality_modeling = "lstm"
    cfg.model.compute_dtype = "float32"
    cfg.model.policy_input_size = 24
    cfg.model.cost_weights = [1.0, 0.05][: len(modality)]
    cfg.optim.batch_size = 8
    cfg.optim.warmup_epochs = 1
    cfg.optim.epochs = 1
    cfg.optim.finetune_epochs = 1
    cfg.optim.lr = 0.01
    cfg.optim.p_lr = 0.01
    cfg.optim.lr_scheduler = "multisteps"
    cfg.data.dataset = "synthetic"
    # AdaMML multi-segment training requires dense sampling: the reference's
    # uniform train sampler ignores num_clips (utils/video_dataset.py:135-170)
    # and README's canonical commands always pass --dense_sampling
    cfg.data.dense_sampling = True
    cfg.data.synthetic_length = 8
    cfg.data.input_size = 32
    cfg.data.canvas_size = (64, 96)
    cfg.data.scale_range = [36, 48]
    cfg.data.val_num_clips = 2
    cfg.data.workers = 2
    cfg.data.audio_length = 0.16  # short window -> (256, 32) spectrogram
    cfg.runtime.logdir = str(tmp_path)
    cfg.runtime.seed = 0
    for k, v in over.items():
        name, attr = k.split("__")
        setattr(getattr(cfg, name), attr, v)
    return cfg


@pytest.fixture(scope="module")
def trainer(tmp_path_factory):
    from adamml_tpu.train.curriculum import AdaMMLTrainer

    cfg = tiny_cfg(tmp_path_factory.mktemp("logs"))
    return AdaMMLTrainer(cfg)


def _params_equal(a, b):
    return all(np.allclose(x, y) for x, y in
               zip(jax.tree_util.tree_leaves(a), jax.tree_util.tree_leaves(b)))


class TestStageFreezing:
    def _one_batch(self, trainer):
        loader = trainer.train_loader
        host_batch = next(iter(loader))
        return trainer.train_pre(host_batch)

    def test_main_phase_freezes_policy(self, trainer):
        inputs, target = self._one_batch(trainer)
        # the step donates its input state -> snapshot to host first
        before = jax.device_get(
            {"params": trainer.state.params,
             "policy_opt": trainer.state.policy_opt})
        lr = jnp.asarray(0.01)
        cw = jnp.asarray([0.0, 0.0])
        rng = jax.random.PRNGKey(0)
        state1, metrics = trainer.step_main(trainer.state, inputs, target,
                                            lr, lr, cw, rng)
        assert _params_equal(before["params"]["policy_net"],
                             state1.params["policy_net"])
        assert not _params_equal(before["params"]["main_net"],
                                 state1.params["main_net"])
        # policy opt state untouched, main opt state advanced
        assert _params_equal(before["policy_opt"], state1.policy_opt)
        assert float(metrics["loss"]) > 0
        # selection rates are per-modality fractions
        assert metrics["selection"].shape == (2,)
        trainer.state = state1

    def test_policy_phase_freezes_main(self, trainer):
        inputs, target = self._one_batch(trainer)
        before = jax.device_get(
            {"params": trainer.state.params,
             "main_opt": trainer.state.main_opt})
        lr = jnp.asarray(0.01)
        cw = jnp.asarray([1.0, 0.05])
        rng = jax.random.PRNGKey(1)
        state1, _ = trainer.step_policy(trainer.state, inputs, target, lr,
                                        lr, cw, rng)
        assert _params_equal(before["params"]["main_net"],
                             state1.params["main_net"])
        assert not _params_equal(before["params"]["policy_net"],
                                 state1.params["policy_net"])
        assert _params_equal(before["main_opt"], state1.main_opt)
        trainer.state = state1

    def test_batch_stats_update_in_both_phases(self, trainer):
        """BN running stats update for the frozen net too (the reference's
        model.train() covers everything, utils/utils.py:335)."""
        inputs, target = self._one_batch(trainer)
        before = jax.device_get(trainer.state.batch_stats["policy_net"])
        lr = jnp.asarray(0.01)
        cw = jnp.asarray([0.0, 0.0])
        state1, _ = trainer.step_main(trainer.state, inputs, target, lr, lr,
                                      cw, jax.random.PRNGKey(2))
        assert not _params_equal(before, state1.batch_stats["policy_net"])
        trainer.state = state1


class TestEndToEnd:
    def test_full_curriculum_runs(self, tmp_path):
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path)
        t = AdaMMLTrainer(cfg)
        result = t.run()
        assert "top1" in result and "flops" in result
        assert result["all_selections"].shape[1:] == (2, 2)  # (N, S, M)
        # artifacts written like the reference (train_adamml.py:489-515)
        log_folder = t.log_folder
        assert os.path.exists(os.path.join(log_folder, "checkpoint"))
        assert os.path.exists(os.path.join(log_folder,
                                           "all_selection_main_1.npz"))
        assert os.path.exists(os.path.join(log_folder, "log.log"))

    def test_resume_restores_stage_and_temperature(self, tmp_path):
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        # finetune_epochs=0 so the run ends after alternating WITHOUT the
        # model_best reload (which reference-faithfully restores the
        # pre-decay temperature, reference train_adamml.py:546)
        cfg = tiny_cfg(tmp_path)
        cfg.optim.finetune_epochs = 0
        t = AdaMMLTrainer(cfg)
        t.run()
        temp_after = float(jax.device_get(t.state.temperature))
        # temperature decayed once during the alternating epoch
        # (reference train_adamml.py:516)
        assert temp_after == pytest.approx(5.0 * 0.965, rel=1e-5)

        cfg2 = tiny_cfg(tmp_path)
        cfg2.optim.finetune_epochs = 0
        cfg2.runtime.auto_resume = True
        t2 = AdaMMLTrainer(cfg2)
        t2.maybe_resume(type("L", (), {"log": lambda self, m: None})())
        # last checkpoint was written during alternating, pre-decay
        assert t2.curr_stage == "alternative_training"
        assert float(jax.device_get(t2.state.temperature)) == pytest.approx(
            5.0, rel=1e-6)

    def test_evaluate_writes_artifacts(self, tmp_path):
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path)
        cfg.runtime.evaluate = True
        t = AdaMMLTrainer(cfg)
        v = t.evaluate()
        assert os.path.exists(os.path.join(t.log_folder, "all_selection.npz"))
        assert v["outputs"].shape[1] == 5


class TestPretrainedLoading:
    def test_unimodality_pretrained_grafts_backbones(self, tmp_path):
        """unimodal checkpoints -> AdaMML main-net backbones (reference
        joint_resnet_mobilenetv2.py:141-155)."""
        from adamml_tpu.train.curriculum import AdaMMLTrainer, UnimodalTrainer
        from adamml_tpu.ckpt.checkpoint import save_checkpoint

        paths = []
        uni_states = {}
        for m, backbone in (("rgb", "resnet"), ("sound",
                                                "sound_mobilenet_v2")):
            cfg = tiny_cfg(tmp_path / m, modality=(m,))
            cfg.model.backbone_net = backbone
            t = UnimodalTrainer(cfg)
            p = save_checkpoint(t.state, {"epoch": 1, "stage": "unimodal",
                                          "best_top1": 0.0, "arch": m},
                                str(tmp_path / m))
            paths.append(p)
            uni_states[m] = jax.device_get(t.state.params)

        cfg = tiny_cfg(tmp_path / "joint")
        cfg.runtime.unimodality_pretrained = paths
        trainer = AdaMMLTrainer(cfg)
        got = jax.device_get(trainer.state.params["main_net"])
        np.testing.assert_allclose(
            np.asarray(got["net_rgb"]["conv1"]["kernel"]),
            np.asarray(uni_states["rgb"]["conv1"]["kernel"]))
        np.testing.assert_allclose(
            np.asarray(got["net_sound"]["features_0"]["conv"]["kernel"]),
            np.asarray(uni_states["sound"]["features_0"]["conv"]["kernel"]))

    def test_pretrained_whole_model_and_temperature(self, tmp_path):
        from adamml_tpu.train.curriculum import AdaMMLTrainer
        from adamml_tpu.ckpt.checkpoint import save_checkpoint

        cfg = tiny_cfg(tmp_path)
        t = AdaMMLTrainer(cfg)
        t.state = t.state.replace(
            temperature=jnp.asarray(3.3, jnp.float32))
        path = save_checkpoint(t.state, {"epoch": 1, "stage": "warmup",
                                         "best_top1": 0.0, "arch": "x"},
                               str(tmp_path / "src"))
        src_kernel = np.asarray(jax.device_get(
            t.state.params["policy_net"]["joint_fc1"]["kernel"]))

        cfg2 = tiny_cfg(tmp_path / "dst")
        cfg2.runtime.pretrained = path
        cfg2.runtime.seed = 99  # different init; must be overwritten
        t2 = AdaMMLTrainer(cfg2)
        assert float(jax.device_get(t2.state.temperature)) == pytest.approx(
            3.3, rel=1e-6)
        np.testing.assert_allclose(
            np.asarray(jax.device_get(
                t2.state.params["policy_net"]["joint_fc1"]["kernel"])),
            src_kernel)


class TestFourModalities:
    def test_rgbdiff_proxy_curriculum(self, tmp_path):
        """rgb+flow+rgbdiff+sound: policy consumes rgbdiff (not flow), main
        consumes flow (not rgbdiff) -- reference models/adamml.py:143-152.
        One alternating epoch through the full trainer."""
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path, modality=("rgb", "flow", "rgbdiff", "sound"))
        cfg.model.cost_weights = [1.0, 0.1, 0.05]  # major modalities: 3
        cfg.optim.warmup_epochs = 0
        cfg.optim.finetune_epochs = 0
        cfg.optim.curr_stage = "alternative_training"
        t = AdaMMLTrainer(cfg)
        assert t.modality == ["rgb", "flow", "sound"]  # rgbdiff is proxy-only
        p = t.state.params
        assert "net_rgbdiff" in p["policy_net"]
        assert "net_flow" in p["main_net"]
        assert "net_rgbdiff" not in p["main_net"]
        assert "net_flow" not in p["policy_net"]
        result = t.run()
        assert result["all_selections"].shape[-1] == 3  # (N, S, M=3)


class TestUnimodal:
    def test_rgb_resnet_end_to_end(self, tmp_path):
        from adamml_tpu.train.curriculum import UnimodalTrainer

        cfg = tiny_cfg(tmp_path, modality=("rgb",))
        cfg.model.backbone_net = "resnet"
        cfg.optim.epochs = 1
        t = UnimodalTrainer(cfg)
        result = t.run()
        assert "top1" in result

    def test_sound_mobilenet_end_to_end(self, tmp_path):
        from adamml_tpu.train.curriculum import UnimodalTrainer

        cfg = tiny_cfg(tmp_path, modality=("sound",))
        cfg.model.backbone_net = "sound_mobilenet_v2"
        cfg.optim.epochs = 1
        t = UnimodalTrainer(cfg)
        result = t.run()
        assert "top1" in result


class TestSchedulerCheckpointing:
    def test_plateau_state_survives_resume(self, tmp_path):
        """Plateau LR decay must persist across restarts (reference saves
        p_scheduler/scheduler state dicts, train_adamml.py:373-383)."""
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path, optim__lr_scheduler="plateau")
        t = AdaMMLTrainer(cfg)
        # drive the plateau past its patience so the LR actually decays
        for _ in range(12):
            t.plateau.step(1.0)
            t.p_plateau.step(1.0)
        assert t.plateau.lr == pytest.approx(cfg.optim.lr * 0.1)
        t.save(3, "alternative_training", "_main")

        cfg2 = tiny_cfg(tmp_path, optim__lr_scheduler="plateau")
        cfg2.runtime.auto_resume = True
        t2 = AdaMMLTrainer(cfg2)
        t2.maybe_resume(type("L", (), {"log": lambda self, m: None})())
        assert t2.plateau.lr == pytest.approx(cfg.optim.lr * 0.1)
        assert t2.p_plateau.lr == pytest.approx(cfg.optim.p_lr * 0.1)
        # trainer rng restored too, so data order/gumbel draws continue
        assert np.array_equal(np.asarray(jax.device_get(t2.rng)),
                              np.asarray(jax.device_get(t.rng)))


class TestFlagValidation:
    """Flags that can't work must fail loudly, not parse-and-ignore."""

    @pytest.mark.parametrize("argv", [
        ["--threed_data"],
        ["--pred_weights", "0.5"],  # weights without files
        ["--after_softmax"],        # softmax without files
        ["--pred_files", "a.npy", "b.npy", "--pred_weights", "0.5"],
    ])
    def test_unsupported_flags_error(self, argv):
        from adamml_tpu.configs.config import arg_parser, validate_args

        parser = arg_parser()
        args = parser.parse_args(argv)
        with pytest.raises(SystemExit):
            validate_args(parser, args)

    def test_random_sampling_reaches_dataset(self, tmp_path):
        from adamml_tpu.train.curriculum import _make_dataset

        cfg = tiny_cfg(tmp_path, data__random_sampling=True)
        ds = _make_dataset(cfg, is_train=False, num_clips=2)
        assert ds.fixed_offset is False
        cfg2 = tiny_cfg(tmp_path)
        ds2 = _make_dataset(cfg2, is_train=False, num_clips=2)
        assert ds2.fixed_offset is True


class TestMultiStepDispatch:
    def test_multi_step_equals_k_single_steps(self, tmp_path):
        """The scanned step must match the single step semantically.

        Bit-identity across the two compiled programs is not attainable (fp
        reduction reordering flips borderline Gumbel decisions, which
        amplifies), so: (a) a K=1 scan on the SAME batch/rng must match the
        single step to fp tolerance, and (b) a K=2 scan must run both steps
        with DISTINCT per-step rngs (fold_in on state.step) and advance the
        step counter by 2."""
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path, optim__steps_per_dispatch=2,
                       data__synthetic_length=16)
        t = AdaMMLTrainer(cfg)
        batches = []
        it = iter(t.train_loader)
        for _ in range(2):
            batches.append(t.train_pre(next(it)))
        lr = jnp.asarray(0.01)
        cw = jnp.asarray([1.0, 0.05])
        rng = jax.random.PRNGKey(7)

        snap = jax.device_get(t.state)
        inputs, target = batches[0]
        s1, m_single = t.step_policy(t.state, inputs, target, lr, lr, cw,
                                     rng)
        step_single = int(jax.device_get(s1.step))

        # (a) K=1 scan, same batch/rng: forward-path metrics must agree.
        # (Post-Adam PARAMS are not comparable across compiled programs:
        # Adam's first step is lr*sign(grad), so near-zero grads amplify fp
        # reduction-reorder noise into full +-lr sign flips.)
        s2 = jax.device_put(snap)
        one = [x[None] for x in batches[0][0]]
        s2, m_one = t.multi_policy(s2, one, batches[0][1][None], lr, lr, cw,
                                   rng)
        for key in ("loss", "cls_loss", "policy_loss", "top1"):
            np.testing.assert_allclose(float(m_one[key][0]),
                                       float(m_single[key]), rtol=1e-4,
                                       atol=1e-5)
        np.testing.assert_allclose(np.asarray(m_one["selection"][0]),
                                   np.asarray(m_single["selection"]),
                                   atol=1e-6)

        # (b) K=2 scan: distinct rngs per sub-step, counter advances by 2
        s3 = jax.device_put(snap)
        stacked = [jnp.stack([b[0][mi] for b in batches])
                   for mi in range(len(batches[0][0]))]
        targets = jnp.stack([b[1] for b in batches])
        s3, m_multi = t.multi_policy(s3, stacked, targets, lr, lr, cw, rng)
        assert m_multi["loss"].shape == (2,)
        assert int(jax.device_get(s3.step)) == step_single + 1
        assert float(m_multi["loss"][0]) != float(m_multi["loss"][1])

    def test_trainer_runs_with_steps_per_dispatch(self, tmp_path):
        """Engine path: full curriculum with K=2 incl. a tail remainder
        (synthetic_length 8 / batch 8 = 1 batch per epoch -> remainder)."""
        from adamml_tpu.train.curriculum import AdaMMLTrainer

        cfg = tiny_cfg(tmp_path, optim__steps_per_dispatch=2,
                       data__synthetic_length=24)
        t = AdaMMLTrainer(cfg)
        result = t.run()
        assert "top1" in result


class TestGpuRuntimeFlags:
    def test_reference_gpu_flags_accepted_with_warning(self, capsys):
        """Reference README commands (--multiprocessing-distributed etc.)
        must parse; the GPU-runtime flags warn instead of silently no-oping
        or erroring (reference opts.py:38-40,139-146)."""
        from adamml_tpu.configs.config import arg_parser, validate_args

        parser = arg_parser()
        args = parser.parse_args(
            ["--multiprocessing-distributed", "--gpu", "0,1",
             "--dist-backend", "nccl", "--disable_cudnn_benchmark"])
        validate_args(parser, args)
        out = capsys.readouterr().out
        assert out.count("GPU-runtime flag") == 4
