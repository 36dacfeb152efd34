"""The 3-stage AdaMML curriculum driver and the unimodal trainer.

Stage semantics follow reference train_adamml.py:334-626:

  warmup     (warmup_epochs): policy frozen, cost weights zeroed
  alternating (epochs): per epoch, one main-net pass (policy frozen, zero
      cost) then one policy pass (main frozen, configured cost), then
      validation, scheduler steps, checkpoint + selection artifacts, and
      Gumbel temperature decay x0.965
  finetune   (finetune_epochs): reload model_best, policy frozen, zero cost

Both optimizers are re-initialized at stage boundaries (reference
train_adamml.py:387-395,520-528). Checkpoints carry temperature + stage so
restarts re-enter the right phase (reference train_adamml.py:281-312).
"""

from __future__ import annotations

import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..configs.config import ExperimentConfig, arch_name
from ..data.dataflow import HostDataLoader
from ..data.device_pipeline import (make_batch_preprocessor,
                                    make_unimodal_preprocessor)
from ..data.synthetic import SyntheticVideoDataset
from ..data.video_dataset import MultiVideoDataset
from ..models.adamml import INIT_TEMPERATURE, TEMPERATURE_DECAY
from ..models.model_builder import (_capacity_groups, _data_shards,
                                    build_model, example_inputs,
                                    init_model)
from ..parallel.mesh import make_mesh, place_on_mesh, shard_batch
from ..utils.logging import RankZeroLogger
from ..ckpt.checkpoint import (CheckpointManager, load_checkpoint, peek_meta,
                               save_checkpoint)
from .engine import train_epoch, validate
from .optim import build_optimizer
from .schedulers import ReduceLROnPlateau, lr_at_epoch
from .steps import (make_adamml_eval_step, make_adamml_train_step,
                    make_unimodal_eval_step, make_unimodal_train_step)
from .train_state import AdaMMLTrainState, StageFlags


def _optim_layout(cfg: ExperimentConfig) -> str:
    """Optimizer-state layout tag persisted in checkpoint meta: the fused
    optimizers store one raveled vector per state slot while the per-tensor
    optax path stores a params-shaped tree, so a checkpoint written under one
    layout cannot restore under the other (the orbax structure mismatch is
    opaque). Recording the layout turns that into a clear error."""
    return "fused" if getattr(cfg.optim, "fused_update", True) else "per_tensor"


def _check_optim_layout(cfg: ExperimentConfig, meta: Dict, path: str) -> None:
    saved = meta.get("optim_layout")
    want = _optim_layout(cfg)
    if saved is not None and saved != want:
        flag = ("--no_fused_update" if saved == "per_tensor"
                else "(drop --no_fused_update)")
        raise RuntimeError(
            f"checkpoint {path!r} was written with optimizer layout "
            f"{saved!r} but this run uses {want!r}; restore would fail with "
            f"an orbax tree-structure mismatch. Re-run with {flag} to match "
            f"the checkpoint.")


def _make_dataset(cfg: ExperimentConfig, *, is_train: bool, num_clips: int):
    d, m = cfg.data, cfg.model
    # --random_sampling drives non-fixed-offset val/test clip starts
    # (reference opts.py:91 -> utils/video_dataset.py fixed_offset)
    fixed_offset = not d.random_sampling
    if d.dataset == "synthetic":
        return SyntheticVideoDataset(
            modality=m.modality, length=d.synthetic_length,
            num_groups=m.groups, frames_per_group=m.frames_per_group,
            num_clips=num_clips,
            num_classes=m.num_classes, canvas_size=d.canvas_size,
            audio_length=d.audio_length, resampling_rate=d.resampling_rate,
            is_train=is_train, dense_sampling=d.dense_sampling,
            fixed_offset=fixed_offset,
            seed=cfg.runtime.seed + (0 if is_train else 1))
    from ..configs.dataset_config import get_dataset_config

    meta = get_dataset_config(d.dataset)
    list_name = meta.train_list_name if is_train else meta.val_list_name
    kwargs = dict(num_groups=m.groups, frames_per_group=m.frames_per_group,
                  num_clips=num_clips, dense_sampling=d.dense_sampling,
                  fixed_offset=fixed_offset,
                  image_tmpl=meta.image_tmpl, is_train=is_train,
                  separator=meta.filename_separator,
                  filter_video=meta.filter_video,
                  num_classes=m.num_classes, fps=d.fps,
                  audio_length=d.audio_length,
                  resampling_rate=d.resampling_rate,
                  canvas_size=d.canvas_size,
                  use_native_decoder=d.use_native_decoder,
                  decode_threads=d.decode_threads)
    # MultiVideoDataset covers unimodal too (single-entry modality list), so
    # every consumer sees the same {modality: payload} contract.
    return MultiVideoDataset(d.datadir, list_name, m.modality, **kwargs)


def _make_loader(cfg: ExperimentConfig, dataset, *, is_train: bool):
    per_process = cfg.optim.batch_size // max(1, jax.process_count())
    return HostDataLoader(
        dataset, per_process, is_train=is_train,
        input_size=cfg.data.input_size, augmentor_ver=cfg.data.augmentor_ver,
        scale_range=cfg.data.scale_range,
        disable_scaleup=cfg.data.disable_scaleup,
        workers=cfg.data.workers, seed=cfg.runtime.seed,
        num_shards=jax.process_count(), shard_index=jax.process_index(),
        num_crops=cfg.data.num_crops)


class AdaMMLTrainer:
    """End-to-end multi-modal trainer (reference train_adamml.py:66-626)."""

    def __init__(self, cfg: ExperimentConfig) -> None:
        self.cfg = cfg
        self.mesh = make_mesh(cfg.runtime.mesh_data, cfg.runtime.mesh_model)
        self.model, self.arch_name = build_model(cfg)
        self.modality = cfg.model.major_modality
        self.log_folder = os.path.join(cfg.runtime.logdir or "logs",
                                       self.arch_name)
        self.rank = jax.process_index()

        # data
        self.train_dataset = _make_dataset(cfg, is_train=True,
                                           num_clips=cfg.model.num_segments)
        self.val_dataset = _make_dataset(cfg, is_train=False,
                                         num_clips=cfg.data.val_num_clips)
        self.train_loader = _make_loader(cfg, self.train_dataset,
                                         is_train=True)
        self.val_loader = _make_loader(cfg, self.val_dataset, is_train=False)
        train_pre = make_batch_preprocessor(
            cfg, train=True, num_segments=cfg.model.num_segments)
        val_pre = make_batch_preprocessor(
            cfg, train=False, num_segments=cfg.data.val_num_clips)
        self.train_pre = lambda hb: train_pre(shard_batch(hb, self.mesh))
        self.val_pre = lambda hb: val_pre(shard_batch(hb, self.mesh))

        # model state
        rng = jax.random.PRNGKey(cfg.runtime.seed)
        inputs = example_inputs(cfg, batch=2,
                                num_segments=cfg.model.num_segments)
        variables = init_model(self.model, cfg, inputs, rng, train=True)
        params = dict(variables["params"])
        batch_stats = variables.get("batch_stats", {})
        self.has_policy = "policy_net" in params
        self.tx_main = build_optimizer("main", cfg.optim)
        self.tx_policy = build_optimizer("policy", cfg.optim)
        main_opt = self.tx_main.init(params["main_net"])
        policy_opt = (self.tx_policy.init(params["policy_net"])
                      if self.has_policy else None)
        state = AdaMMLTrainState.create(params, batch_stats, main_opt,
                                        policy_opt,
                                        temperature=INIT_TEMPERATURE)
        # pretrained loading (reference train_adamml.py:144-158 and
        # joint_resnet_mobilenetv2.py:141-155)
        if cfg.runtime.unimodality_pretrained:
            from ..ckpt.pretrained import load_unimodality_pretrained

            state = load_unimodality_pretrained(
                state, self.modality, cfg.runtime.unimodality_pretrained,
                depth=cfg.model.depth, fusion_point=cfg.model.fusion_point)
        if cfg.runtime.pretrained:
            from ..ckpt.pretrained import load_pretrained_adamml

            state = load_pretrained_adamml(state, cfg.runtime.pretrained)
            if self.rank == 0:
                print(f"=> using pre-trained model "
                      f"(temperature: {float(np.asarray(state.temperature))})",
                      flush=True)
        self.state = place_on_mesh(state, self.mesh)

        # steps
        common = dict(penalty_type=cfg.model.penalty_type,
                      gammas=cfg.model.gammas,
                      clip_gradient=cfg.optim.clip_gradient,
                      has_policy_params=self.has_policy)
        self.step_main = make_adamml_train_step(
            self.model, self.tx_main, self.tx_policy,
            flags=StageFlags.main_phase(), **common)
        self.step_policy = make_adamml_train_step(
            self.model, self.tx_main, self.tx_policy,
            flags=StageFlags.policy_phase(), **common)
        self.eval_step = make_adamml_eval_step(
            self.model, num_crops=cfg.data.num_crops)
        self.steps_per_dispatch = max(1, cfg.optim.steps_per_dispatch)
        self.multi_main = self.multi_policy = None
        if self.steps_per_dispatch > 1:
            from .steps import make_adamml_multi_step

            self.multi_main = make_adamml_multi_step(
                self.model, self.tx_main, self.tx_policy,
                flags=StageFlags.main_phase(), **common)
            self.multi_policy = make_adamml_multi_step(
                self.model, self.tx_main, self.tx_policy,
                flags=StageFlags.policy_phase(), **common)

        self.best_top1 = 0.0
        self.curr_stage = cfg.optim.curr_stage
        self.start_epoch = cfg.optim.start_epoch
        self.rng = jax.random.fold_in(rng, 17)
        self.plateau: Optional[ReduceLROnPlateau] = None
        self.p_plateau: Optional[ReduceLROnPlateau] = None
        if cfg.optim.lr_scheduler == "plateau":
            self.plateau = ReduceLROnPlateau(cfg.optim.lr)
            self.p_plateau = ReduceLROnPlateau(cfg.optim.p_lr)

    # -- lr --------------------------------------------------------------

    def _lr(self, epoch: int, base: float, plateau) -> float:
        o = self.cfg.optim
        if o.lr_scheduler == "plateau":
            return plateau.lr
        return lr_at_epoch(o.lr_scheduler, base, epoch, o.lr_steps, o.epochs)

    # -- checkpointing -----------------------------------------------------

    def _meta(self, epoch: int, stage: str) -> Dict:
        # scheduler + trainer-rng state ride in the meta payload so resumes
        # continue at the decayed LR / rng position (reference checkpoints
        # save p_scheduler/scheduler state dicts, train_adamml.py:373-383)
        meta = {"epoch": epoch, "arch": self.arch_name,
                "best_top1": float(self.best_top1), "stage": stage,
                "optim_layout": _optim_layout(self.cfg),
                "rng": np.asarray(jax.device_get(self.rng)).tolist()}
        if self.plateau is not None:
            meta["scheduler"] = self.plateau.state_dict()
            meta["p_scheduler"] = self.p_plateau.state_dict()
        return meta

    def save(self, epoch: int, stage: str, suffix: str,
             is_best: bool = False) -> None:
        save_checkpoint(self.state, self._meta(epoch, stage),
                        self.log_folder, is_best=is_best, epoch=epoch,
                        suffix=suffix)

    def maybe_resume(self, logger) -> None:
        r = self.cfg.runtime
        resume = r.resume
        if r.auto_resume and not resume:
            latest = CheckpointManager(self.log_folder).latest()
            if latest:
                resume = latest
                logger.log("Found the checkpoint in the log folder, "
                           "will resume from there.")
        if not resume:
            return
        _check_optim_layout(self.cfg, peek_meta(resume), resume)
        self.state, meta = load_checkpoint(resume, self.state)
        self.best_top1 = meta["best_top1"]
        self.curr_stage = meta["stage"]
        self.start_epoch = meta["epoch"]
        if "rng" in meta:
            self.rng = jnp.asarray(meta["rng"], jnp.uint32)
        if self.plateau is not None and "scheduler" in meta:
            self.plateau.load_state_dict(meta["scheduler"])
            self.p_plateau.load_state_dict(meta["p_scheduler"])
        logger.log(f"=> loaded checkpoint '{resume}' (epoch {meta['epoch']})")

    def _reset_optimizers(self) -> None:
        """Stage transition re-init (reference train_adamml.py:387-395)."""
        params = self.state.params
        main_opt = place_on_mesh(self.tx_main.init(params["main_net"]),
                                 self.mesh)
        policy_opt = (place_on_mesh(self.tx_policy.init(params["policy_net"]),
                                    self.mesh)
                      if self.has_policy else None)
        self.state = self.state.replace(main_opt=main_opt,
                                        policy_opt=policy_opt)

    # -- phases ------------------------------------------------------------

    def _train_one(self, step_fn, epoch: int, cost_weights, logger,
                   lr_epoch: Optional[int] = None):
        """lr_epoch overrides the epoch index the LR schedule sees: the
        warmup stage passes 0 because the reference never steps its
        schedulers during warmup (train_adamml.py:340-395 contains no
        scheduler.step), so warmup always runs at the base LR even when a
        multisteps milestone falls inside the warmup window."""
        self.rng, sub = jax.random.split(self.rng)
        profiler = None
        if self.cfg.runtime.profile_dir and epoch == 0:
            from ..utils.profiling import StepProfiler

            profiler = StepProfiler(self.cfg.runtime.profile_dir)
        multi_fn = (self.multi_main if step_fn is self.step_main
                    else self.multi_policy)
        sched_epoch = epoch if lr_epoch is None else lr_epoch
        self.state, summary = train_epoch(
            self.train_loader, self.train_pre, step_fn, self.state,
            lr=self._lr(sched_epoch, self.cfg.optim.lr, self.plateau),
            p_lr=self._lr(sched_epoch, self.cfg.optim.p_lr, self.p_plateau),
            cost_weights=cost_weights, rng=sub, epoch=epoch,
            modality=self.modality, adamml=True,
            display=self.cfg.runtime.print_freq, rank=self.rank,
            logger=logger, profiler=profiler, multi_step_fn=multi_fn,
            steps_per_dispatch=self.steps_per_dispatch)
        if profiler is not None:
            profiler.close()
        return summary

    def _validate(self):
        self.rng, sub = jax.random.split(self.rng)
        return validate(self.val_loader, self.val_pre, self.eval_step,
                        self.state, rng=sub, modality=self.modality,
                        adamml=True, num_segments=self.cfg.data.val_num_clips,
                        eval_capacity=self.cfg.model.eval_capacity,
                        capacity_groups=_capacity_groups(self.cfg),
                        rank=self.rank)

    def _log_train(self, logger, epoch, total, s):
        sel = " ".join(f"{k}:{v * 100:.2f}" for k, v in s["selection"].items())
        logger.log(
            f"Train: [{epoch + 1:03d}/{total:03d}]\tLoss: {s['loss']:4.4f}\t"
            f"Top@1: {s['top1']:.4f}\tTop@5: {s['top5']:.4f}\t"
            f"Speed: {s['batch_time'] * 1000.0:.2f} ms/batch (dispatch) "
            f"{s['wall_time'] * 1000.0:.2f} ms/batch (drained)\t"
            f"Data loading: {s['data_time'] * 1000.0:.2f} ms/batch\t"
            f"Selection: {sel}")

    def _log_val(self, logger, epoch, total, v):
        sel = " ".join(f"{k}:{val * 100:.2f}"
                       for k, val in v["selection"].items())
        logger.log(
            f"Val: [{epoch + 1:03d}/{total:03d}]: \tLoss: {v['loss']:4.4f}\t"
            f"Top@1: {v['top1']:.4f}\tTop@5: {v['top5']:.4f}\t"
            f"mAP: {v['mAP']:.4f}\t"
            f"Speed: {v['batch_time'] * 1000.0:.2f} ms/batch\t"
            f"flops: {v['flops']:.2f}\tSelection: {sel}")
        dropped = v.get("capacity_dropped")
        if dropped and any(dropped.values()):
            drops = " ".join(f"{k}:{n}" for k, n in dropped.items())
            logger.log(f"WARNING: eval_capacity packing dropped selected "
                       f"segments (executed < modeled): {drops}")

    def _dump_selections(self, tag: str, epoch: int, selections) -> None:
        if self.rank != 0:
            return
        os.makedirs(self.log_folder, exist_ok=True)
        np.savez(os.path.join(self.log_folder,
                              f"all_selection_{tag}_{epoch + 1}.npz"),
                 modality="_".join(self.modality),
                 selections=np.asarray(selections).astype(bool))

    def evaluate(self, logger=None) -> Dict:
        """-e / --evaluate path (reference train_adamml.py:203-224)."""
        v = self._validate()
        if self.rank == 0:
            os.makedirs(self.log_folder, exist_ok=True)
            np.savez(os.path.join(self.log_folder, "all_selection.npz"),
                     modality="_".join(self.modality),
                     selections=np.asarray(v["all_selections"]).astype(bool))
            np.save(os.path.join(
                self.log_folder,
                f"val_{self.cfg.data.num_crops}crops_"
                f"{self.cfg.data.val_num_clips}clips_"
                f"{self.cfg.data.input_size}_details_.npy"), v["outputs"])
            if logger is not None:
                self._log_val(logger, 0, 1, v)
        return v

    # -- main run loop ------------------------------------------------------

    def run(self, max_steps_per_epoch: int = 10**12) -> Dict:
        cfg = self.cfg
        logger = RankZeroLogger(self.log_folder, rank=self.rank,
                                append=bool(cfg.runtime.resume
                                            or cfg.runtime.auto_resume))
        self.maybe_resume(logger)
        zeros = [0.0] * len(self.modality)
        cost = (cfg.model.cost_weights if cfg.model.cost_weights is not None
                else zeros)
        last_val: Dict = {}

        if self.curr_stage == "warmup":
            # NOTE: warmup runs NO validation, matching the reference
            # (train_adamml.py:340-395); best_top1 therefore stays 0.0 through
            # warmup and the FIRST alternating epoch always becomes
            # model_best. Do not "fix" this here without changing the
            # reference comparison.
            logger.log(f"Stage [Warming up]: Main network with "
                       f"{cfg.optim.warmup_epochs} epochs")
            for epoch in range(self.start_epoch, cfg.optim.warmup_epochs):
                s = self._train_one(self.step_main, epoch, zeros, logger,
                                    lr_epoch=0)
                self._log_train(logger, epoch, cfg.optim.warmup_epochs, s)
                self.save(epoch + 1, "warmup", "_warmup")
            self.curr_stage = "alternative_training"
            self.start_epoch = 0
            self._reset_optimizers()

        if self.curr_stage == "alternative_training":
            # LR semantics: the schedule is applied LIVE per epoch
            # (schedulers.lr_at_epoch closed form == torch's explicit-epoch
            # scheduler.step(epoch+1), reference train_adamml.py:460-465).
            # Note a reference defect we fix rather than replicate: its
            # schedulers are created once over the ORIGINAL optimizer
            # objects (train_adamml.py:259-270) while both stage boundaries
            # REBIND optimizer/p_optimizer to fresh objects
            # (train_adamml.py:387-395, 519-528), so in a fresh reference
            # run scheduler.step mutates the discarded optimizers and the
            # live LR never decays. Its checkpoints save scheduler state and
            # its resume path re-binds everything consistently, so live
            # decay is the documented intent; tests/test_parity_training.py
            # ::TestFullCurriculumParity pins our trajectory against torch
            # with the schedulers rebound the way the reference's own
            # resume produces.
            logger.log(f"Stage [Alternative training]: {cfg.optim.epochs} "
                       f"epochs")
            for epoch in range(self.start_epoch, cfg.optim.epochs):
                logger.log("Stage [Alternative training]: Training Main net")
                s = self._train_one(self.step_main, epoch, zeros, logger)
                self._log_train(logger, epoch, cfg.optim.epochs, s)
                logger.log("Stage [Alternative training]: Training Policy net")
                s = self._train_one(self.step_policy, epoch, cost, logger)
                v = self._validate()
                last_val = v
                if cfg.optim.lr_scheduler == "plateau":
                    self.plateau.step(v["loss"])
                    self.p_plateau.step(v["loss"])
                self._log_train(logger, epoch, cfg.optim.epochs, s)
                self._log_val(logger, epoch, cfg.optim.epochs, v)
                self._dump_selections("main", epoch, v["all_selections"])
                is_best = v["top1"] > self.best_top1
                self.best_top1 = max(v["top1"], self.best_top1)
                self.save(epoch + 1, "alternative_training", "_main",
                          is_best=is_best)
                # temperature decay (reference train_adamml.py:516)
                self.state = self.state.replace(
                    temperature=self.state.temperature * TEMPERATURE_DECAY)
            self.curr_stage = "finetune"
            self.start_epoch = 0
            self._reset_optimizers()

        if self.curr_stage == "finetune":
            logger.log(f"Stage [Post finetuning]: Finetune the main network "
                       f"{cfg.optim.finetune_epochs} epochs")
            if cfg.optim.finetune_epochs > 0:
                if self.start_epoch == 0:
                    best = CheckpointManager(self.log_folder).best()
                    if best:  # reference train_adamml.py:538-551
                        _check_optim_layout(self.cfg, peek_meta(best), best)
                        self.state, meta = load_checkpoint(best, self.state)
                        logger.log(f"Loaded model_best (epoch "
                                   f"{meta['epoch']}) for finetune")
                    else:
                        logger.log("Can not find the best model. "
                                   "Use the last checkpoint.")
                for epoch in range(self.start_epoch,
                                   cfg.optim.finetune_epochs):
                    s = self._train_one(self.step_main, epoch, zeros, logger)
                    v = self._validate()
                    last_val = v
                    if cfg.optim.lr_scheduler == "plateau":
                        self.plateau.step(v["loss"])
                        self.p_plateau.step(v["loss"])
                    self._log_train(logger, epoch, cfg.optim.finetune_epochs, s)
                    self._log_val(logger, epoch, cfg.optim.finetune_epochs, v)
                    self._dump_selections("finetune", epoch,
                                          v["all_selections"])
                    is_best = v["top1"] > self.best_top1
                    self.best_top1 = max(v["top1"], self.best_top1)
                    self.save(epoch + 1, "finetune", "_finetune",
                              is_best=is_best)
        logger.close()
        return last_val


class UnimodalTrainer:
    """Single-modality pretraining (reference train_unimodal.py:64-401)."""

    def __init__(self, cfg: ExperimentConfig) -> None:
        self.cfg = cfg
        if cfg.optim.steps_per_dispatch > 1:
            # fail loudly instead of silently ignoring the flag (the
            # scanned multi-step dispatch is wired into AdaMMLTrainer only)
            raise ValueError(
                "--steps_per_dispatch > 1 is not supported by "
                "train_unimodal; it applies to the AdaMML trainer only")
        self.mesh = make_mesh(cfg.runtime.mesh_data, cfg.runtime.mesh_model)
        self.model, self.arch_name = build_model(cfg)
        self.log_folder = os.path.join(cfg.runtime.logdir or "logs",
                                       self.arch_name)
        self.rank = jax.process_index()

        self.train_dataset = _make_dataset(cfg, is_train=True,
                                           num_clips=cfg.data.num_clips)
        self.val_dataset = _make_dataset(cfg, is_train=False,
                                         num_clips=cfg.data.num_clips)
        self.train_loader = _make_loader(cfg, self.train_dataset,
                                         is_train=True)
        self.val_loader = _make_loader(cfg, self.val_dataset, is_train=False)
        train_pre = make_unimodal_preprocessor(cfg, train=True,
                                               num_clips=cfg.data.num_clips)
        val_pre = make_unimodal_preprocessor(cfg, train=False,
                                             num_clips=cfg.data.num_clips)
        self.train_pre = lambda hb: train_pre(shard_batch(hb, self.mesh))
        self.val_pre = lambda hb: val_pre(shard_batch(hb, self.mesh))

        rng = jax.random.PRNGKey(cfg.runtime.seed)
        m = cfg.model.modality[0]
        if m == "sound":
            from ..ops.spectrogram import SpectrogramConfig

            spec = SpectrogramConfig(
                resampling_rate=int(cfg.data.resampling_rate),
                audio_length=cfg.data.audio_length)
            x = jnp.zeros((2, cfg.data.num_clips, spec.num_freqs,
                           spec.num_frames, 1))
        else:
            from ..models.model_builder import modality_input_shape

            shape = modality_input_shape(cfg, m, 2, cfg.data.num_clips)
            x = jnp.zeros((2, shape[1] * shape[2]) + shape[3:])
        variables = init_model(self.model, cfg, x, rng, train=True)
        self.tx = build_optimizer("main", cfg.optim)
        state = AdaMMLTrainState.create(
            variables["params"], variables.get("batch_stats", {}),
            self.tx.init(variables["params"]), None)
        self.state = place_on_mesh(state, self.mesh)
        self.train_step = make_unimodal_train_step(
            self.model, self.tx, clip_gradient=cfg.optim.clip_gradient)
        self.eval_step = make_unimodal_eval_step(
            self.model, num_crops=cfg.data.num_crops)
        self.best_top1 = 0.0
        self.start_epoch = cfg.optim.start_epoch
        self.rng = jax.random.fold_in(rng, 23)
        self.plateau = (ReduceLROnPlateau(cfg.optim.lr)
                        if cfg.optim.lr_scheduler == "plateau" else None)

    def maybe_resume(self, logger) -> None:
        r = self.cfg.runtime
        resume = r.resume
        if r.auto_resume and not resume:
            latest = CheckpointManager(self.log_folder).latest()
            if latest:
                resume = latest
                logger.log("Found the checkpoint in the log folder, "
                           "will resume from there.")
        if not resume:
            return
        _check_optim_layout(self.cfg, peek_meta(resume), resume)
        self.state, meta = load_checkpoint(resume, self.state)
        self.best_top1 = meta["best_top1"]
        self.start_epoch = meta["epoch"]
        if "rng" in meta:
            self.rng = jnp.asarray(meta["rng"], jnp.uint32)
        if self.plateau is not None and "scheduler" in meta:
            self.plateau.load_state_dict(meta["scheduler"])
        logger.log(f"=> loaded checkpoint '{resume}' (epoch {meta['epoch']})")

    def run(self) -> Dict:
        cfg = self.cfg
        logger = RankZeroLogger(self.log_folder, rank=self.rank,
                                append=bool(cfg.runtime.resume
                                            or cfg.runtime.auto_resume))
        self.maybe_resume(logger)
        last: Dict = {}
        for epoch in range(self.start_epoch, cfg.optim.epochs):
            lr = (self.plateau.lr if self.plateau else
                  lr_at_epoch(cfg.optim.lr_scheduler, cfg.optim.lr, epoch,
                              cfg.optim.lr_steps, cfg.optim.epochs))
            self.rng, sub = jax.random.split(self.rng)
            self.state, s = train_epoch(
                self.train_loader, self.train_pre, self.train_step,
                self.state, lr=lr, rng=sub, epoch=epoch, adamml=False,
                display=cfg.runtime.print_freq, rank=self.rank, logger=logger)
            logger.log(
                f"Train: [{epoch + 1:03d}/{cfg.optim.epochs:03d}]\t"
                f"Loss: {s['loss']:4.4f}\tTop@1: {s['top1']:.4f}\t"
                f"Top@5: {s['top5']:.4f}\t"
                f"Speed: {s['batch_time'] * 1000.0:.2f} ms/batch (dispatch) "
                f"{s['wall_time'] * 1000.0:.2f} ms/batch (drained)")
            # lazy_eval: every 10 epochs + final 10% (reference
            # train_unimodal.py:341-346)
            do_eval = True
            if cfg.runtime.lazy_eval:
                do_eval = ((epoch + 1) % 10 == 0
                           or epoch >= int(cfg.optim.epochs * 0.9))
            if do_eval:
                self.rng, sub = jax.random.split(self.rng)
                v = validate(self.val_loader, self.val_pre, self.eval_step,
                             self.state, rng=sub, adamml=False,
                             rank=self.rank)
                last = v
                if self.plateau:
                    self.plateau.step(v["loss"])
                logger.log(
                    f"Val: [{epoch + 1:03d}/{cfg.optim.epochs:03d}]\t"
                    f"Loss: {v['loss']:4.4f}\tTop@1: {v['top1']:.4f}\t"
                    f"Top@5: {v['top5']:.4f}\tmAP: {v['mAP']:.4f}")
                is_best = v["top1"] > self.best_top1
                self.best_top1 = max(v["top1"], self.best_top1)
            else:
                is_best = False
            meta = {"epoch": epoch + 1, "arch": self.arch_name,
                    "best_top1": float(self.best_top1), "stage": "unimodal",
                    "optim_layout": _optim_layout(self.cfg),
                    "rng": np.asarray(jax.device_get(self.rng)).tolist()}
            if self.plateau is not None:
                meta["scheduler"] = self.plateau.state_dict()
            save_checkpoint(self.state, meta, self.log_folder,
                            is_best=is_best, epoch=epoch + 1)
        logger.close()
        return last
