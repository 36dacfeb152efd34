"""Model factory (reference models/model_builder.py:3-38).

Maps backbone names to flax modules and provides shape helpers for building
example/init inputs with the canonical (N, S, F, H, W, C) layout.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp

from ..configs.config import ExperimentConfig, arch_name
from ..ops.spectrogram import SpectrogramConfig
from .adamml import AdaMML
from .mobilenet_v2 import MobileNetV2
from .resnet_tsn import ResNetTSN


def _dtype(cfg: ExperimentConfig):
    return jnp.bfloat16 if cfg.model.compute_dtype == "bfloat16" else jnp.float32


def _bn_axis(cfg: ExperimentConfig) -> Optional[str]:
    # Under GSPMD jit, BatchNorm's batch reduction is already GLOBAL over the
    # sharded batch (XLA inserts the collective), i.e. SyncBN semantics
    # (reference train_adamml.py:125-127) hold by construction -- no bound
    # axis name needed. The models' bn_axis_name hook exists for shard_map
    # callers that want explicit per-axis pmean control.
    return None


def _data_shards(cfg: ExperimentConfig) -> int:
    """Resolved size of the mesh 'data' axis (parallel/mesh.make_mesh)."""
    model = max(1, cfg.runtime.mesh_model)
    data = cfg.runtime.mesh_data
    if data is None or data <= 0:
        data = max(1, len(jax.devices()) // model)
    return data


def _capacity_groups(cfg: ExperimentConfig) -> int:
    """Packing-group count for eval_capacity. Defaults to one group per
    data shard (each shard packs its local rows -- no cross-shard gather).
    Per-shard packing has no global slack-sharing, so the executed row set
    depends on the mesh; --capacity_groups pins it to a fixed value so
    capacity-eval accuracy is reproducible across device counts (ADVICE
    r4). The engine's capacity-drop accounting MUST use this same resolver
    (train/engine.py validate)."""
    if cfg.model.capacity_groups is not None:
        if cfg.model.capacity_groups < 1:
            raise ValueError(
                f"--capacity_groups must be >= 1, got "
                f"{cfg.model.capacity_groups}")
        return cfg.model.capacity_groups
    return _data_shards(cfg)


def _bn_groups(cfg: ExperimentConfig) -> int:
    """Moment scope for GroupedBatchNorm (models/norm.py). The reference's
    DEFAULT is per-replica BN; SyncBN is opt-in via --sync-bn (reference
    train_adamml.py:125-127, opts.py:131). Per-replica = one moment group per
    data-parallel shard; --sync-bn = one global group."""
    if cfg.runtime.sync_bn:
        return 1
    return _data_shards(cfg)


def build_model(cfg: ExperimentConfig) -> Tuple[object, str]:
    m = cfg.model
    if m.backbone_net == "adamml":
        model = AdaMML(
            modality=tuple(m.modality), num_classes=m.num_classes,
            depth=m.depth, dropout=m.dropout,
            without_t_stride=m.without_t_stride,
            pooling_method=m.pooling_method, fusion_point=m.fusion_point,
            learnable_lf_weights=m.learnable_lf_weights,
            causality_modeling=m.causality_modeling, rng_policy=m.rng_policy,
            rng_threshold=m.rng_threshold,
            policy_input_size=m.policy_input_size,
            eval_capacity=m.eval_capacity,
            capacity_groups=_capacity_groups(cfg),
            use_pallas_dw=m.use_pallas_dw,
            remat=m.remat_backbone, remat_stages=tuple(m.remat_stages),
            remat_policy=m.remat_policy,
            fused_tpool=m.fused_tpool,
            dtype=_dtype(cfg), bn_axis_name=_bn_axis(cfg),
            bn_groups=_bn_groups(cfg))
    elif m.backbone_net == "resnet":
        model = ResNetTSN(
            depth=m.depth, num_classes=m.num_classes, dropout=m.dropout,
            without_t_stride=m.without_t_stride,
            pooling_method=m.pooling_method, dtype=_dtype(cfg),
            bn_axis_name=_bn_axis(cfg), bn_groups=_bn_groups(cfg),
            remat=m.remat_backbone, remat_stages=tuple(m.remat_stages),
            fused_tpool=m.fused_tpool)
    elif m.backbone_net == "sound_mobilenet_v2":
        model = MobileNetV2(
            num_classes=m.num_classes, dropout=m.dropout,
            use_pallas_dw=m.use_pallas_dw, dtype=_dtype(cfg),
            bn_axis_name=_bn_axis(cfg), bn_groups=_bn_groups(cfg))
    else:
        raise ValueError(f"unknown backbone_net {m.backbone_net!r}")
    return model, arch_name(cfg)


MODEL_TABLE = {"adamml": AdaMML, "resnet": ResNetTSN,
               "sound_mobilenet_v2": MobileNetV2}


def modality_input_shape(cfg: ExperimentConfig, modality: str, batch: int,
                         num_segments: int) -> Tuple[int, ...]:
    """Canonical device input shape for one modality.

    Visual: (N, S, F, H, W, C) with C = 3 (rgb), 2*5->(F*5, 2)? No --
    channels are packed per frame position: rgb C=3; flow C=2 with F
    expanded by the 5 consecutive frames; rgbdiff C=3 likewise. We keep the
    reference's channel packing instead: flow (N, S, F, H, W, 10) and
    rgbdiff (N, S, F, H, W, 15) so the backbone sees the reference's
    input_channels (reference train_adamml.py:86-95).
    Sound: (N, S, 1, 256, 256, 1) log-spectrogram per segment.
    """
    g = cfg.model.groups
    size = cfg.data.input_size
    if modality == "sound":
        spec = SpectrogramConfig(
            resampling_rate=int(cfg.data.resampling_rate),
            audio_length=cfg.data.audio_length)
        return (batch, num_segments, 1, spec.num_freqs, spec.num_frames, 1)
    channels = {"rgb": 3, "flow": 10, "rgbdiff": 15}[modality]
    return (batch, num_segments, g, size, size, channels)


def example_inputs(cfg: ExperimentConfig, batch: int = 2,
                   num_segments: Optional[int] = None,
                   rng: Optional[jax.Array] = None) -> List[jax.Array]:
    """Random inputs with the canonical shapes, one per modality."""
    s = num_segments if num_segments is not None else cfg.model.num_segments
    rng = jax.random.PRNGKey(0) if rng is None else rng
    out = []
    for i, m in enumerate(cfg.model.modality):
        shape = modality_input_shape(cfg, m, batch, s)
        rng, sub = jax.random.split(rng)
        out.append(jax.random.normal(sub, shape, jnp.float32))
    return out


def count_params_flops_summary(model, state, cfg: ExperimentConfig) -> str:
    """Params + analytic forward GFLOPs summary, replacing the reference's
    torchsummary text (reference train_unimodal.py:127-134,
    utils/utils.py:98-108)."""
    from ..utils.flops import count_model_flops

    n_params = sum(int(x.size) for x in
                   jax.tree_util.tree_leaves(state.params))
    try:
        inputs = example_inputs(cfg, batch=1)
        if cfg.model.backbone_net != "adamml":
            x = inputs[0]
            x = x.reshape((x.shape[0], x.shape[1] * x.shape[2]) + x.shape[3:])
            flops = count_model_flops(
                model, {"params": state.params,
                        "batch_stats": state.batch_stats}, x, train=False)
        else:
            flops = count_model_flops(
                model, {"params": state.params,
                        "batch_stats": state.batch_stats}, inputs,
                train=False)
        flops_str = f"Total flops: {flops / 1e9:.3f} GFLOPs (fwd, batch 1)"
    except Exception as e:  # cost analysis is best-effort per backend
        flops_str = f"Total flops: unavailable ({e})"
    return f"Total params: {n_params / 1e6:.3f}M\n{flops_str}"


def init_model(model, cfg: ExperimentConfig, inputs, rng: jax.Array,
               train: bool = True):
    """Initialize variables ({'params', 'batch_stats'}) for any backbone."""
    rngs = {"params": rng, "gumbel": jax.random.fold_in(rng, 1),
            "dropout": jax.random.fold_in(rng, 2),
            "policy": jax.random.fold_in(rng, 3)}
    if cfg.model.backbone_net == "adamml":
        return model.init(rngs, inputs, train=train)
    # unimodal backbones take a single (N, F, H, W, C) array
    return model.init(rngs, inputs, train=train)
