"""adamml_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework with the
capabilities of IBM/AdaMML (adaptive multi-modal learning for efficient video
recognition, ICCV 2021).

This is a from-scratch redesign, not a port: the compute path is flax/JAX with
static shapes and a single jitted train step; the per-segment Python loops of
the reference (reference models/adamml.py:84-86, models/policy_net.py:321-327)
become batch-folded convolutions and a lax.scan LSTM; distribution is a
jax.sharding Mesh with XLA collectives instead of NCCL DDP.

Package layout:
  configs/   flag surface + dataset registry (reference opts.py, utils/dataset_config.py)
  data/      frame samplers, host decode, wav/STFT, multi-modal dataset, prefetcher
  ops/       gumbel ST, temporal pooling, spectrogram, fused device augmentation
  models/    flax backbones (resnet_tsn, mobilenet_v2), joint nets, policy, adamml
  train/     losses, two-optimizer optax, schedulers, train/eval steps, curriculum
  parallel/  mesh construction, sharding rules, sync-BN helpers
  utils/     metrics (top-k / mAP), meters, modeled-FLOPs, logging
  ckpt/      orbax checkpointing + torch->jax weight converter
  cli/       train_adamml / train_unimodal entry points mirroring reference flags
"""

__version__ = "0.1.0"
