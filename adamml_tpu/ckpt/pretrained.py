"""Pretrained weight loading.

Three reference loading modes (SURVEY.md section 5.4):

  --pretrained: whole AdaMML model + Gumbel temperature, tolerant partial
      load (reference train_adamml.py:144-158, strict=False)
  --unimodality_pretrained: one checkpoint per modality, strict load into
      the corresponding main-net backbone (reference
      models/joint_resnet_mobilenetv2.py:141-155)
  resume: full state, handled by ckpt.checkpoint

Sources can be our orbax checkpoints or reference torch .pth/.pth.tar files
(converted on the fly via ckpt.torch_convert), so reference users can bring
their weights along.
"""

from __future__ import annotations

import os
from typing import Dict, Sequence

import jax
import numpy as np


def _restore_raw(path: str) -> Dict:
    """Orbax restore without a target -> plain numpy pytree."""
    import orbax.checkpoint as ocp

    return ocp.StandardCheckpointer().restore(os.path.abspath(path))


def _is_torch_file(path: str) -> bool:
    return os.path.isfile(path) and (path.endswith(".pth")
                                     or path.endswith(".pth.tar")
                                     or path.endswith(".pt"))


def _torch_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    sd = ckpt.get("state_dict", ckpt) if isinstance(ckpt, dict) else ckpt
    return {k: v.cpu().numpy() for k, v in sd.items()}


def _graft(dst: Dict, src: Dict, strict: bool, path: str = "") -> int:
    """Copy matching-shape leaves of src into dst (dicts of arrays).
    Returns the number of grafted leaves."""
    count = 0
    for k, v in src.items():
        where = f"{path}/{k}"
        if k not in dst:
            if strict:
                raise KeyError(f"missing key in target: {where}")
            continue
        if isinstance(v, dict):
            count += _graft(dst[k], v, strict, where)
        else:
            tgt = dst[k]
            if tuple(np.shape(tgt)) != tuple(np.shape(v)):
                if strict:
                    raise ValueError(
                        f"shape mismatch at {where}: "
                        f"{np.shape(tgt)} vs {np.shape(v)}")
                continue
            dst[k] = np.asarray(v).astype(np.asarray(tgt).dtype)
            count += 1
    return count


def _to_mutable(tree):
    if isinstance(tree, dict) or hasattr(tree, "items"):
        return {k: _to_mutable(v) for k, v in tree.items()}
    return np.asarray(jax.device_get(tree))


def load_pretrained_adamml(state, path: str):
    """Whole-model partial load + temperature (reference
    train_adamml.py:144-158). Returns the updated state (host arrays;
    caller re-places on the mesh)."""
    raw = _restore_raw(path)
    params = _to_mutable(state.params)
    stats = _to_mutable(state.batch_stats)
    n = _graft(params, raw.get("params", {}), strict=False)
    _graft(stats, raw.get("batch_stats", {}), strict=False)
    if n == 0:
        raise ValueError(f"no parameters matched in {path}")
    temperature = raw.get("temperature", state.temperature)
    return state.replace(params=params, batch_stats=stats,
                         temperature=np.asarray(temperature, np.float32))


def load_unimodality_pretrained(state, modality: Sequence[str],
                                paths: Sequence[str], depth: int,
                                fusion_point: str = "logits"):
    """Per-backbone strict load into main_net.net_<modality>
    (reference joint_resnet_mobilenetv2.py:141-155). Accepts orbax unimodal
    checkpoints or reference torch checkpoints."""
    from .torch_convert import (convert_mobilenet_v2_state_dict,
                                convert_resnet_state_dict)
    from ..configs.config import input_channels_for

    if len(paths) != len(modality):
        raise ValueError("the number of pretrained models is incorrect.")
    params = _to_mutable(state.params)
    stats = _to_mutable(state.batch_stats)
    for m, p in zip(modality, paths):
        if _is_torch_file(p):
            sd = _torch_state_dict(p)
            if m == "sound":
                bp, bs = convert_mobilenet_v2_state_dict(
                    sd, layout="torchvision",
                    input_channels=input_channels_for(m))
            else:
                bp, bs = convert_resnet_state_dict(
                    sd, depth=depth, input_channels=input_channels_for(m))
        else:
            raw = _restore_raw(p)
            bp, bs = raw["params"], raw.get("batch_stats", {})
        if fusion_point != "logits":
            # fc2 fusion has no per-backbone heads; the reference pops them
            # (joint_resnet_mobilenetv2.py:148-154)
            bp = dict(bp)
            bp.pop("fc", None)
            bp.pop("classifier", None)
        key = f"net_{m}"
        _graft(params["main_net"][key], bp, strict=True)
        _graft(stats["main_net"][key], bs, strict=True)
        print(f"Loaded unimodality pretrained model for {m} from: {p}",
              flush=True)
    return state.replace(params=params, batch_stats=stats)
