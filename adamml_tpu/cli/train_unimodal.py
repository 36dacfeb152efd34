"""Unimodal pretraining CLI (reference train_unimodal.py).

Trains a single backbone (resnet for rgb/flow/rgbdiff,
sound_mobilenet_v2 for sound) whose checkpoint feeds
--unimodality_pretrained in the AdaMML stage. Mean/std overrides are
validated like the reference (train_unimodal.py:100-117).
"""

from __future__ import annotations

import sys

from ..configs.config import arg_parser, config_from_args, validate_args
from .train_adamml import init_distributed


def main(argv=None) -> int:
    parser = arg_parser()
    args = parser.parse_args(argv)
    validate_args(parser, args)
    cfg = config_from_args(args)
    if len(cfg.model.modality) != 1:
        raise ValueError("train_unimodal takes exactly one --modality")
    m = cfg.model.modality[0]
    if cfg.model.backbone_net == "adamml":
        cfg.model.backbone_net = ("sound_mobilenet_v2" if m == "sound"
                                  else "resnet")
    if cfg.data.mean is not None and len(cfg.data.mean) not in (1, 3):
        raise ValueError("mean must have 1 or 3 entries")
    if cfg.data.std is not None and len(cfg.data.std) not in (1, 3):
        raise ValueError("std must have 1 or 3 entries")
    init_distributed(cfg)

    from ..train.curriculum import UnimodalTrainer

    trainer = UnimodalTrainer(cfg)
    if cfg.runtime.show_model:
        from ..models.model_builder import count_params_flops_summary

        print(trainer.model)
        print(count_params_flops_summary(trainer.model, trainer.state,
                                         trainer.cfg))
        return 0
    trainer.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
