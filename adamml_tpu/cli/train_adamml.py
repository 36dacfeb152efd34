"""Multi-modal AdaMML training CLI (reference train_adamml.py).

Same flag surface as the reference; instead of mp.spawn + NCCL process
groups (reference train_adamml.py:54-63,83-84), multi-host runs call
jax.distributed.initialize (hostfile-derived coordinator, reference
train_adamml.py:40-50) and all devices join one jax.sharding Mesh.

Usage (mirrors reference README.md:86-95):
  python -m adamml_tpu.cli.train_adamml --dataset kinetics-sounds \
      --datadir /data/rgb /data/sound --modality rgb sound --groups 8 \
      --frames_per_group 4 --num_segments 5 --dense_sampling \
      --causality_modeling lstm --cost_weights 1.0 0.05 --sync-bn ...
"""

from __future__ import annotations

import platform
import sys

from ..configs.config import arg_parser, config_from_args, validate_args


def init_distributed(cfg) -> None:
    """hostfile -> coordinator + process id (reference
    train_adamml.py:40-50); no-op for single-host runs."""
    import jax

    r = cfg.runtime
    if r.hostfile:
        curr = platform.node().split(".")[0]
        with open(r.hostfile) as f:
            nodes = [x.strip() for x in f.readlines() if x.strip()]
        master = nodes[0].split(" ")[0]
        rank = next((i for i, n in enumerate(nodes) if curr in n), 0)
        jax.distributed.initialize(
            coordinator_address=f"{master}:10598",
            num_processes=len(nodes), process_id=rank)
    elif r.dist_url and r.world_size > 1:
        addr = r.dist_url.replace("tcp://", "")
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=r.world_size,
                                   process_id=r.rank)


def main(argv=None) -> int:
    parser = arg_parser()
    args = parser.parse_args(argv)
    validate_args(parser, args)
    cfg = config_from_args(args)
    cfg.model.backbone_net = "adamml"
    init_distributed(cfg)

    from ..train.curriculum import AdaMMLTrainer

    trainer = AdaMMLTrainer(cfg)
    if cfg.runtime.show_model:
        import jax

        print(trainer.model)
        n = sum(int(x.size) for x in
                jax.tree_util.tree_leaves(trainer.state.params))
        print(f"Total params: {n / 1e6:.2f}M")
        return 0
    if cfg.runtime.evaluate:
        from ..utils.logging import RankZeroLogger

        logger = RankZeroLogger(trainer.log_folder, rank=trainer.rank,
                                filename="evaluate_log.log", append=True)
        trainer.evaluate(logger)
        logger.close()
        return 0
    trainer.run()
    return 0


if __name__ == "__main__":
    sys.exit(main())
