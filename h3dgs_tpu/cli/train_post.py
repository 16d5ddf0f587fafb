"""Hierarchy fine-tuning entry point (train_post.py equivalent).

  python -m h3dgs_tpu.cli.train_post -s <chunk colmap> -m <out> \
      --hierarchy <out/hierarchy.hier> --scaffold_file <coarse iter dir> \
      --iterations 15000 --skybox_locked
"""
from __future__ import annotations

import sys


def main(argv=None):
    from ..scene.scene import Scene
    from ..train.loop import train_post
    from ..parallel import multihost
    from .common import build_parser, dump_cfg_args, parse_full_config

    parser = build_parser("Hierarchy post-optimization (TPU)")
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default="")
    cfg, args = parse_full_config(parser, argv)
    multihost.initialize()   # no-op single-process; SLURM/env multi-host
    if multihost.is_primary():
        dump_cfg_args(cfg)
    saves = sorted(set(args.save_iterations + [cfg.opt.iterations]))

    scene = Scene(cfg.model, cfg.runtime, create_from_hier=True)
    train_post(cfg, scene, save_iterations=saves,
               checkpoint_iterations=args.checkpoint_iterations,
               start_checkpoint=args.start_checkpoint)
    print("Training complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
