"""Coarse scaffold training entry point (train_coarse.py equivalent).

Usage mirrors /root/reference/train_coarse.py + the orchestrator's flags
(/root/reference/scripts/full_train.py:98-105):
  python -m h3dgs_tpu.cli.train_coarse -s <aligned colmap> -m <out> \
      --skybox_num 100000 --position_lr_init 0.00016 ...
"""
from __future__ import annotations

import sys


def main(argv=None):
    from ..scene.scene import Scene
    from ..train.loop import train_flat
    from ..viewer.network_gui import maybe_viewer
    from ..parallel import multihost
    from .common import build_parser, dump_cfg_args, parse_full_config

    parser = build_parser("Coarse scaffold training (TPU)")
    parser.add_argument("--save_iterations", nargs="+", type=int, default=[])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--disable_viewer", action="store_true")
    cfg, args = parse_full_config(parser, argv)
    cfg.model.sh_degree = 1  # scaffold is degree-1 (train_coarse.py:31)
    multihost.initialize()   # no-op single-process; SLURM/env multi-host
    if multihost.is_primary():
        dump_cfg_args(cfg)
    saves = sorted(set(args.save_iterations + [cfg.opt.iterations]))

    scene = Scene(cfg.model, cfg.runtime)
    viewer = maybe_viewer(args)
    train_flat(cfg, scene, coarse=True, save_iterations=saves,
               checkpoint_iterations=args.checkpoint_iterations,
               start_checkpoint=args.start_checkpoint, viewer=viewer)
    print("Training complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
