"""Per-chunk training entry point (train_single.py equivalent).

Usage mirrors /root/reference/train_single.py:208-239:
  python -m h3dgs_tpu.cli.train_single -s <chunk colmap> -m <out> \
      --scaffold_file <coarse iter dir> --bounds_file <chunk dir> \
      --skybox_locked --depths depths --alpha_masks masks
"""
from __future__ import annotations

import sys


def main(argv=None):
    from ..scene.scene import Scene
    from ..train.loop import train_flat
    from ..viewer.network_gui import maybe_viewer
    from ..parallel import multihost
    from .common import build_parser, dump_cfg_args, parse_full_config

    parser = build_parser("Per-chunk 3D Gaussian training (TPU)")
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default="")
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--disable_viewer", action="store_true")
    cfg, args = parse_full_config(parser, argv)
    multihost.initialize()   # no-op single-process; SLURM/env multi-host
    if multihost.is_primary():
        dump_cfg_args(cfg)
    saves = sorted(set(args.save_iterations + [cfg.opt.iterations]))

    scene = Scene(cfg.model, cfg.runtime)
    viewer = maybe_viewer(args)
    train_flat(cfg, scene, coarse=False, save_iterations=saves,
               checkpoint_iterations=args.checkpoint_iterations,
               start_checkpoint=args.start_checkpoint, viewer=viewer)
    print("Training complete.")


if __name__ == "__main__":
    main(sys.argv[1:])
