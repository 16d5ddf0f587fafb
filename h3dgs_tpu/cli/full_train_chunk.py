"""Single-chunk pipeline job (train_chunk.slurm equivalent): runs
train_single -> hierarchy creator -> train_post for one chunk. Invoked by
full_train's SLURM backend via sbatch --wrap.

  python -m h3dgs_tpu.cli.full_train_chunk <chunk_name> <chunks_dir>
      <output_dir> <images> <depths> <masks> <iterations>
"""
from __future__ import annotations

import sys

from .full_train import process_chunk


def main(argv=None):
    a = argv if argv is not None else sys.argv[1:]
    name, chunks_dir, output_dir, images, depths, masks, iters = a[:7]
    ok = process_chunk(name, chunks_dir, output_dir, images, depths,
                       masks.strip("'\""), "", int(iters),
                       keep_running=False, skip_if_exists=False)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
