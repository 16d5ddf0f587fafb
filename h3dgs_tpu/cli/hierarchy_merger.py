"""Hierarchy merger CLI (GaussianHierarchyMerger equivalent).

Positional contract matches the native tool's invocation
(/root/reference/scripts/full_train.py:241-264):

  python -m h3dgs_tpu.cli.hierarchy_merger \
      <trained_chunks dir> 0 <chunks colmap dir> <output merged.hier> \
      <chunk name> [<chunk name> ...]

Each chunk contributes <trained_chunks>/<name>/hierarchy.hier_opt (falling
back to .hier if post-opt was skipped); bounds come from
<chunks dir>/<name>/center.txt + extent.txt.
"""
from __future__ import annotations

import os
import sys


def merge_chunks(trained_dir: str, chunks_dir: str, output: str,
                 names: list, backend: str = "auto") -> str:
    from ..hierarchy.io import read_hier, write_hier
    from ..hierarchy.merge import merge_hierarchies
    from ..io.meta import read_vec
    from ..native import load_native

    hs, centers, extents = [], [], []
    for name in names:
        base = os.path.join(trained_dir, name)
        path = os.path.join(base, "hierarchy.hier_opt")
        if not os.path.exists(path):
            path = os.path.join(base, "hierarchy.hier")
        hs.append(read_hier(path))
        cdir = os.path.join(chunks_dir, name)
        centers.append(read_vec(os.path.join(cdir, "center.txt")))
        extents.append(read_vec(os.path.join(cdir, "extent.txt")))
        print(f"chunk {name}: {hs[-1].n_nodes} nodes from {path}")

    lib = load_native()
    use_native = (backend == "native"
                  or (backend == "auto" and lib is not None
                      and hasattr(lib, "h3dgs_merge_hierarchies")))
    if use_native:
        from ..native import merge_hierarchies_native
        merged = merge_hierarchies_native(hs, centers, extents)
    else:
        merged = merge_hierarchies(hs, centers, extents)
    os.makedirs(os.path.dirname(output) or ".", exist_ok=True)
    write_hier(output, merged)
    print(f"merged hierarchy: {merged.n_nodes} nodes "
          f"({merged.n_leaves} leaves) -> {output}")
    return output


def main(argv=None):
    argv = list(argv if argv is not None else sys.argv[1:])
    backend = "auto"
    if "--backend" in argv:
        i = argv.index("--backend")
        backend = argv[i + 1]
        del argv[i:i + 2]
    if len(argv) < 5:
        print(__doc__)
        print("options: --backend auto|native|numpy")
        sys.exit(2)
    trained_dir, _zero, chunks_dir, output = argv[:4]
    merge_chunks(trained_dir, chunks_dir, output, argv[4:], backend=backend)


if __name__ == "__main__":
    main()
