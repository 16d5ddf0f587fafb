from .tree import Hierarchy, build_hierarchy, merge_gaussian_pairs  # noqa: F401
from .io import read_hier, write_hier, read_anchors, write_anchors  # noqa: F401
