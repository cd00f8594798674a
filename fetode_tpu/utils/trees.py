"""Pytree helpers shared by the optimiser and checkpoint plumbing."""

from __future__ import annotations

import jax
from jax.tree_util import DictKey, tree_map_with_path


def trainable_mask(params):
    """Boolean mask pytree: False for every leaf under a ``_buffers`` key.

    Convention: non-trainable arrays (knot grids, constants) live under a
    ``_buffers`` dict key at any nesting level; optimisers mask them out.
    """
    def leaf_mask(path, _):
        return not any(isinstance(k, DictKey) and k.key == "_buffers" for k in path)

    return tree_map_with_path(leaf_mask, params)


def tree_size(tree) -> int:
    """Total number of array elements in a pytree."""
    return sum(x.size for x in jax.tree_util.tree_leaves(tree))
