"""Wall-clock timer context (utils.py:297-306) + device-sync timing helper."""

from __future__ import annotations

import time


class Timer:
    def __init__(self, msg: str):
        self.msg = msg
        self.start_time = None

    def __enter__(self):
        self.start_time = time.time()
        return self

    def __exit__(self, exc_type, exc_value, exc_tb):
        print(self.msg % (time.time() - self.start_time))


def block_on(tree):
    """block_until_ready over a pytree — the jax analog of
    torch.cuda.synchronize() (train.py:75) for honest step timing."""
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "block_until_ready"):
            leaf.block_until_ready()
    return tree
