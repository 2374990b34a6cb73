"""Device prefetch: overlap host->HBM transfers with device compute.

SURVEY.md §7 step 5 — the reference's loop blocks on `.to(device)` per batch
(experiments/experiment.py:736-737).  Here the next batch is placed on device
(optionally sharded over a mesh) while the current step runs; jax dispatch is
asynchronous, so keeping `size` batches in flight hides the transfer.
"""

from __future__ import annotations

import collections
from typing import Iterable, Iterator, Optional

import jax


def device_prefetch(iterator: Iterable, size: int = 2,
                    sharding: Optional[object] = None) -> Iterator:
    """Yield items from ``iterator`` with ``size`` batches resident on device.

    Array leaves are device_put (with ``sharding`` if given); non-array leaves
    (e.g. filename tuples) pass through untouched.
    """
    queue = collections.deque()

    def put(item):
        return jax.tree.map(
            lambda x: jax.device_put(x, sharding)
            if hasattr(x, "shape") and hasattr(x, "dtype") else x,
            item, is_leaf=lambda x: not isinstance(x, (tuple, list, dict)))

    it = iter(iterator)
    try:
        for _ in range(size):
            queue.append(put(next(it)))
    except StopIteration:
        pass
    while queue:
        yield queue.popleft()
        try:
            queue.append(put(next(it)))
        except StopIteration:
            pass
