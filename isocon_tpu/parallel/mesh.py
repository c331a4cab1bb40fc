"""Device mesh construction.

The framework's parallelism is data-parallel over the pairwise work matrix
(SURVEY.md section 2: the reference's only parallelism is chunked work
lists over multiprocessing.Pool; here chunks become shards of the pair
axis across a 1-D mesh, with collectives merging per-query reductions).
"""
from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import Mesh


def make_mesh(n_devices: Optional[int] = None, axis: str = "pairs") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    import numpy as np

    return Mesh(np.array(devs), (axis,))
