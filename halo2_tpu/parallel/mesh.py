"""Device mesh construction.

The proving system's scaling dimensions are one-dimensional streams (MSM
points, NTT butterflies, extended-domain rows — SURVEY.md §2 parallelism
table), so the canonical mesh is a 1-D ``("shard",)`` axis over all chips in
the slice.  Replaces the reference's ``RAYON_NUM_THREADS`` config
(README "Controlling parallelism").
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh

SHARD_AXIS = "shard"


def shard_axis() -> str:
    return SHARD_AXIS


def default_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default).

    ``n_devices`` must be a power of two — every sharded kernel splits
    power-of-two problem sizes.
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
        # round down to a power of two
        while n_devices & (n_devices - 1):
            n_devices -= 1
    assert n_devices & (n_devices - 1) == 0, "device count must be a power of two"
    return Mesh(np.array(devices[:n_devices]), (SHARD_AXIS,))
