"""Multi-chip parallelism: device meshes, sharded MSM/NTT, collectives.

The reference scales only via a rayon thread pool (multicore.rs:1-5, SURVEY.md
§2.1/§5.8); this package is its TPU-native replacement — a first-class
distributed backend built on ``jax.sharding.Mesh`` + ``shard_map`` with XLA
collectives riding ICI: MSM points sharded per chip with partial-sum
all-gather, NTT butterfly stages exchanged via all_to_all, extended-domain
rows sharded for the quotient evaluation.
"""

from .mesh import default_mesh, shard_axis
from .msm import sharded_msm
from .ntt import sharded_intt, sharded_ntt

__all__ = [
    "default_mesh",
    "shard_axis",
    "sharded_msm",
    "sharded_ntt",
    "sharded_intt",
]
