from cheetah_tpu.parallel.env import BatchedLatticeEnv
from cheetah_tpu.parallel.sharding import (
    beam_shardings,
    make_mesh,
    replicate,
    shard_beam,
    shard_segment,
)

__all__ = [
    "BatchedLatticeEnv",
    "beam_shardings",
    "make_mesh",
    "replicate",
    "shard_beam",
    "shard_segment",
]
