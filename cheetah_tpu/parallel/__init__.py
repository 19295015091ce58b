from cheetah_tpu.parallel.comm_audit import (
    CollectiveReport,
    collective_report,
    parse_collectives,
)
from cheetah_tpu.parallel.distributed import (
    initialize,
    make_hybrid_mesh,
    make_process_local_array,
    process_local_beam,
)
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
    "CollectiveReport",
    "beam_shardings",
    "collective_report",
    "parse_collectives",
    "initialize",
    "make_hybrid_mesh",
    "make_mesh",
    "make_process_local_array",
    "process_local_beam",
    "replicate",
    "shard_beam",
    "shard_segment",
]
