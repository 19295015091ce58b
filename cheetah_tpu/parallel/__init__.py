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

# This subpackage defines pytree dataclasses of its own (BatchedLatticeEnv);
# register them for jax.export like the top-level package does.
from cheetah_tpu.utils.pytree import register_export_serialization as _reg

try:
    from jax import export as _jax_export
except ImportError:  # pragma: no cover - older jax without jax.export
    _jax_export = None

if _jax_export is not None and hasattr(
    _jax_export, "register_pytree_node_serialization"
):
    _reg()

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
