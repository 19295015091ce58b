"""Multi-host (multi-process) execution: DCN-aware meshes and bring-up.

The reference has no distributed layer at all (SURVEY §2.9: no
``torch.distributed``/NCCL anywhere); this module is the TPU-native
first-class replacement for scaling past one host. The design follows the
standard JAX SPMD recipe:

1. Every host process calls :func:`initialize` once, before any JAX
   computation, to join the cluster (on TPU pods the arguments are inferred
   from the environment; on CPU/localhost they are passed explicitly and the
   cross-process collectives ride gloo).
2. :func:`make_hybrid_mesh` builds a device mesh whose *leading* axes span
   hosts (slow DCN links) and whose trailing axes span the chips within one
   host (fast ICI links). Shard the lattice-instance axis — pure data
   parallelism, communication only at readout reductions — over the DCN
   axes, and the particle axis — whose space-charge grid reduction is a real
   all-reduce — over the ICI axes, so the heavy collective stays on ICI.
3. :func:`process_local_beam` / :func:`make_process_local_array` assemble
   globally-sharded arrays from per-host local data without ever
   materialising the global array on one host.

Under this layout the env-step throughput scales linearly in hosts: each
host tracks its own instance shard and only the (tiny) readout/loss
reductions cross DCN. This is *checked*, not asserted: the compiled-HLO
collective audit (:mod:`cheetah_tpu.parallel.comm_audit`) measures the bytes
crossing the ``hosts`` axis per training step — 4 bytes (one scalar loss
all-reduce) for the headline env step (``tests/test_parallel.py``
``test_dcn_collective_volume_is_readout_sized``; ``dcn_bytes_per_step`` in
``bench_details.json``). Numerics are verified by the two-process localhost
test in ``tests/test_distributed.py``.

One known hazard: XLA's SPMD partitioner cannot batch-partition FFTs, so a
space-charge lattice whose *instance-batched grids* are sharded over hosts
under plain GSPMD gets its grids all-gathered across DCN every kick
(O(instances x grid) bytes). Use ``shard_map`` data parallelism over the
hosts axis for space-charge workloads instead — everything stays host-local
(``test_dcn_space_charge_shard_map_dp_is_local`` vs
``test_dcn_audit_flags_gspmd_fft_replication``).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    local_device_ids: int | Sequence[int] | None = None,
    cpu_collectives: str = "gloo",
) -> None:
    """Join (or bootstrap) a multi-process JAX cluster.

    Thin, idempotent wrapper around ``jax.distributed.initialize``. On TPU
    pods all arguments are inferred from the environment, so a bare
    ``initialize()`` suffices on every host. On the CPU backend (used for
    multi-process tests on one machine) the coordinator/process arguments are
    required and the cross-process collective implementation is selected
    first (gloo is compiled into jaxlib; mpi is available where an MPI
    runtime exists).

    :param coordinator_address: ``"host:port"`` of process 0's coordinator
        service. ``None`` infers it from the environment (TPU pods).
    :param num_processes: Total number of host processes in the cluster.
    :param process_id: This process's rank in ``[0, num_processes)``.
    :param local_device_ids: Restrict this process to a subset of its local
        devices (rarely needed; TPU pods infer it).
    :param cpu_collectives: Cross-process collective implementation for the
        CPU backend (``"gloo"`` or ``"mpi"``). Ignored on TPU.
    """
    if jax.distributed.is_initialized():
        return
    if cpu_collectives not in ("gloo", "mpi"):
        raise ValueError(
            f"Unknown cpu_collectives {cpu_collectives!r}; must be 'gloo' or "
            "'mpi'."
        )
    try:
        jax.config.update("jax_cpu_collectives_implementation", cpu_collectives)
    except RuntimeError:
        pass  # Backend already initialised with a collectives implementation.
    if (
        coordinator_address is None
        and num_processes is None
        and process_id is None
    ):
        # Bare call: join a cluster if the environment describes one (TPU
        # pods, SLURM, ...); on a plain single process there is nothing to
        # join and the bare call is a documented no-op. A failure is only
        # swallowed when the environment does not describe a MULTI-host
        # cluster — on a machine that is visibly one worker of several,
        # silently degrading to single-process mode would compute wrong
        # results, so the error propagates.
        import os

        def _multihost_env() -> bool:
            if any(
                os.environ.get(key)
                for key in (
                    "COORDINATOR_ADDRESS",
                    "JAX_COORDINATOR_ADDRESS",
                    "MEGASCALE_COORDINATOR_ADDRESS",
                )
            ):
                return True
            hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
            if "," in hostnames:
                return True
            for key in ("SLURM_JOB_NUM_NODES", "OMPI_COMM_WORLD_SIZE"):
                try:
                    if int(os.environ.get(key, "1")) > 1:
                        return True
                except ValueError:
                    pass
            return False

        try:
            jax.distributed.initialize(local_device_ids=local_device_ids)
        except (ValueError, RuntimeError):
            if _multihost_env():
                raise
            return
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )


def make_hybrid_mesh(
    ici_axes: dict[str, int] | None = None,
    dcn_axes: dict[str, int] | None = None,
    devices: Sequence[jax.Device] | None = None,
) -> Mesh:
    """Build a DCN×ICI device mesh for multi-host execution.

    The DCN axes (named first in the mesh) span host processes; the ICI axes
    span the devices within a host. Device order is arranged so that moving
    along an ICI axis stays inside one host — collectives over those axes
    never touch the data-center network. In a single-process run the same
    axis names are laid over the flat local device list, so code written
    against the hybrid mesh runs unchanged from one chip to a multi-host
    cluster.

    :param ici_axes: Mapping of axis name to size for the fast intra-host
        axes, e.g. ``{"devices": 4}``. Defaults to one ``"devices"`` axis
        over all local devices of each process.
    :param dcn_axes: Mapping of axis name to size for the slow cross-host
        axes, e.g. ``{"hosts": 2}``. Defaults to one ``"hosts"`` axis over
        all processes.
    :param devices: Devices to build the mesh from (defaults to all global
        devices).

    Example (2 hosts × 4 chips)::

        mesh = make_hybrid_mesh({"devices": 4}, {"hosts": 2})
        # instance axis over "hosts" (DP over DCN), particle axis over
        # "devices" (space-charge grid psum over ICI):
        beam = shard_beam(beam, mesh, particle_axis="devices")
    """
    devices = list(devices if devices is not None else jax.devices())
    num_processes = len({d.process_index for d in devices})
    local_per_process = len(devices) // max(num_processes, 1)

    if dcn_axes is None:
        dcn_axes = {"hosts": num_processes}
    if ici_axes is None:
        ici_axes = {"devices": local_per_process}

    names = tuple(dcn_axes.keys()) + tuple(ici_axes.keys())
    dcn_shape = tuple(dcn_axes.values())
    ici_shape = tuple(ici_axes.values())

    if num_processes == 1:
        # Single process: no DCN; lay the axis names over the flat device
        # list (leading = "hosts") so the sharding code is identical.
        shape = dcn_shape + ici_shape
        n = int(np.prod(shape))
        assert n <= len(devices), (
            f"Mesh of shape {shape} needs {n} devices; only "
            f"{len(devices)} available."
        )
        return Mesh(np.asarray(devices[:n]).reshape(shape), names)

    assert int(np.prod(dcn_shape)) == num_processes, (
        f"DCN axes {dcn_axes} must multiply to the number of processes "
        f"({num_processes})."
    )
    assert int(np.prod(ici_shape)) == local_per_process, (
        f"ICI axes {ici_axes} must multiply to the number of local devices "
        f"per process ({local_per_process})."
    )

    from jax.experimental import mesh_utils

    # Granule = host process: each DCN index selects one process's devices,
    # so the ICI axes never cross a host boundary. The helper multiplies the
    # two shapes per-dimension, so pad each side with 1s to keep the DCN axes
    # leading and the ICI axes trailing.
    device_array = mesh_utils.create_hybrid_device_mesh(
        mesh_shape=(1,) * len(dcn_shape) + ici_shape,
        dcn_mesh_shape=dcn_shape + (1,) * len(ici_shape),
        devices=devices,
        process_is_granule=True,
    )
    return Mesh(device_array, names)


def make_process_local_array(
    local_data: np.ndarray,
    mesh: Mesh,
    spec: P,
    global_shape: tuple[int, ...] | None = None,
) -> jax.Array:
    """Assemble a globally-sharded array from this process's local block.

    Wraps ``jax.make_array_from_process_local_data``: every process passes
    only the rows it owns and the result behaves as one global array under
    ``jit`` — the multi-host analogue of ``jax.device_put`` with a
    ``NamedSharding``. ``global_shape`` is inferred by scaling the sharded
    dimensions when omitted.
    """
    sharding = NamedSharding(mesh, spec)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_data), global_shape
    )


def process_local_beam(
    beam: Any,
    mesh: Mesh,
    instance_axis: str | None = None,
    particle_axis: str | None = None,
) -> Any:
    """Assemble a globally-sharded beam from per-process local beam data.

    The multi-host counterpart of :func:`cheetah_tpu.parallel.shard_beam`:
    each process constructs a beam holding only its *local* slice of the
    instance and/or particle axes (e.g. its own chunk of lattice settings or
    macroparticles) and this function stitches the slices into one global
    sharded beam. Fields not covered by the requested axes are replicated
    from each process's own value — as with all JAX multi-process inputs,
    every process MUST pass identical values for those fields (they are not
    broadcast from process 0, and divergence is not detected).
    """
    from cheetah_tpu.parallel.sharding import beam_shardings

    shardings = beam_shardings(
        beam, mesh, instance_axis=instance_axis, particle_axis=particle_axis
    )

    def assemble(leaf, sharding):
        local = np.asarray(leaf)
        if sharding.is_fully_replicated:
            return jax.make_array_from_process_local_data(
                sharding, local, local.shape
            )
        return jax.make_array_from_process_local_data(sharding, local)

    return jax.tree_util.tree_map(assemble, beam, shardings)
