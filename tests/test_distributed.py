"""Two-process multi-host execution test (DCN = localhost TCP, gloo).

The reference has no distributed layer at all; the BASELINE north star asks
for linear env-step scaling at "1 chip / 1 host / 2+ hosts". Short of a TPU
pod, the strongest evidence this environment can produce is a real
multi-process ``jax.distributed`` cluster: two OS processes, each owning 4
virtual CPU devices, joined through a coordinator and exchanging collectives
over the gloo backend — exactly the code path a 2-host pod would take, with
DCN replaced by localhost TCP.

The worker (``tests/distributed_worker.py``) checks, in-process, that

1. an env step with the instance axis sharded hosts×devices matches the
   unsharded numerics bit-for-bit,
2. space-charge tracking with the *particle* axis sharded across processes
   (grid all-reduce crossing the process boundary) matches single-device
   ground truth, and
3. a jitted gradient step on host-sharded quadrupole settings matches.

This test only launches the processes and asserts both exit 0 after
printing their DISTRIBUTED-OK line.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import pytest

NUM_PROCESSES = 2
TIMEOUT_S = 600.0


def _free_port() -> int:
    with socket.socket(socket.AF_INET, socket.SOCK_STREAM) as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cluster(num_processes: int, local_devices: int) -> None:
    worker = Path(__file__).parent / "distributed_worker.py"
    port = _free_port()

    env = os.environ.copy()
    # The worker sets its own JAX_PLATFORMS / XLA_FLAGS before importing jax;
    # scrub any conflicting inherited values (e.g. from this suite's
    # conftest) so each process really gets fresh CPU devices.
    env.pop("XLA_FLAGS", None)
    env.pop("JAX_PLATFORMS", None)
    repo_root = Path(__file__).parent.parent
    env["PYTHONPATH"] = os.pathsep.join(
        p for p in (str(repo_root), env.get("PYTHONPATH")) if p
    )

    procs = [
        subprocess.Popen(
            [
                sys.executable,
                str(worker),
                str(rank),
                str(num_processes),
                str(port),
                str(local_devices),
            ],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
            cwd=str(Path(__file__).parent.parent),
        )
        for rank in range(num_processes)
    ]
    outputs = []
    try:
        for proc in procs:
            out, _ = proc.communicate(timeout=TIMEOUT_S)
            outputs.append(out)
    except subprocess.TimeoutExpired:
        for proc in procs:
            proc.kill()
        pytest.fail(
            "Distributed workers timed out.\n"
            + "\n".join(f"--- rank {i} ---\n{o}" for i, o in enumerate(outputs))
        )

    for rank, (proc, out) in enumerate(zip(procs, outputs)):
        assert proc.returncode == 0, f"rank {rank} failed:\n{out}"
        assert f"[{rank}] DISTRIBUTED-OK" in out, f"rank {rank} output:\n{out}"


@pytest.mark.slow
def test_two_process_cluster_runs_sharded_env_step():
    _run_cluster(NUM_PROCESSES, 4)


@pytest.mark.slow
def test_four_process_cluster_explicit_collective_space_charge():
    """4 processes x 2 devices: the hybrid DCN x ICI mesh exercised across
    REAL process boundaries, including the explicit-collective
    ``SpaceChargeKick(particle_axis=...)`` shard_map mode with gradients
    (worker check 5) — the exact pod topology of a 4-host deployment."""
    if (os.cpu_count() or 0) < 8:
        pytest.skip("needs >= 8 CPU slots for 4 processes x 2 devices")
    _run_cluster(4, 2)


def test_bare_initialize_is_noop_single_process(monkeypatch):
    """A bare initialize() on a plain single process must not raise (the JAX
    backend is already up in the test process, so jax.distributed refuses) —
    and must re-raise when the environment describes a multi-host cluster."""
    import cheetah_tpu.parallel as ctp

    for key in (
        "COORDINATOR_ADDRESS",
        "JAX_COORDINATOR_ADDRESS",
        "MEGASCALE_COORDINATOR_ADDRESS",
    ):
        monkeypatch.delenv(key, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")  # single host
    ctp.initialize()  # no-op, must not raise

    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "host-a,host-b")
    with pytest.raises((ValueError, RuntimeError)):
        ctp.initialize()
