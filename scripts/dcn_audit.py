"""DCN collective-volume audit artifact (VERDICT round-3 item 2).

Compiles the headline sharded training step (RL env step + grad, instance
axis over a hosts(2) x devices(4) hybrid mesh) on a virtual 8-device CPU mesh
and prints ONE JSON line with the bytes crossing the DCN (``hosts``) axis per
step. ``scripts/bench_all.py`` runs this in a subprocess and merges the
result into ``bench_details.json`` (the TPU process cannot build an 8-device
mesh itself); ``tests/test_parallel.py`` enforces the same bound as a test.
"""

import json
import os
import pathlib
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import cheetah_tpu as ct
from cheetah_tpu.lattices import ares_ea_subcell
from cheetah_tpu.parallel import collective_report, make_hybrid_mesh


def main() -> None:
    f32 = jnp.float32
    mesh = make_hybrid_mesh({"devices": 4}, {"hosts": 2})
    segment = ares_ea_subcell(dtype=f32)
    beam = ct.ParticleBeam.from_parameters(
        num_particles=10_000,
        sigma_x=jnp.asarray(1.7e-4, f32),
        energy=jnp.asarray(1.5e8, f32),
        key=jax.random.PRNGKey(3),
        dtype=f32,
    )
    settings = jax.device_put(
        jnp.linspace(-20.0, 20.0, 4096, dtype=f32),
        NamedSharding(mesh, P(("hosts", "devices"))),
    )

    def loss_fn(settings, segment, beam):
        segment.AREAMQZM1.k1 = settings
        outgoing = segment.track(beam)
        return jnp.mean(jnp.square(outgoing.sigma_x) + jnp.square(outgoing.sigma_y))

    @jax.jit
    def train_step(settings, segment, beam):
        loss, grads = jax.value_and_grad(loss_fn)(settings, segment, beam)
        return loss, settings - 0.01 * grads

    compiled = train_step.lower(settings, segment, beam).compile()
    report = collective_report(compiled, mesh, dcn_axes=("hosts",))
    print(
        json.dumps(
            {
                "dcn_bytes_per_step": report.dcn_bytes,
                "collective_bytes_total": report.total_bytes,
                "num_collectives": len(report.ops),
                "workload": "env_step_grad_4096x10k_hosts2xdevices4",
            }
        )
    )


if __name__ == "__main__":
    main()
