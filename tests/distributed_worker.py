"""Worker for the two-process multi-host test (``test_distributed.py``).

Each process owns 4 virtual CPU devices (one "host" of a 2-host cluster,
DCN = localhost TCP via gloo) and runs three checks against locally-computed
single-device ground truth:

1. Env step with the lattice-instance axis sharded over hosts × devices
   (pure DP over "DCN") — must match unsharded numerics.
2. Space-charge tracking with the *particle* axis sharded over hosts ×
   devices — the CIC grid all-reduce crosses the process boundary.
3. A jitted gradient step on host-sharded quadrupole settings.

5. The explicit-collective ``SpaceChargeKick(particle_axis=...)`` mode under
   ``shard_map`` (the multi-chip path that composes with the Pallas
   kernels), with the particle axis laid over BOTH mesh axes — its grid
   ``psum`` and the grid-sizing moment ``psum`` cross real process
   boundaries — differentiated, against single-device ground truth.

The 4-process x 2-device leg (``test_distributed.py``) runs the same checks
on the exact topology of a 4-host pod deployment.

Usage: ``python distributed_worker.py <process_id> <num_processes> <port>
[local_devices]``
"""

import os
import sys

PROCESS_ID = int(sys.argv[1])
NUM_PROCESSES = int(sys.argv[2])
PORT = sys.argv[3]
LOCAL_DEVICES = int(sys.argv[4]) if len(sys.argv) > 4 else 4

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    f"--xla_force_host_platform_device_count={LOCAL_DEVICES}"
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.sharding import NamedSharding, PartitionSpec as P  # noqa: E402

import cheetah_tpu as ct  # noqa: E402
from cheetah_tpu.parallel import (  # noqa: E402
    initialize,
    make_hybrid_mesh,
    make_process_local_array,
)

F64 = jnp.float64


def make_segment() -> ct.Segment:
    return ct.Segment(
        [
            ct.Drift(jnp.asarray(1.0, F64), name="d1"),
            ct.Quadrupole(jnp.asarray(0.3, F64), k1=jnp.asarray(5.0, F64), name="q1"),
            ct.Drift(jnp.asarray(0.5, F64), name="d2"),
            ct.Quadrupole(jnp.asarray(0.3, F64), k1=jnp.asarray(-4.0, F64), name="q2"),
            ct.Drift(jnp.asarray(1.0, F64), name="d3"),
            ct.BPM(is_active=True, name="bpm1"),
        ],
        name="fodo",
    )


def main() -> None:
    # Seed BEFORE jax.distributed.initialize: the per-host fold must still
    # apply (utils.rng folds process_index lazily at draw time, so
    # seed-then-init does not silently share default streams across hosts).
    ct.utils.rng.seed(42)
    initialize(f"localhost:{PORT}", NUM_PROCESSES, PROCESS_ID)
    assert jax.process_count() == NUM_PROCESSES
    assert jax.local_device_count() == LOCAL_DEVICES
    assert jax.device_count() == LOCAL_DEVICES * NUM_PROCESSES

    mesh = make_hybrid_mesh({"devices": LOCAL_DEVICES}, {"hosts": NUM_PROCESSES})
    assert mesh.shape == {"hosts": NUM_PROCESSES, "devices": LOCAL_DEVICES}
    # The ICI axis must stay within one process.
    for host_row in mesh.devices:
        assert len({d.process_index for d in host_row}) == 1

    num_devices = LOCAL_DEVICES * NUM_PROCESSES
    replicated = NamedSharding(mesh, P())
    key = jax.random.PRNGKey(7)

    # ------------------------------------------------------------------
    # 1. Instance axis sharded over hosts x devices: linear-DP env step.
    # ------------------------------------------------------------------
    num_instances = 4 * num_devices
    per_process = num_instances // NUM_PROCESSES
    block = slice(PROCESS_ID * per_process, (PROCESS_ID + 1) * per_process)

    k1_full = np.linspace(-10.0, 10.0, num_instances)
    segment = make_segment()
    beam = ct.ParticleBeam.from_parameters(
        num_particles=512,
        sigma_x=jnp.asarray(1e-4, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=key,
    )

    # Ground truth: the full batch, unsharded, on one local device.
    segment.q1.k1 = jnp.asarray(k1_full, F64)
    expected_sigma = np.asarray(segment.track(beam).sigma_x)

    # Distributed: each process contributes only its own instance block.
    segment.q1.k1 = make_process_local_array(
        k1_full[block], mesh, P(("hosts", "devices")), global_shape=(num_instances,)
    )

    env_step = jax.jit(
        lambda seg, b: seg.track_with_readings(b)[0].sigma_x,
        out_shardings=replicated,
    )
    sigma = env_step(segment, beam)
    np.testing.assert_allclose(np.asarray(sigma), expected_sigma, rtol=1e-12, atol=0.0)

    # ------------------------------------------------------------------
    # 2. Particle axis sharded over hosts x devices incl. space charge:
    #    the deposited-grid all-reduce crosses the DCN boundary.
    # ------------------------------------------------------------------
    num_particles = 2048
    local_particles = num_particles // NUM_PROCESSES
    sc_segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.25, F64)),
            ct.SpaceChargeKick(jnp.asarray(0.5, F64), grid_shape=(8, 8, 8)),
            ct.Drift(jnp.asarray(0.25, F64)),
        ]
    )
    sc_beam = ct.ParticleBeam.from_parameters(
        num_particles=num_particles,
        total_charge=jnp.asarray(1e-9, F64),
        energy=jnp.asarray(1e8, F64),
        key=jax.random.PRNGKey(11),
    )
    expected_particles = np.asarray(sc_segment.track(sc_beam).particles)

    pblock = slice(PROCESS_ID * local_particles, (PROCESS_ID + 1) * local_particles)
    pspec = P(("hosts", "devices"))
    sharded_beam = ct.ParticleBeam(
        particles=make_process_local_array(
            np.asarray(sc_beam.particles)[pblock],
            mesh,
            P(("hosts", "devices"), None),
            global_shape=(num_particles, 7),
        ),
        energy=sc_beam.energy,
        particle_charges=make_process_local_array(
            np.asarray(sc_beam.particle_charges)[pblock],
            mesh,
            pspec,
            global_shape=(num_particles,),
        ),
        survival_probabilities=make_process_local_array(
            np.asarray(sc_beam.survival_probabilities)[pblock],
            mesh,
            pspec,
            global_shape=(num_particles,),
        ),
        species=sc_beam.species,
    )

    track_replicated = jax.jit(
        lambda seg, b: seg.track(b).particles, out_shardings=replicated
    )
    particles_out = track_replicated(sc_segment, sharded_beam)
    np.testing.assert_allclose(
        np.asarray(particles_out), expected_particles, rtol=1e-9, atol=1e-16
    )

    # ------------------------------------------------------------------
    # 3. Gradient step on host-sharded settings (the RL/tuning loop shape).
    # ------------------------------------------------------------------
    def loss_fn(settings, segment, beam):
        segment.q1.k1 = settings[..., 0]
        segment.q2.k1 = settings[..., 1]
        outgoing = segment.track(beam)
        return jnp.mean(jnp.square(outgoing.sigma_x) + jnp.square(outgoing.sigma_y))

    settings_full = np.stack(
        [np.linspace(2.0, 8.0, num_instances), np.linspace(-8.0, -2.0, num_instances)],
        axis=-1,
    )
    # Ground truth on one device (jitted: bare grad would leak tracers into
    # the mutated segment pytree — see docs/design.md).
    expected_loss, expected_grads = jax.jit(jax.value_and_grad(loss_fn))(
        jnp.asarray(settings_full, F64), make_segment(), beam
    )
    expected_loss = float(expected_loss)
    expected_new = (settings_full - 0.01 * np.asarray(expected_grads))[block]

    settings = make_process_local_array(
        settings_full[block],
        mesh,
        P(("hosts", "devices"), None),
        global_shape=(num_instances, 2),
    )

    @jax.jit
    def grad_step(settings, segment, beam):
        loss, grads = jax.value_and_grad(loss_fn)(settings, segment, beam)
        return loss, settings - 0.01 * grads

    loss, new_settings = grad_step(settings, make_segment(), beam)
    loss = jax.jit(lambda x: x, out_shardings=replicated)(loss)
    np.testing.assert_allclose(float(np.asarray(loss)), expected_loss, rtol=1e-12)

    local_new = np.concatenate(
        [
            np.asarray(shard.data)
            for shard in sorted(
                new_settings.addressable_shards, key=lambda s: s.index[0].start
            )
        ]
    )
    np.testing.assert_allclose(local_new, expected_new, rtol=1e-12, atol=0.0)

    # ------------------------------------------------------------------
    # 4. Default-key draws are per-host distinct (utils.rng folds
    #    jax.process_index() into the seed), while explicitly shared keys
    #    still produce identical beams on every host.
    # ------------------------------------------------------------------
    from jax.experimental import multihost_utils

    def beam_fingerprint(key=None) -> jnp.ndarray:
        b = ct.ParticleBeam.from_parameters(
            num_particles=64,
            sigma_x=jnp.asarray(1e-4, F64),
            energy=jnp.asarray(1e8, F64),
            key=key,
        )
        # NOT sum(particles): exact moment matching pins that to
        # num_particles for EVERY key. |.| is key-sensitive.
        return jnp.sum(jnp.abs(b.particles))

    default_fps = np.asarray(
        multihost_utils.process_allgather(beam_fingerprint())
    )
    assert len(set(default_fps.tolist())) == NUM_PROCESSES, (
        f"default-key beams identical across hosts: {default_fps}"
    )
    shared_fps = np.asarray(
        multihost_utils.process_allgather(beam_fingerprint(jax.random.PRNGKey(3)))
    )
    assert len(set(shared_fps.tolist())) == 1, (
        f"shared-key beams differ across hosts: {shared_fps}"
    )

    # ------------------------------------------------------------------
    # 5. Explicit-collective SpaceChargeKick(particle_axis=...) under
    #    shard_map, particle axis over BOTH mesh axes, differentiated: the
    #    grid psum and the grid-sizing moment psums cross the process
    #    boundary (this is the multi-chip mode that composes with the
    #    Pallas kernels, which GSPMD cannot partition).
    # ------------------------------------------------------------------
    from functools import partial

    from jax import shard_map

    particle_axes = ("hosts", "devices")

    def sc_loss(effect_length, particles, charges, survival):
        @partial(
            shard_map,
            mesh=mesh,
            in_specs=(None, P(particle_axes, None), P(particle_axes), P(particle_axes)),
            out_specs=P(particle_axes, None),
        )
        def step(el, p, q, s):
            local = ct.ParticleBeam(
                particles=p,
                energy=sc_beam.energy,
                particle_charges=q,
                survival_probabilities=s,
                species=sc_beam.species,
            )
            kick = ct.SpaceChargeKick(
                el, grid_shape=(8, 8, 8), particle_axis=particle_axes
            )
            return kick.track(local).particles

        out = step(effect_length, particles, charges, survival)
        return jnp.mean(jnp.square(out[..., 1]) + jnp.square(out[..., 3]))

    def sc_loss_local(effect_length):
        kick = ct.SpaceChargeKick(effect_length, grid_shape=(8, 8, 8))
        out = kick.track(sc_beam).particles
        return jnp.mean(jnp.square(out[..., 1]) + jnp.square(out[..., 3]))

    el0 = jnp.asarray(0.5, F64)
    expected_loss5, expected_grad5 = jax.jit(jax.value_and_grad(sc_loss_local))(el0)
    loss5, grad5 = jax.jit(
        jax.value_and_grad(sc_loss), out_shardings=replicated
    )(
        el0,
        sharded_beam.particles,
        sharded_beam.particle_charges,
        sharded_beam.survival_probabilities,
    )
    np.testing.assert_allclose(
        float(np.asarray(loss5)), float(expected_loss5), rtol=1e-10
    )
    np.testing.assert_allclose(
        float(np.asarray(grad5)), float(expected_grad5), rtol=1e-8
    )

    print(f"[{PROCESS_ID}] DISTRIBUTED-OK", flush=True)


if __name__ == "__main__":
    main()
