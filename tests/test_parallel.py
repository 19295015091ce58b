"""Multi-device sharding on the virtual 8-device CPU mesh: instance-axis data
parallelism, particle-axis sharding (incl. space charge's grid all-reduce),
and the batched RL environment (BASELINE config 5)."""

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

import cheetah_tpu as ct
from cheetah_tpu.parallel import (
    BatchedLatticeEnv,
    make_mesh,
    shard_beam,
    shard_segment,
)


def make_segment():
    return ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64), k1=jnp.array(5.0, jnp.float64), name="q1"
            ),
            ct.Drift(jnp.array(0.5, jnp.float64), name="d2"),
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64), k1=jnp.array(-4.0, jnp.float64), name="q2"
            ),
            ct.Drift(jnp.array(1.0, jnp.float64), name="d3"),
        ],
        name="fodo",
    )


def test_mesh_construction():
    mesh = make_mesh()
    assert mesh.shape["instances"] == 8
    mesh2 = make_mesh({"instances": 4, "particles": 2})
    assert mesh2.shape == {"instances": 4, "particles": 2}


def test_instance_axis_sharded_tracking_matches_unsharded(key):
    """Sharding the instance axis over 8 devices changes nothing numerically."""
    num_instances = 16
    mesh = make_mesh()
    segment = make_segment()
    segment.q1.k1 = jnp.linspace(-10, 10, num_instances, dtype=jnp.float64)

    beam = ct.ParticleBeam.from_parameters(
        num_particles=512,
        sigma_x=jnp.full((num_instances,), 1e-4, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
        key=key,
    )

    expected = segment.track(beam).sigma_x

    sharded_beam = shard_beam(beam, mesh, instance_axis="instances")
    sharded_segment = shard_segment(segment, mesh, "instances")

    @jax.jit
    def track(segment, beam):
        return segment.track(beam).sigma_x

    result = track(sharded_segment, sharded_beam)
    np.testing.assert_allclose(result, expected, rtol=1e-12)
    # Output stays sharded over the instance axis.
    assert len(result.sharding.device_set) == 8


def test_particle_axis_sharded_tracking(key):
    mesh = make_mesh({"particles": 8})
    segment = make_segment()
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1024, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    expected = segment.track(beam).particles

    sharded = shard_beam(beam, mesh, particle_axis="particles")
    result = jax.jit(lambda seg, beam: seg.track(beam).particles)(segment, sharded)
    np.testing.assert_allclose(result, expected, rtol=1e-12)


def test_particle_axis_sharded_space_charge(key):
    """The CIC deposit over a sharded particle axis requires a cross-device
    grid reduction; XLA inserts it and the result matches single-device."""
    mesh = make_mesh({"particles": 8})
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(0.25, jnp.float64)),
            ct.SpaceChargeKick(jnp.array(0.5, jnp.float64), grid_shape=(8, 8, 8)),
            ct.Drift(jnp.array(0.25, jnp.float64)),
        ]
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1024,
        total_charge=jnp.array(1e-9, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    expected = segment.track(beam).particles

    sharded = shard_beam(beam, mesh, particle_axis="particles")
    result = jax.jit(lambda seg, beam: seg.track(beam).particles)(segment, sharded)
    np.testing.assert_allclose(result, expected, rtol=1e-9, atol=1e-16)


def test_batched_env_sharded_training(key):
    """BASELINE config 5 (scaled down): vectorised quad-tuning env, instances
    sharded over the mesh, gradient ascent in lockstep under jit."""
    num_instances = 32
    mesh = make_mesh()
    segment = make_segment()
    beam = ct.ParticleBeam.from_parameters(
        num_particles=256, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    env = BatchedLatticeEnv(
        segment, beam, tunables=[("q1", "k1"), ("q2", "k1")]
    )

    settings = jax.device_put(
        jnp.stack(
            [
                jnp.linspace(2.0, 8.0, num_instances, dtype=jnp.float64),
                jnp.linspace(-8.0, -2.0, num_instances, dtype=jnp.float64),
            ],
            axis=-1,
        ),
        NamedSharding(mesh, P("instances", None)),
    )

    step = jax.jit(env.grad_step, static_argnums=())
    initial_reward = None
    for _ in range(100):
        settings, reward = step(settings, 1e4)
        if initial_reward is None:
            initial_reward = reward
    assert settings.shape == (num_instances, 2)
    # Gradient ascent improves the batch on average (individual instances may
    # oscillate with a fixed learning rate on this nonconvex objective).
    assert float(jnp.mean(reward)) > float(jnp.mean(initial_reward))
    assert len(settings.sharding.device_set) == 8


def test_env_readings(key):
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64), k1=jnp.array(5.0, jnp.float64), name="q1"
            ),
            ct.BPM(is_active=True, name="bpm1"),
        ],
        name="diag",
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=128, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    env = BatchedLatticeEnv(segment, beam, tunables=[("q1", "k1")])
    settings = jnp.linspace(-5, 5, 4, dtype=jnp.float64)[:, None]
    outgoing, readings, reward = jax.jit(env.step)(settings)
    assert reward.shape == (4,)
    assert readings["bpm1"].shape == (4, 2)
