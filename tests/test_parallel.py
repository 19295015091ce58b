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


def test_instance_axis_sharded_second_order_matches_unsharded(key):
    """The second-order bracket fusion (batched folded T-tensor) composes
    with instance-axis sharding: numerics identical, output stays sharded."""
    num_instances = 16
    mesh = make_mesh()
    segment = make_segment()
    segment.q1.tracking_method = "second_order"
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


def test_vmap_over_beam_batch(key):
    """`jax.vmap` composes with tracking (beams are pytrees): mapping over a
    stacked beam axis equals native broadcasting."""
    import cheetah_tpu as ct

    base = ct.ParticleBeam.from_parameters(
        num_particles=200, energy=jnp.asarray(1.5e8, jnp.float64), key=key
    )
    particles = jnp.stack(
        [base.particles, base.particles * 1.1, base.particles * 0.9]
    )
    stacked = ct.ParticleBeam(
        particles=particles,
        energy=base.energy,
        particle_charges=base.particle_charges,
        survival_probabilities=base.survival_probabilities,
        species=base.species,
    )
    quad = ct.Quadrupole(jnp.asarray(0.3, jnp.float64), k1=jnp.asarray(4.2, jnp.float64))

    broadcast_out = quad.track(stacked).particles

    def track_one(p):
        beam = ct.ParticleBeam(
            particles=p,
            energy=base.energy,
            particle_charges=base.particle_charges,
            survival_probabilities=base.survival_probabilities,
            species=base.species,
        )
        return quad.track(beam).particles

    vmap_out = jax.vmap(track_one)(particles)
    np.testing.assert_array_equal(np.asarray(broadcast_out), np.asarray(vmap_out))


def test_gradient_descent_focuses_beam(key):
    """End-to-end workflow check: a few Adam-free SGD steps on quadrupole
    strengths shrink the beam at the end of the EA subcell (the
    gradientbased.ipynb workflow, jitted)."""
    import cheetah_tpu as ct
    from cheetah_tpu.lattices import ares_ea_subcell

    segment = ares_ea_subcell(dtype=jnp.float64)
    beam = ct.ParticleBeam.from_parameters(
        num_particles=2000,
        sigma_x=jnp.asarray(2e-4, jnp.float64),
        sigma_y=jnp.asarray(2e-4, jnp.float64),
        energy=jnp.asarray(1.54e8, jnp.float64),
        key=key,
    )

    def loss_fn(k1s, segment, beam):
        segment.AREAMQZM1.k1 = k1s[0]
        segment.AREAMQZM2.k1 = k1s[1]
        segment.AREAMQZM3.k1 = k1s[2]
        out = segment.track(beam)
        return jnp.square(out.sigma_x) + jnp.square(out.sigma_y)

    grad_fn = jax.jit(jax.value_and_grad(loss_fn))
    k1s = jnp.asarray([10.0, -9.0, -8.0], jnp.float64)
    initial, _ = grad_fn(k1s, segment, beam)
    for _ in range(60):
        value, grads = grad_fn(k1s, segment, beam)
        # Normalised gradient step: robust to the tiny absolute loss scale.
        k1s = k1s - 0.3 * grads / jnp.linalg.norm(grads)
    final, _ = grad_fn(k1s, segment, beam)
    assert float(final) < 0.5 * float(initial), (float(initial), float(final))


def test_shard_map_space_charge_matches_unsharded():
    """The explicit-collective path (``particle_axis``): the kick inside
    ``shard_map`` with the particle dimension sharded over 8 devices equals
    the unsharded kick. This is the composition path for the Pallas kernels
    on real multi-chip meshes (GSPMD cannot partition pallas_call)."""
    from functools import partial

    from jax.sharding import Mesh, PartitionSpec as P
    from jax import shard_map

    import cheetah_tpu as ct

    key = jax.random.key(42)  # fixed: the tolerance below is rounding-tight
    num_particles = 4000  # divisible by 8
    beam = ct.ParticleBeam.from_parameters(
        num_particles=num_particles,
        sigma_x=jnp.asarray(1.7e-4, jnp.float64),
        sigma_y=jnp.asarray(1.7e-4, jnp.float64),
        sigma_tau=jnp.asarray(1e-5, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        total_charge=jnp.asarray(1e-9, jnp.float64),
        energy=jnp.asarray(1.5e8, jnp.float64),
        key=key,
    )

    plain_kick = ct.SpaceChargeKick(
        jnp.asarray(0.25, jnp.float64), grid_shape=(8, 8, 8)
    )
    expected = plain_kick.track(beam).particles

    mesh = Mesh(np.array(jax.devices()), ("particles",))
    sharded_kick = ct.SpaceChargeKick(
        jnp.asarray(0.25, jnp.float64),
        grid_shape=(8, 8, 8),
        particle_axis="particles",
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("particles", None), P("particles"), P("particles")),
        out_specs=P("particles", None),
    )
    def kicked_shard(particles, charges, survival):
        local = ct.ParticleBeam(
            particles=particles,
            energy=beam.energy,
            particle_charges=charges,
            survival_probabilities=survival,
            species=beam.species,
        )
        return sharded_kick.track(local).particles

    actual = kicked_shard(
        beam.particles, beam.particle_charges, beam.survival_probabilities
    )
    # The sharded grid-sizing moments use the psum-able moment-sum form of
    # the weighted std, which rounds differently from the centered unsharded
    # formula at the ~1e-12 relative level; the extent difference propagates
    # through the force fields at O(1) sensitivity.
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected), rtol=1e-9, atol=1e-14
    )


def test_sharded_track_moments_matches_unsharded(key):
    """The exact moments fast path composes with instance-axis sharding:
    settings sharded over the mesh produce the same sigmas as unsharded."""
    segment = make_segment()
    beam = ct.ParticleBeam.from_parameters(
        num_particles=512, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment.q1.k1 = jnp.linspace(-10.0, 10.0, 16, dtype=jnp.float64)
    expected = segment.track_moments(beam).sigma_x

    mesh = make_mesh()
    sharded_segment = shard_segment(segment, mesh, instance_axis="instances")
    sharded_beam = shard_beam(beam, mesh)
    result = jax.jit(lambda s, b: s.track_moments(b).sigma_x)(
        sharded_segment, sharded_beam
    )
    np.testing.assert_allclose(np.asarray(result), np.asarray(expected), rtol=1e-12)

    env = BatchedLatticeEnv(segment, beam, [("q1", "k1")], moments_only=True)
    settings = jax.device_put(
        jnp.linspace(-10.0, 10.0, 16, dtype=jnp.float64)[:, None],
        NamedSharding(mesh, P("instances", None)),
    )
    _, _, reward = jax.jit(env.step)(settings)
    assert reward.shape == (16,)
    assert bool(jnp.all(jnp.isfinite(reward)))


# ----------------------------------------------------------------------
# DCN collective-volume audit (round-3: makes the linear-scaling claim of
# parallel/distributed.py checkable — a layout regression that moves the
# particle array over the hosts axis fails here).
# ----------------------------------------------------------------------


def test_dcn_collective_volume_is_readout_sized():
    """Cross-host collective volume per headline training step (the RL env
    step + grad, instance axis over hosts x devices) is O(settings +
    readouts) — bytes — NOT O(particles). This is the checked form of the
    linear-scaling assertion in ``parallel/distributed.py``."""
    from cheetah_tpu.lattices import ares_ea_subcell
    from cheetah_tpu.parallel import collective_report, make_hybrid_mesh

    f64 = jnp.float64
    mesh = make_hybrid_mesh({"devices": 4}, {"hosts": 2})
    segment = ares_ea_subcell(dtype=f64)
    beam = ct.ParticleBeam.from_parameters(
        num_particles=4096,
        sigma_x=jnp.asarray(1.7e-4, f64),
        energy=jnp.asarray(1.5e8, f64),
        key=jax.random.PRNGKey(3),
    )
    settings = jax.device_put(
        jnp.linspace(-20.0, 20.0, 64, dtype=f64),
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

    particle_bytes = int(np.prod(beam.particles.shape)) * 8
    assert particle_bytes > 200_000  # the workload is genuinely particle-heavy
    assert len(report.ops) >= 1  # the loss mean crosses hosts
    assert report.dcn_bytes < 4096, (
        f"{report.dcn_bytes} bytes cross the DCN axis per step:\n"
        + "\n".join(op.line[:140] for op in report.ops if op.crosses["hosts"])
    )
    assert report.dcn_bytes < particle_bytes / 100


def test_dcn_space_charge_shard_map_dp_is_local():
    """Space charge with the instance axis DP'd via ``shard_map`` over hosts:
    every grid/FFT stays host-local, so DCN volume is one loss scalar. This
    is the recommended multi-host layout for space-charge workloads (see
    ``test_dcn_audit_flags_gspmd_fft_replication`` for why)."""
    from functools import partial

    from jax import shard_map

    from cheetah_tpu.parallel import collective_report, make_hybrid_mesh

    f64 = jnp.float64
    mesh = make_hybrid_mesh({"devices": 4}, {"hosts": 2})
    num_instances = 16

    segment = ct.Segment(
        [
            ct.Quadrupole(jnp.asarray(0.122, f64), k1=jnp.asarray(10.0, f64), name="q1"),
            ct.SpaceChargeKick(jnp.asarray(0.4, f64), grid_shape=(8, 8, 8)),
            ct.Drift(jnp.asarray(0.2, f64)),
        ],
        name="sc_dp",
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1024,
        sigma_x=jnp.asarray(1.7e-4, f64),
        total_charge=jnp.asarray(1e-10, f64),
        energy=jnp.asarray(1.5e8, f64),
        key=jax.random.PRNGKey(3),
    )
    settings = jax.device_put(
        jnp.linspace(5.0, 15.0, num_instances, dtype=f64),
        NamedSharding(mesh, P("hosts")),
    )

    @partial(
        shard_map,
        mesh=mesh,
        in_specs=(P("hosts"),),
        out_specs=P(),
        # FFT cotangents inside shard_map trip the varying-axes checker
        # (jax 0.9 limitation); the psum-reduced output is manifestly
        # replicated, so the check is safely disabled.
        check_vma=False,
    )
    def loss_shard(local_settings):
        seg = segment.clone()
        seg.q1.k1 = local_settings
        outgoing = seg.track(beam)
        local_sum = jnp.sum(jnp.square(outgoing.sigma_x))
        return jax.lax.psum(local_sum, "hosts") / num_instances

    step = jax.jit(lambda s: jax.value_and_grad(lambda v: loss_shard(v))(s))
    compiled = step.lower(settings).compile()
    report = collective_report(compiled, mesh, dcn_axes=("hosts",))

    grid_bytes = num_instances * (16**3) * 8
    assert report.dcn_bytes < 4096, (
        f"{report.dcn_bytes} bytes cross DCN (grids are {grid_bytes}):\n"
        + "\n".join(op.line[:140] for op in report.ops if op.crosses["hosts"])
    )
    # And the step actually runs.
    loss, grad = step(settings)
    assert bool(jnp.isfinite(loss)) and bool(jnp.all(jnp.isfinite(grad)))


def test_dcn_audit_flags_gspmd_fft_replication():
    """Known XLA hazard, kept as a detector regression: under plain GSPMD the
    SPMD partitioner cannot batch-partition FFTs — it *replicates* them, all-
    gathering instance-sharded space-charge grids across hosts (O(grid) DCN
    bytes per kick). The audit must flag it; the fix is the ``shard_map`` DP
    layout of the previous test."""
    from cheetah_tpu.parallel import collective_report, make_hybrid_mesh

    f64 = jnp.float64
    mesh = make_hybrid_mesh({"devices": 4}, {"hosts": 2})

    segment = ct.Segment(
        [
            ct.Quadrupole(jnp.asarray(0.122, f64), k1=jnp.asarray(10.0, f64), name="q1"),
            ct.SpaceChargeKick(jnp.asarray(0.4, f64), grid_shape=(8, 8, 8)),
        ],
        name="sc_gspmd",
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1024,
        sigma_x=jnp.asarray(1.7e-4, f64),
        total_charge=jnp.asarray(1e-10, f64),
        energy=jnp.asarray(1.5e8, f64),
        key=jax.random.PRNGKey(3),
    )
    settings = jax.device_put(
        jnp.linspace(5.0, 15.0, 16, dtype=f64), NamedSharding(mesh, P("hosts"))
    )

    @jax.jit
    def step(settings, segment, beam):
        segment.q1.k1 = settings
        return jnp.mean(jnp.square(segment.track(beam).sigma_x))

    compiled = step.lower(settings, segment, beam).compile()
    report = collective_report(compiled, mesh, dcn_axes=("hosts",))

    # O(grid) traffic crosses hosts — orders of magnitude above readout size.
    assert report.dcn_bytes > 100_000


def test_dcn_audit_detects_particle_allgather():
    """Negative control: a layout that replicates host-sharded particles MUST
    be flagged with O(particles) DCN bytes — proves the detector detects."""
    from cheetah_tpu.parallel import collective_report, make_hybrid_mesh

    f64 = jnp.float64
    mesh = make_hybrid_mesh({"devices": 4}, {"hosts": 2})
    num_particles = 16_384
    particles = jax.device_put(
        jax.random.normal(jax.random.PRNGKey(0), (num_particles, 7), f64) * 1e-4,
        NamedSharding(mesh, P(("hosts", "devices"), None)),
    )
    drift = ct.Drift(jnp.asarray(1.0, f64))

    @jax.jit
    def bad_step(particles):
        beam = ct.ParticleBeam(particles=particles, energy=jnp.asarray(1.5e8, f64))
        out = drift.track(beam).particles
        return jax.lax.with_sharding_constraint(out, NamedSharding(mesh, P()))

    compiled = bad_step.lower(particles).compile()
    report = collective_report(compiled, mesh, dcn_axes=("hosts",))

    assert report.dcn_bytes >= num_particles * 7 * 8


def test_comm_audit_parses_permute_pairs_and_async_tuples():
    """HLO-syntax corner cases of the audit parser: collective-permute's
    ``source_target_pairs`` (no replica_groups — must NOT fall back to the
    all-devices group) and async ``-start`` tuple results (operand aliases
    must not be double-counted)."""
    from cheetah_tpu.parallel import make_mesh
    from cheetah_tpu.parallel.comm_audit import parse_collectives

    mesh = make_mesh({"instances": 8})  # one axis, 8 devices

    # Intra-pair permute ring: pairs only span single devices per "group" of
    # two, so the crossing attribution must come from the pairs, not from a
    # bogus all-devices fallback.
    permute_line = (
        "  %cp = f32[1024]{0} collective-permute(%x), "
        "source_target_pairs={{0,1},{1,2},{2,3},{3,0}}"
    )
    (op,) = parse_collectives(permute_line, mesh)
    assert op.groups == [[0, 1], [1, 2], [2, 3], [3, 0]]
    assert op.output_bytes == 4096

    # Async all-reduce-start: tuple result (operand alias, result) — count
    # the transfer once, not twice.
    start_line = (
        "  %ars = (f32[4096]{0}, f32[4096]{0}) all-reduce-start(%y), "
        "replica_groups={{0,1,2,3,4,5,6,7}}"
    )
    (op,) = parse_collectives(start_line, mesh)
    assert op.output_bytes == 4096 * 4
    assert op.crosses["instances"]

    # Async all-gather-start: (small operand, big result) — count the result.
    ag_line = (
        "  %ags = (f32[512]{0}, f32[4096]{0}) all-gather-start(%z), "
        "replica_groups=[1,8]<=[8]"
    )
    (op,) = parse_collectives(ag_line, mesh)
    assert op.output_bytes == 4096 * 4


def test_comm_audit_uses_logical_ids_on_permuted_meshes():
    """HLO replica_groups hold LOGICAL partition ids (row-major mesh
    positions), not device.id — on a device-permuted mesh (as
    ``create_hybrid_device_mesh`` produces on real TPU slices) an intra-host
    psum must still attribute to the fast axis, not DCN."""
    from jax.sharding import Mesh
    from cheetah_tpu.parallel.comm_audit import collective_report

    devices = jax.devices()
    permuted = [devices[i] for i in (3, 1, 7, 5, 0, 6, 2, 4)]
    mesh = Mesh(np.array(permuted).reshape(2, 4), ("hosts", "devices"))

    x = jax.device_put(
        jnp.arange(8.0).reshape(2, 4), NamedSharding(mesh, P("hosts", "devices"))
    )
    step = jax.jit(
        jax.shard_map(
            lambda v: jax.lax.psum(v, "devices"),
            mesh=mesh,
            in_specs=P("hosts", "devices"),
            out_specs=P("hosts", None),
        )
    )
    report = collective_report(step.lower(x).compile(), mesh, dcn_axes=("hosts",))
    assert report.dcn_bytes == 0, (
        f"intra-host psum misattributed to DCN: {[op.line for op in report.ops]}"
    )
    assert report.bytes_crossing("devices") > 0


def test_sharded_checkpoint_round_trip(tmp_path, key):
    """orbax-backed checkpointing preserves values AND shardings across the
    8-device mesh — no host gather in either direction (the npz path's
    limitation; SURVEY §5.4 at production scale)."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    from cheetah_tpu.utils import checkpoint

    mesh = make_mesh({"particles": 8})
    beam = ct.ParticleBeam.from_twiss(
        num_particles=8_000,
        beta_x=jnp.array(8.0),
        emittance_x=jnp.array(2e-9),
        beta_y=jnp.array(8.0),
        emittance_y=jnp.array(2e-9),
        energy=jnp.array(1.5e8),
        key=key,
        dtype=jnp.float32,
    )
    beam.particles = jax.device_put(
        beam.particles, NamedSharding(mesh, P("particles", None))
    )
    beam.particle_charges = jax.device_put(
        beam.particle_charges, NamedSharding(mesh, P("particles"))
    )
    beam.survival_probabilities = jax.device_put(
        beam.survival_probabilities, NamedSharding(mesh, P("particles"))
    )

    path = tmp_path / "beam_ckpt"
    checkpoint.save_sharded(beam, path)
    restored = checkpoint.load_sharded(beam, path)

    assert isinstance(restored, ct.ParticleBeam)
    np.testing.assert_array_equal(
        np.asarray(restored.particles), np.asarray(beam.particles)
    )
    np.testing.assert_array_equal(
        np.asarray(restored.particle_charges), np.asarray(beam.particle_charges)
    )
    assert restored.particles.sharding == beam.particles.sharding
    assert restored.survival_probabilities.sharding == (
        beam.survival_probabilities.sharding
    )

    # Overwrite semantics: refused by default, allowed explicitly.
    import pytest as _pytest

    with _pytest.raises(Exception):
        checkpoint.save_sharded(beam, path)
    checkpoint.save_sharded(beam, path, overwrite=True)


def test_sharded_checkpoint_segment_with_optimizer_state(tmp_path):
    """Whole campaign state (segment + optimiser moments) round-trips
    through the sharded path; statics come from the template."""
    import pytest

    pytest.importorskip("orbax.checkpoint")
    optax = pytest.importorskip("optax")
    from cheetah_tpu.utils import checkpoint

    segment = make_segment()
    k1s = jnp.array([5.0, -4.0])
    opt_state = optax.adam(1e-2).init(k1s)
    state = {"segment": segment, "k1s": k1s, "opt_state": opt_state}

    path = tmp_path / "campaign_ckpt"
    checkpoint.save_sharded(state, path)
    restored = checkpoint.load_sharded(state, path)

    assert isinstance(restored["segment"], ct.Segment)
    assert restored["segment"].q1.name == "q1"
    np.testing.assert_array_equal(
        np.asarray(restored["segment"].q1.k1), np.asarray(segment.q1.k1)
    )
    np.testing.assert_array_equal(np.asarray(restored["k1s"]), np.asarray(k1s))
