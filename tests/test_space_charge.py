"""Space charge: exact parity with the torch reference and the analytic
cold-uniform-beam expansion (ref ``tests/test_space_charge_kick.py:20-80``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref, ref_particle_beam, to_numpy, torch

import cheetah_tpu as ct
from cheetah_tpu import constants


def test_space_charge_kick_parity(key):
    """Momentum kicks match the reference at float64 for the same particles."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=2_000,
        sigma_x=jnp.array(2e-4, jnp.float64),
        sigma_y=jnp.array(2e-4, jnp.float64),
        sigma_tau=jnp.array(1e-4, jnp.float64),
        sigma_p=jnp.array(1e-4, jnp.float64),
        total_charge=jnp.array(1e-9, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    kick = ct.SpaceChargeKick(jnp.array(0.5, jnp.float64), grid_shape=(16, 16, 16))
    ref_kick = ref.SpaceChargeKick(torch.tensor(0.5), grid_shape=(16, 16, 16))

    out = kick.track(beam)
    ref_out = ref_kick.track(ref_particle_beam(beam))

    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-7, atol=1e-14
    )


def test_space_charge_kick_vectorized_parity(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.full((3,), 2e-4, jnp.float64),
        sigma_y=jnp.array(2e-4, jnp.float64),
        sigma_tau=jnp.array(1e-4, jnp.float64),
        total_charge=jnp.array(1e-9, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    kick = ct.SpaceChargeKick(jnp.array(0.5, jnp.float64), grid_shape=(8, 8, 8))
    out = kick.track(beam)
    assert out.particles.shape == (3, 1_000, 7)
    assert np.all(np.isfinite(out.particles))


@pytest.mark.parametrize(
    "energy", [2.5e8, 1e6], ids=["ultra-relativistic", "non-relativistic"]
)
def test_cold_uniform_beam_expansion(energy, key):
    """A cold uniform beam doubles in size in all three dimensions over the
    analytically known section length (ImpactX expanding-beam benchmark)."""
    R0 = 0.001
    gamma = energy / constants.electron_mass_eV
    beta = float(np.sqrt(1 - 1 / gamma**2))

    incoming = ct.ParticleBeam.uniform_3d_ellipsoid(
        num_particles=100_000,
        total_charge=jnp.array(1e-8, jnp.float64),
        energy=jnp.array(energy, jnp.float64),
        radius_x=jnp.array(R0, jnp.float64),
        radius_y=jnp.array(R0, jnp.float64),
        radius_tau=jnp.array(R0 / gamma / beta, jnp.float64),
        sigma_px=jnp.array(1e-15, jnp.float64),
        sigma_py=jnp.array(1e-15, jnp.float64),
        sigma_p=jnp.array(1e-15, jnp.float64),
        key=key,
    )

    kappa = 1 + (np.sqrt(2) / 4) * np.log(3 + 2 * np.sqrt(2))
    Nb = float(jnp.abs(incoming.total_charge)) / constants.elementary_charge
    section_length = jnp.array(
        beta * gamma * kappa * np.sqrt(R0**3 / (Nb * constants.electron_radius)),
        jnp.float64,
    )

    segment = ct.Segment(
        [
            ct.Drift(section_length / 6),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 3),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 3),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 6),
        ]
    )
    outgoing = jax.jit(lambda seg, beam: seg.track(beam))(segment, incoming)

    np.testing.assert_allclose(
        outgoing.sigma_x, 2 * incoming.sigma_x, rtol=2e-2
    )
    np.testing.assert_allclose(
        outgoing.sigma_y, 2 * incoming.sigma_y, rtol=2e-2
    )
    np.testing.assert_allclose(
        outgoing.sigma_tau, 2 * incoming.sigma_tau, rtol=2e-2
    )


def test_vectorized_multi_charge_expansion(key):
    """The cold-beam doubling holds per-instance for a (3, 2) vectorised
    charge batch (ref ``tests/test_space_charge_kick.py:74-125``)."""
    R0 = 0.001
    energy = 2.5e8
    gamma = energy / constants.electron_mass_eV
    beta = float(np.sqrt(1 - 1 / gamma**2))

    incoming = ct.ParticleBeam.uniform_3d_ellipsoid(
        num_particles=50_000,
        total_charge=jnp.full((3, 2), 1e-8, jnp.float64),
        energy=jnp.array(energy, jnp.float64),
        radius_x=jnp.array(R0, jnp.float64),
        radius_y=jnp.array(R0, jnp.float64),
        radius_tau=jnp.array(R0 / gamma / beta, jnp.float64),
        sigma_px=jnp.array(1e-15, jnp.float64),
        sigma_py=jnp.array(1e-15, jnp.float64),
        sigma_p=jnp.array(1e-15, jnp.float64),
        key=key,
    )

    kappa = 1 + (np.sqrt(2) / 4) * np.log(3 + 2 * np.sqrt(2))
    Nb = 1e-8 / constants.elementary_charge
    section_length = jnp.array(
        beta * gamma * kappa * np.sqrt(R0**3 / (Nb * constants.electron_radius)),
        jnp.float64,
    )

    segment = ct.Segment(
        [
            ct.Drift(section_length / 6),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 3),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 3),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 6),
        ]
    )
    outgoing = jax.jit(lambda seg, beam: seg.track(beam))(segment, incoming)

    assert outgoing.sigma_x.shape == (3, 2)
    np.testing.assert_allclose(outgoing.sigma_x, 2 * incoming.sigma_x, rtol=2e-2)
    np.testing.assert_allclose(outgoing.sigma_y, 2 * incoming.sigma_y, rtol=2e-2)
    np.testing.assert_allclose(
        outgoing.sigma_tau, 2 * incoming.sigma_tau, rtol=2e-2
    )


def test_grid_extent_sensitivity(key):
    """The kick is insensitive to a reasonable change of the grid half-extent
    (3 -> 4 sigma): the solver must have converged in the domain size."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=5_000,
        sigma_x=jnp.array(2e-4, jnp.float64),
        sigma_y=jnp.array(2e-4, jnp.float64),
        sigma_tau=jnp.array(1e-4, jnp.float64),
        total_charge=jnp.array(1e-9, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )

    def kick_delta(extent: float) -> np.ndarray:
        kick = ct.SpaceChargeKick(
            jnp.array(0.5, jnp.float64),
            grid_shape=(32, 32, 32),
            grid_extent_x=jnp.array(extent, jnp.float64),
            grid_extent_y=jnp.array(extent, jnp.float64),
            grid_extent_tau=jnp.array(extent, jnp.float64),
        )
        out = kick.track(beam)
        return np.asarray(out.particles[..., 1] - beam.particles[..., 1])

    delta_3 = kick_delta(3.0)
    delta_4 = kick_delta(4.0)

    rms_3 = float(np.sqrt(np.mean(delta_3**2)))
    rms_4 = float(np.sqrt(np.mean(delta_4**2)))
    assert rms_3 > 0
    # Same physics on both domains, to within grid-resolution effects.
    assert abs(rms_4 - rms_3) / rms_3 < 0.1


def test_does_not_break_segment_length():
    """``Segment.length`` stays a scalar with SpaceChargeKick elements in the
    lattice (ref ``tests/test_space_charge_kick.py:330-351``)."""
    section_length = jnp.array(1.0, jnp.float64)
    segment = ct.Segment(
        [
            ct.Drift(section_length / 6),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 3),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 3),
            ct.SpaceChargeKick(section_length / 3),
            ct.Drift(section_length / 6),
        ]
    )
    assert jnp.asarray(segment.length).shape == ()
    assert float(segment.length) == pytest.approx(1.0)


def test_space_charge_with_aperture_cutoff(key):
    """The kick sees only surviving particles: activating an upstream
    aperture changes the result (ref ``tests/test_space_charge_kick.py:369-409``)."""
    def make_segment(is_active: bool) -> ct.Segment:
        return ct.Segment(
            [
                ct.Drift(length=jnp.array(0.2, jnp.float64)),
                ct.Aperture(
                    x_max=jnp.array(1e-4, jnp.float64),
                    y_max=jnp.array(1e-4, jnp.float64),
                    shape="rectangular",
                    is_active=is_active,
                    name="aperture",
                ),
                ct.Drift(length=jnp.array(0.25, jnp.float64)),
                ct.SpaceChargeKick(effect_length=jnp.array(0.5, jnp.float64)),
                ct.Drift(length=jnp.array(0.25, jnp.float64)),
            ]
        )

    incoming = ct.ParticleBeam.from_parameters(
        num_particles=10_000,
        total_charge=jnp.array(1e-9, jnp.float64),
        mu_x=jnp.array(5e-5, jnp.float64),
        sigma_px=jnp.array(1e-4, jnp.float64),
        sigma_py=jnp.array(1e-4, jnp.float64),
        key=key,
    )

    without_aperture = make_segment(False).track(incoming)
    with_aperture = make_segment(True).track(incoming)

    assert not np.allclose(
        np.asarray(with_aperture.particles),
        np.asarray(without_aperture.particles),
        rtol=1e-6,
        atol=0,
    )
    assert float(jnp.sum(with_aperture.survival_probabilities)) < 10_000


def test_incoming_beam_not_modified_by_space_charge(key):
    """Tracking must not mutate the incoming beam (ref
    ``tests/test_space_charge_kick.py:171-201``)."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.array(2e-4, jnp.float64),
        total_charge=jnp.array(1e-9, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    before = np.asarray(beam.particles).copy()

    kick = ct.SpaceChargeKick(jnp.array(0.5, jnp.float64), grid_shape=(8, 8, 8))
    _ = kick.track(beam)

    np.testing.assert_array_equal(np.asarray(beam.particles), before)


def test_space_charge_differentiable(key):
    """Gradients flow through deposit -> FFT solve -> gather."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=500,
        sigma_x=jnp.array(2e-4, jnp.float64),
        total_charge=jnp.array(1e-9, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(0.25, jnp.float64)),
            ct.SpaceChargeKick(jnp.array(0.5, jnp.float64), grid_shape=(8, 8, 8)),
            ct.Drift(jnp.array(0.25, jnp.float64)),
        ]
    )

    def loss(effect_length, segment, beam):
        segment.elements[1].effect_length = effect_length
        return segment.track(beam).sigma_px

    grad = jax.jit(jax.grad(loss))(jnp.array(0.5, jnp.float64), segment, beam)
    assert np.isfinite(grad) and abs(float(grad)) > 0


def test_pallas_deposit_matches_xla_path():
    """The Pallas VMEM two-hot deposit (used on the TPU backend) is
    numerically identical to the XLA tensor-product path (interpret mode)."""
    from cheetah_tpu.ops.cloud_in_cell import _deposit_tensor_product
    from cheetah_tpu.ops.pallas_cic import deposit_3d_pallas

    shape = (16, 16, 8)
    pos = jax.random.normal(jax.random.key(7), (2, 2500, 3), jnp.float32) * 2.0
    charges = jax.random.uniform(jax.random.key(8), (2, 2500), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (2, 3, 2)
    )

    expected = _deposit_tensor_product(pos, charges, list(shape), extent)
    actual = deposit_3d_pallas(pos, charges, shape, extent, interpret=True)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected, np.float32), atol=1e-5
    )
    # Deposited totals agree exactly with the XLA path (clouds of particles
    # in the outermost half-bin legitimately lose their out-of-grid corner
    # weight in both implementations).
    np.testing.assert_allclose(
        np.asarray(actual.sum(axis=(1, 2, 3))),
        np.asarray(expected.sum(axis=(1, 2, 3)), np.float32),
        rtol=1e-5,
    )


def test_space_charge_gradient_finite_in_float32(key):
    """Regression: SI-momentum squares underflow float32 (p^2 ~ 1e-39 for
    electrons), which made `to_xyz_pxpypz`/`from_xyz_pxpypz` *gradients* NaN
    on the f32 TPU path. The p0-normalised formulation keeps them finite."""
    dtype = jnp.float32
    beam = ct.ParticleBeam.from_parameters(
        num_particles=5_000,
        sigma_x=jnp.asarray(1.7e-4, dtype),
        sigma_y=jnp.asarray(1.7e-4, dtype),
        sigma_tau=jnp.asarray(1e-5, dtype),
        sigma_p=jnp.asarray(1e-3, dtype),
        total_charge=jnp.asarray(1e-9, dtype),
        energy=jnp.asarray(1.5e8, dtype),
        key=key,
        dtype=dtype,
    )
    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.1, dtype)),
            ct.SpaceChargeKick(jnp.asarray(0.2, dtype)),
            ct.Drift(jnp.asarray(0.1, dtype)),
        ]
    )

    def loss(effect_length, segment, beam):
        segment.elements[1].effect_length = effect_length
        return jnp.sum(jnp.square(segment.track(beam).px))

    grad_f32 = jax.jit(jax.grad(loss))(jnp.asarray(0.2, dtype), segment, beam)
    assert jnp.isfinite(grad_f32), grad_f32

    # Same computation in float64 agrees to f32 pipeline accuracy.
    beam64 = ct.ParticleBeam(
        particles=beam.particles.astype(jnp.float64),
        energy=beam.energy.astype(jnp.float64),
        particle_charges=beam.particle_charges.astype(jnp.float64),
        survival_probabilities=beam.survival_probabilities.astype(jnp.float64),
        species=beam.species,
    )
    segment64 = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.1, jnp.float64)),
            ct.SpaceChargeKick(jnp.asarray(0.2, jnp.float64)),
            ct.Drift(jnp.asarray(0.1, jnp.float64)),
        ]
    )
    grad_f64 = jax.jit(jax.grad(loss))(jnp.asarray(0.2, jnp.float64), segment64, beam64)
    np.testing.assert_allclose(float(grad_f32), float(grad_f64), rtol=0.1)


def test_pallas_gather_matches_xla_path():
    """The Pallas gather kernel equals `cloud_in_cell_gather_3d` (interpret
    mode), including out-of-grid positions contributing zero."""
    from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_gather_3d
    from cheetah_tpu.ops.pallas_cic import gather_3d_pallas

    grids = jax.random.normal(
        jax.random.key(3), (2, 3, 16, 16, 8), jnp.float32
    )
    normalized = jax.random.uniform(
        jax.random.key(4),
        (2, 3000, 3),
        jnp.float32,
        minval=-1.0,
        maxval=jnp.asarray([16.0, 16.0, 8.0], jnp.float32),
    )
    expected = cloud_in_cell_gather_3d(grids, normalized)
    actual = gather_3d_pallas(grids, normalized, interpret=True)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected, np.float32), atol=1e-5
    )


def test_pallas_deposit_vjp_matches_xla_path():
    """The deposit primitive's reverse pass (Pallas gather-grads kernel)
    produces the same cotangents as differentiating the XLA tensor-product
    deposit — positions, charges AND extent (interpret mode)."""
    from cheetah_tpu.ops.cloud_in_cell import _deposit_tensor_product
    from cheetah_tpu.ops.pallas_cic import differentiable_pallas_deposit

    shape = (8, 16, 8)
    pos = jax.random.normal(jax.random.key(11), (2, 700, 3), jnp.float32) * 2.0
    charges = jax.random.uniform(jax.random.key(12), (2, 700), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.1], [-2.9, 3.0], [-3.0, 3.0]], jnp.float32),
        (2, 3, 2),
    )
    # A non-uniform weighting so every grid cell has a distinct cotangent.
    weights = jax.random.normal(jax.random.key(13), shape, jnp.float32)

    def loss_pallas(p, c, e):
        grid = differentiable_pallas_deposit(shape, True)(p, c, e)
        return jnp.sum(grid * weights)

    def loss_xla(p, c, e):
        grid = _deposit_tensor_product(p, c, list(shape), e)
        return jnp.sum(grid * weights)

    grads_pallas = jax.grad(loss_pallas, argnums=(0, 1, 2))(pos, charges, extent)
    grads_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(pos, charges, extent)
    for got, want, label in zip(
        grads_pallas, grads_xla, ["positions", "charges", "extent"]
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5, err_msg=label
        )


def test_pallas_gather_vjp_matches_xla_path():
    """The gather primitive's reverse pass (deposit-of-cotangents +
    derivative-two-hot kernels) matches differentiating the XLA gather
    (interpret mode)."""
    from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_gather_3d
    from cheetah_tpu.ops.pallas_cic import differentiable_pallas_gather

    grids = jax.random.normal(jax.random.key(21), (2, 3, 8, 8, 8), jnp.float32)
    normalized = jax.random.uniform(
        jax.random.key(22),
        (2, 900, 3),
        jnp.float32,
        minval=-1.0,
        maxval=9.0,
    )
    weights = jax.random.normal(jax.random.key(23), (2, 3, 900), jnp.float32)

    def loss_pallas(g, n):
        return jnp.sum(differentiable_pallas_gather(True)(g, n) * weights)

    def loss_xla(g, n):
        return jnp.sum(cloud_in_cell_gather_3d(g, n) * weights)

    grads_pallas = jax.grad(loss_pallas, argnums=(0, 1))(grids, normalized)
    grads_xla = jax.grad(loss_xla, argnums=(0, 1))(grids, normalized)
    for got, want, label in zip(grads_pallas, grads_xla, ["grids", "normalized"]):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-5, err_msg=label
        )


def test_pallas_gather_grads_kernel_value_matches_gather():
    """The combined gather+grads kernel's value output equals the plain
    gather kernel, and its derivative outputs match finite differences."""
    from cheetah_tpu.ops.pallas_cic import (
        gather_3d_pallas,
        gather_grads_3d_pallas,
    )

    grids = jax.random.normal(jax.random.key(31), (1, 2, 8, 8, 8), jnp.float32)
    normalized = jax.random.uniform(
        jax.random.key(32), (1, 400, 3), jnp.float32, minval=0.3, maxval=6.7
    )
    val, dx, dy, dt = gather_grads_3d_pallas(grids, normalized, interpret=True)
    np.testing.assert_allclose(
        np.asarray(val),
        np.asarray(gather_3d_pallas(grids, normalized, interpret=True)),
        atol=1e-6,
    )
    # Central finite differences (h well away from bin boundaries).
    h = 1e-3
    for axis, grad in [(0, dx), (1, dy), (2, dt)]:
        delta = jnp.zeros((1, 1, 3), jnp.float32).at[..., axis].set(h)
        plus = gather_3d_pallas(grids, normalized + delta, interpret=True)
        minus = gather_3d_pallas(grids, normalized - delta, interpret=True)
        fd = (np.asarray(plus) - np.asarray(minus)) / (2 * h)
        np.testing.assert_allclose(
            np.asarray(grad), fd, rtol=5e-3, atol=5e-3, err_msg=f"axis {axis}"
        )


def test_pallas_deposit_jvp_matches_xla_path():
    """Forward-mode AD through the Pallas deposit primitive (a raised-order
    ``cic_deposit_multi`` tangent deposit) matches differentiating the XLA
    tensor-product deposit — tangents in positions, charges AND extent
    (interpret mode)."""
    from cheetah_tpu.ops.cloud_in_cell import _deposit_tensor_product
    from cheetah_tpu.ops.pallas_cic import differentiable_pallas_deposit

    shape = (8, 16, 8)
    pos = jax.random.normal(jax.random.key(41), (2, 600, 3), jnp.float32) * 2.0
    charges = jax.random.uniform(jax.random.key(42), (2, 600), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.1], [-2.9, 3.0], [-3.0, 3.0]], jnp.float32),
        (2, 3, 2),
    )
    pdot = jax.random.normal(jax.random.key(43), pos.shape, jnp.float32) * 0.1
    cdot = jax.random.normal(jax.random.key(44), charges.shape, jnp.float32)
    edot = jax.random.normal(jax.random.key(45), extent.shape, jnp.float32) * 0.1

    dep = differentiable_pallas_deposit(shape, True)
    xla = lambda p, c, e: _deposit_tensor_product(p, c, list(shape), e)  # noqa: E731
    val_p, tan_p = jax.jvp(dep, (pos, charges, extent), (pdot, cdot, edot))
    val_x, tan_x = jax.jvp(xla, (pos, charges, extent), (pdot, cdot, edot))
    np.testing.assert_allclose(
        np.asarray(val_p), np.asarray(val_x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tan_p), np.asarray(tan_x), rtol=2e-4, atol=2e-4
    )


def test_pallas_gather_jvp_matches_xla_path():
    """Forward-mode AD through the Pallas gather primitive (the combined
    value+derivative kernel) matches differentiating the XLA gather —
    tangents in grids AND positions (interpret mode)."""
    from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_gather_3d
    from cheetah_tpu.ops.pallas_cic import differentiable_pallas_gather

    grids = jax.random.normal(jax.random.key(51), (2, 3, 8, 8, 8), jnp.float32)
    normalized = jax.random.uniform(
        jax.random.key(52), (2, 800, 3), jnp.float32, minval=-1.0, maxval=9.0
    )
    gdot = jax.random.normal(jax.random.key(53), grids.shape, jnp.float32)
    ndot = jax.random.normal(jax.random.key(54), normalized.shape, jnp.float32)

    gather = differentiable_pallas_gather(True)
    val_p, tan_p = jax.jvp(gather, (grids, normalized), (gdot, ndot))
    val_x, tan_x = jax.jvp(
        cloud_in_cell_gather_3d, (grids, normalized), (gdot, ndot)
    )
    np.testing.assert_allclose(
        np.asarray(val_p), np.asarray(val_x), rtol=2e-4, atol=2e-5
    )
    np.testing.assert_allclose(
        np.asarray(tan_p), np.asarray(tan_x), rtol=2e-4, atol=2e-4
    )


def test_pallas_forward_reverse_consistency_composed():
    """<w, J v> == <J^T w, v> through a composed deposit -> gather pipeline,
    i.e. the primitives' jvp and transpose rules are mutually consistent
    (interpret mode)."""
    from cheetah_tpu.ops.pallas_cic import (
        differentiable_pallas_deposit,
        differentiable_pallas_gather,
    )

    shape = (8, 8, 8)
    pos = jax.random.normal(jax.random.key(61), (1, 400, 3), jnp.float32) * 1.5
    charges = jax.random.uniform(jax.random.key(62), (1, 400), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (1, 3, 2)
    )
    dep = differentiable_pallas_deposit(shape, True)
    gather = differentiable_pallas_gather(True)

    def pipeline(p):
        grid = dep(p, charges, extent)
        return gather(grid[:, None], (p + 3.0) * (8.0 / 6.0))

    v = jax.random.normal(jax.random.key(63), pos.shape, jnp.float32)
    out, jv = jax.jvp(pipeline, (pos,), (v,))
    _, vjp_fn = jax.vjp(pipeline, pos)
    w = jax.random.normal(jax.random.key(64), out.shape, jnp.float32)
    lhs = float(jnp.sum(w * jv))
    rhs = float(jnp.sum(vjp_fn(w)[0] * v))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-4)


def test_pallas_primitives_vmap_folds_into_batch_axis():
    """An outer ``jax.vmap`` over the deposit/gather primitives folds into
    the kernels' native leading batch axis — values and gradients match the
    manually stacked per-instance calls (interpret mode)."""
    from cheetah_tpu.ops.pallas_cic import (
        differentiable_pallas_deposit,
        differentiable_pallas_gather,
    )

    shape = (8, 8, 8)
    pos = jax.random.normal(jax.random.key(71), (2, 2, 300, 3), jnp.float32)
    charges = jax.random.uniform(jax.random.key(72), (2, 2, 300), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (2, 2, 3, 2)
    )
    dep = differentiable_pallas_deposit(shape, True)

    out_v = jax.vmap(dep)(pos, charges, extent)
    out_m = jnp.stack(
        [dep(pos[i], charges[i], extent[i]) for i in range(2)]
    )
    np.testing.assert_allclose(
        np.asarray(out_v), np.asarray(out_m), atol=1e-6
    )

    def loss_v(p):
        return jnp.sum(jnp.square(jax.vmap(dep)(p, charges, extent)))

    def loss_m(p):
        return jnp.sum(
            jnp.square(
                jnp.stack([dep(p[i], charges[i], extent[i]) for i in range(2)])
            )
        )

    gv = jax.grad(loss_v)(pos)
    gm = jax.grad(loss_m)(pos)
    np.testing.assert_allclose(
        np.asarray(gv), np.asarray(gm), rtol=1e-4, atol=1e-5
    )

    # Gather side: vmap with an unbatched grids argument broadcasts it.
    gather = differentiable_pallas_gather(True)
    grids = jax.random.normal(jax.random.key(73), (2, 1, 8, 8, 8), jnp.float32)
    norm = jax.random.uniform(
        jax.random.key(74), (3, 2, 200, 3), jnp.float32, minval=0.0, maxval=7.0
    )
    got = jax.vmap(gather, in_axes=(None, 0))(grids, norm)
    want = jnp.stack([gather(grids, norm[i]) for i in range(3)])
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-6)


def _pallas_and_xla_pipelines(shape=(6, 6, 6), n=40):
    """A deposit -> gather -> nonlinear-readout scalar loss, built on the
    Pallas primitives (interpret mode) and on the XLA formulation."""
    from cheetah_tpu.ops.cloud_in_cell import (
        _deposit_tensor_product,
        cloud_in_cell_gather_3d,
    )
    from cheetah_tpu.ops.pallas_cic import (
        differentiable_pallas_deposit,
        differentiable_pallas_gather,
    )

    pos = jax.random.normal(jax.random.key(81), (1, n, 3), jnp.float32) * 1.5
    charges = jax.random.uniform(jax.random.key(82), (1, n), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (1, 3, 2)
    )
    dep = differentiable_pallas_deposit(shape, True)
    gat = differentiable_pallas_gather(True)

    def loss_pallas(p):
        grid = dep(p, charges, extent)
        vals = gat(grid[:, None], p + 3.0)
        return jnp.sum(jnp.sin(vals * 3.0) * vals)

    def loss_xla(p):
        grid = _deposit_tensor_product(p, charges, list(shape), extent)
        vals = cloud_in_cell_gather_3d(grid[:, None], p + 3.0)
        return jnp.sum(jnp.sin(vals * 3.0) * vals)

    return loss_pallas, loss_xla, pos


def test_pallas_second_order_ad_matches_xla_path():
    """Hessian-vector products through the Pallas primitives — BOTH
    fwd-over-rev and rev-over-rev — match differentiating the XLA
    formulation twice: the multi-order primitives' jvp/transpose rules
    re-bind the same kernels at raised derivative orders, so second-order
    AD stays on-kernel (interpret mode)."""
    loss_pallas, loss_xla, pos = _pallas_and_xla_pipelines()
    v = jax.random.normal(jax.random.key(83), pos.shape, jnp.float32)

    hvp_xla = jax.jit(lambda p: jax.jvp(jax.grad(loss_xla), (p,), (v,))[1])(pos)
    fwd_rev = jax.jit(lambda p: jax.jvp(jax.grad(loss_pallas), (p,), (v,))[1])(pos)
    np.testing.assert_allclose(
        np.asarray(fwd_rev), np.asarray(hvp_xla), rtol=2e-3, atol=1e-4
    )

    rev_rev = jax.jit(
        lambda p: jax.grad(lambda q: jnp.vdot(jax.grad(loss_pallas)(q), v))(p)
    )(pos)
    np.testing.assert_allclose(
        np.asarray(rev_rev), np.asarray(hvp_xla), rtol=2e-3, atol=1e-4
    )


def test_pallas_third_order_ad_matches_xla_path():
    """grad-of-hvp (third derivative contraction) through the Pallas
    primitives matches the XLA formulation — the order-raising rules
    terminate at (1,1,1) with the correct a.e. zeros beyond (interpret
    mode)."""
    loss_pallas, loss_xla, pos = _pallas_and_xla_pipelines()
    v = jax.random.normal(jax.random.key(84), pos.shape, jnp.float32)

    def third(loss):
        return jax.jit(
            jax.grad(lambda p: jnp.vdot(jax.jvp(jax.grad(loss), (p,), (v,))[1], v))
        )(pos)

    g3_pallas = third(loss_pallas)
    g3_xla = third(loss_xla)
    np.testing.assert_allclose(
        np.asarray(g3_pallas), np.asarray(g3_xla), rtol=5e-3, atol=5e-3
    )


def test_pallas_deposit_rows_is_gather_grads_transpose():
    """The documented adjoint pairing of the tangent-deposit building block:
    <gather_grads(G, pos), rows> == <G, deposit_rows(pos, rows)> for every
    (G, rows) — i.e. ``deposit_rows_3d_pallas`` IS the transpose of
    ``gather_grads_3d_pallas`` (interpret mode)."""
    from cheetah_tpu.ops.pallas_cic import (
        deposit_rows_3d_pallas,
        gather_grads_3d_pallas,
    )

    shape = (8, 8, 8)
    grids = jax.random.normal(jax.random.key(91), (2, 1, *shape), jnp.float32)
    normalized = jax.random.uniform(
        jax.random.key(92), (2, 500, 3), jnp.float32, minval=-1.0, maxval=9.0
    )
    rows = jax.random.normal(jax.random.key(93), (2, 4, 500), jnp.float32)

    val, dx, dy, dt = gather_grads_3d_pallas(grids, normalized, interpret=True)
    lhs = float(
        jnp.sum(val[:, 0] * rows[:, 0])
        + jnp.sum(dx[:, 0] * rows[:, 1])
        + jnp.sum(dy[:, 0] * rows[:, 2])
        + jnp.sum(dt[:, 0] * rows[:, 3])
    )
    tangent_grid = deposit_rows_3d_pallas(normalized, rows, shape, interpret=True)
    rhs = float(jnp.sum(grids[:, 0] * tangent_grid))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_pallas_primitives_second_order_autodiff():
    """Any-order contract: hessian and jacfwd-of-grad through the composed
    deposit -> gather pipeline stay on the primitives and match the XLA
    two-hot path (interpret mode). Guards the split-bind jvp rule: the
    first-order fast path must not break raised-order differentiation."""
    from cheetah_tpu.ops.cloud_in_cell import (
        cloud_in_cell_charge_deposition,
        cloud_in_cell_gather_3d,
    )
    from cheetah_tpu.ops.pallas_cic import (
        differentiable_pallas_deposit,
        differentiable_pallas_gather,
    )

    shape = (8, 8, 8)
    num = 200
    pos = jax.random.normal(jax.random.key(71), (1, num, 3), jnp.float32) * 1.5
    charges = jax.random.uniform(jax.random.key(72), (1, num), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (1, 3, 2)
    )
    dep = differentiable_pallas_deposit(shape, True)
    gather = differentiable_pallas_gather(True)

    def loss_pallas(scale):
        p = pos * scale
        grid = dep(p, charges, extent)
        vals = gather(grid[:, None], (p + 3.0) * (8.0 / 6.0))
        return jnp.sum(jnp.square(vals))

    def loss_xla(scale):
        p = pos * scale
        grid = cloud_in_cell_charge_deposition(p, shape, extent, charges)
        vals = cloud_in_cell_gather_3d(grid[:, None], (p + 3.0) * (8.0 / 6.0))
        return jnp.sum(jnp.square(vals))

    s = jnp.asarray(1.1, jnp.float32)
    np.testing.assert_allclose(
        float(loss_pallas(s)), float(loss_xla(s)), rtol=1e-4
    )
    np.testing.assert_allclose(
        float(jax.grad(loss_pallas)(s)), float(jax.grad(loss_xla)(s)), rtol=1e-3
    )
    h_pallas = float(jax.hessian(loss_pallas)(s))
    h_xla = float(jax.hessian(loss_xla)(s))
    assert np.isfinite(h_pallas)
    np.testing.assert_allclose(h_pallas, h_xla, rtol=1e-2)
    # Forward-over-reverse as well (the mixed composition grad uses).
    fr_pallas = float(jax.jacfwd(jax.grad(loss_pallas))(s))
    np.testing.assert_allclose(fr_pallas, h_xla, rtol=1e-2)


def test_pallas_gate_covers_large_grids():
    """The Pallas availability bound admits grids up to the documented VMEM
    ceiling (64^3 — the region where the XLA fallbacks degrade to the
    serialised scatter, measured 22x slower on the v5e), and refuses grids
    whose lead tiles or accumulator would blow VMEM."""
    import cheetah_tpu.ops.pallas_cic as pc

    backend_is_tpu = jax.default_backend() == "tpu"
    for shape, fits in [
        ((32, 32, 32), True),
        ((64, 64, 64), True),
        ((64, 64, 32), True),
        ((64, 64, 128), False),  # 524288 cells: accumulator too large
        ((128, 128, 8), False),  # nx*ny = 16384: lead tiles too large
    ]:
        assert pc.pallas_deposit_available(shape) == (fits and backend_is_tpu), shape


def test_pallas_deposit_matches_xla_at_64cubed():
    """Interpret-mode parity of the kernel in the newly admitted gate region
    (nx*ny = 4096 with chunk clamped to its 128 floor)."""
    from cheetah_tpu.ops.cloud_in_cell import _deposit_scatter
    from cheetah_tpu.ops.pallas_cic import deposit_3d_pallas

    shape = (64, 64, 64)
    pos = jax.random.normal(jax.random.key(9), (1, 700, 3), jnp.float32) * 2.0
    charges = jax.random.uniform(jax.random.key(10), (1, 700), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (1, 3, 2)
    )

    expected = _deposit_scatter(pos, charges, list(shape), extent)
    actual = deposit_3d_pallas(pos, charges, shape, extent, interpret=True)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected, np.float32), atol=2e-5
    )


def test_pallas_kernels_work_under_enable_x64():
    """jax_enable_x64 must not break the (explicitly f32/int32) kernels:
    under x64 the BlockSpec index maps used to trace their literals as i64,
    which Mosaic refuses to legalize ("failed to legalize operation
    'func.return'" — verified against the real TPU backend, where the crash
    reproduced before the fix at every grid size). The kernels now trace
    with x64 scoped off. This CPU test pins the trace path (interpret mode
    does not reach Mosaic, so only the TPU backend exercises the
    legalization itself)."""
    from cheetah_tpu.ops.cloud_in_cell import _deposit_tensor_product
    from cheetah_tpu.ops.pallas_cic import deposit_3d_pallas

    assert jax.config.jax_enable_x64, "suite runs with x64 enabled"
    shape = (16, 16, 8)
    pos = jax.random.normal(jax.random.key(11), (1, 500, 3), jnp.float32) * 2.0
    charges = jax.random.uniform(jax.random.key(12), (1, 500), jnp.float32)
    extent = jnp.broadcast_to(
        jnp.asarray([[-3.0, 3.0]] * 3, jnp.float32), (1, 3, 2)
    )
    expected = _deposit_tensor_product(pos, charges, list(shape), extent)
    actual = deposit_3d_pallas(pos, charges, shape, extent, interpret=True)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected, np.float32), atol=1e-5
    )


def test_bf16_beam_space_charge_upcasts_instead_of_crashing():
    """Sub-f32 throughput beams must not crash in the FFT solve (XLA has no
    bf16 RFFT): the kick computes in f32 and casts back. Result dtype
    follows the beam; values match the f32 computation within the bf16
    representation class."""
    f32 = jnp.float32
    beam = ct.ParticleBeam.from_twiss(
        num_particles=5_000,
        beta_x=jnp.asarray(5.0, f32),
        emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(3.0, f32),
        emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.54e8, f32),
        total_charge=jnp.asarray(1e-10, f32),
        key=jax.random.PRNGKey(2),
        dtype=f32,
    )
    bf_beam = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == f32
        else x,
        beam,
    )
    kick_bf = ct.SpaceChargeKick(jnp.asarray(0.5, jnp.bfloat16), grid_shape=(8, 8, 8))
    out = jax.jit(lambda k, b: k.track(b))(kick_bf, bf_beam)
    assert out.particles.dtype == jnp.bfloat16
    assert bool(jnp.isfinite(out.particles.astype(f32)).all())

    kick_f32 = ct.SpaceChargeKick(jnp.asarray(0.5, f32), grid_shape=(8, 8, 8))
    ref = jax.jit(lambda k, b: k.track(b))(kick_f32, beam)
    # bf16 inputs perturb the traced grid extents, so agreement is at the
    # bf16 class, not exact.
    np.testing.assert_allclose(
        np.asarray(out.particles, np.float32),
        np.asarray(ref.particles),
        atol=2e-3,
        rtol=0.05,
    )
