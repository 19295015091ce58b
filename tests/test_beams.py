"""Beam construction and statistics: exact moment matching, Twiss round-trips,
parity with the torch reference."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref_particle_beam

import cheetah_tpu as ct
from cheetah_tpu import ParameterBeam, ParticleBeam, Species


def test_from_parameters_moments_are_exact(key):
    """Sampled beams match the requested moments exactly via Cholesky
    whiten-recolour (ref ``particle_beam.py:357-431``)."""
    beam = ParticleBeam.from_parameters(
        num_particles=10_000,
        mu_x=jnp.array(1e-5, jnp.float64),
        sigma_x=jnp.array(175e-6, jnp.float64),
        sigma_px=jnp.array(2e-7, jnp.float64),
        mu_px=jnp.array(1e-7, jnp.float64),
        sigma_y=jnp.array(175e-6, jnp.float64),
        sigma_p=jnp.array(1e-3, jnp.float64),
        cov_xpx=jnp.array(1e-11, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    np.testing.assert_allclose(beam.mu_x, 1e-5, rtol=1e-9)
    np.testing.assert_allclose(beam.sigma_x, 175e-6, rtol=1e-9)
    np.testing.assert_allclose(beam.mu_px, 1e-7, rtol=1e-9)
    np.testing.assert_allclose(beam.sigma_px, 2e-7, rtol=1e-9)
    np.testing.assert_allclose(beam.cov_xpx, 1e-11, rtol=1e-6)


def test_from_twiss_round_trip(key):
    beam = ParticleBeam.from_twiss(
        num_particles=50_000,
        beta_x=jnp.array(5.0, jnp.float64),
        alpha_x=jnp.array(-1.2, jnp.float64),
        emittance_x=jnp.array(2e-9, jnp.float64),
        beta_y=jnp.array(3.0, jnp.float64),
        alpha_y=jnp.array(0.7, jnp.float64),
        emittance_y=jnp.array(3e-9, jnp.float64),
        energy=jnp.array(6e9, jnp.float64),
        key=key,
    )
    np.testing.assert_allclose(beam.beta_x, 5.0, rtol=1e-6)
    np.testing.assert_allclose(beam.alpha_x, -1.2, rtol=1e-6)
    np.testing.assert_allclose(beam.emittance_x, 2e-9, rtol=1e-6)
    np.testing.assert_allclose(beam.beta_y, 3.0, rtol=1e-6)
    np.testing.assert_allclose(beam.alpha_y, 0.7, rtol=1e-6)
    np.testing.assert_allclose(beam.emittance_y, 3e-9, rtol=1e-6)


def test_parameter_beam_from_twiss():
    beam = ParameterBeam.from_twiss(
        beta_x=jnp.array(5.0, jnp.float64),
        alpha_x=jnp.array(-1.2, jnp.float64),
        emittance_x=jnp.array(2e-9, jnp.float64),
        beta_y=jnp.array(3.0, jnp.float64),
        alpha_y=jnp.array(0.7, jnp.float64),
        emittance_y=jnp.array(3e-9, jnp.float64),
        energy=jnp.array(6e9, jnp.float64),
    )
    np.testing.assert_allclose(beam.beta_x, 5.0, rtol=1e-9)
    np.testing.assert_allclose(beam.alpha_x, -1.2, rtol=1e-9)
    np.testing.assert_allclose(beam.emittance_x, 2e-9, rtol=1e-9)


def test_statistics_match_reference(key):
    """All survival-weighted statistics agree with the torch reference."""
    beam = ParticleBeam.from_parameters(
        num_particles=2_000, energy=jnp.array(1.2e8, jnp.float64), key=key
    )
    # Non-trivial survival probabilities exercise the weighting.
    beam.survival_probabilities = jax.random.uniform(
        jax.random.PRNGKey(99), (2_000,), dtype=jnp.float64
    )
    ref_beam = ref_particle_beam(beam)

    for attr in [
        "mu_x", "sigma_x", "mu_px", "sigma_px", "mu_y", "sigma_y",
        "mu_py", "sigma_py", "mu_tau", "sigma_tau", "mu_p", "sigma_p",
        "cov_xpx", "cov_ypy", "cov_taup", "cov_xp", "cov_pxp", "cov_yp",
        "cov_pyp", "cov_xy", "cov_xpy", "cov_xtau", "cov_pxy", "cov_pxpy",
        "cov_pxtau", "cov_ytau", "cov_pytau",
        "emittance_x", "emittance_y", "projected_emittance_x",
        "projected_emittance_y", "normalized_emittance_x",
        "normalized_emittance_y", "beta_x", "beta_y", "alpha_x", "alpha_y",
        "dispersion_x", "dispersion_px", "dispersion_y", "dispersion_py",
        "relativistic_gamma", "relativistic_beta", "p0c", "total_charge",
    ]:
        expected = getattr(ref_beam, attr).detach().numpy()
        actual = np.asarray(getattr(beam, attr))
        np.testing.assert_allclose(actual, expected, rtol=1e-9, err_msg=attr)


def test_parameter_particle_beam_consistency(key):
    """A ParticleBeam's collapsed moments match the equivalent ParameterBeam
    (analogue of ``tests/test_compare_beam_type.py``)."""
    twiss = dict(
        beta_x=jnp.array(4.0, jnp.float64),
        alpha_x=jnp.array(0.3, jnp.float64),
        emittance_x=jnp.array(1e-9, jnp.float64),
        beta_y=jnp.array(2.0, jnp.float64),
        alpha_y=jnp.array(-0.4, jnp.float64),
        emittance_y=jnp.array(2e-9, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
    )
    particle = ParticleBeam.from_twiss(num_particles=100_000, key=key, **twiss)
    parameter = ParameterBeam.from_twiss(**twiss)
    np.testing.assert_allclose(particle.sigma_x, parameter.sigma_x, rtol=1e-6)
    np.testing.assert_allclose(particle.sigma_px, parameter.sigma_px, rtol=1e-6)
    np.testing.assert_allclose(particle.beta_x, parameter.beta_x, rtol=1e-4)

    collapsed = particle.as_parameter_beam()
    np.testing.assert_allclose(collapsed.sigma_x, particle.sigma_x, rtol=1e-9)


def test_transformed_to(key):
    beam = ParticleBeam.from_parameters(
        num_particles=10_000, energy=jnp.array(1e8, jnp.float64), key=key
    )
    transformed = beam.transformed_to(
        mu_x=jnp.array(1e-4, jnp.float64), sigma_x=jnp.array(2e-4, jnp.float64)
    )
    np.testing.assert_allclose(transformed.mu_x, 1e-4, rtol=1e-9)
    np.testing.assert_allclose(transformed.sigma_x, 2e-4, rtol=1e-9)
    # Other dimensions unchanged
    np.testing.assert_allclose(transformed.sigma_y, beam.sigma_y, rtol=1e-9)


def test_uniform_3d_ellipsoid(key):
    radius_x, radius_y, radius_tau = 2e-3, 1e-3, 3e-3
    beam = ParticleBeam.uniform_3d_ellipsoid(
        num_particles=50_000,
        radius_x=jnp.array(radius_x, jnp.float64),
        radius_y=jnp.array(radius_y, jnp.float64),
        radius_tau=jnp.array(radius_tau, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    # All particles inside the ellipsoid
    inside = (
        (np.asarray(beam.x) / radius_x) ** 2
        + (np.asarray(beam.y) / radius_y) ** 2
        + (np.asarray(beam.tau) / radius_tau) ** 2
    )
    assert np.all(inside <= 1.0 + 1e-9)
    # Uniform ellipsoid: sigma = radius / sqrt(5)
    np.testing.assert_allclose(beam.sigma_x, radius_x / np.sqrt(5), rtol=2e-2)


def test_make_linspaced():
    beam = ParticleBeam.make_linspaced(
        num_particles=11,
        mu_x=jnp.array(1e-5, jnp.float64),
        sigma_x=jnp.array(1e-4, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
    )
    assert beam.num_particles == 11
    np.testing.assert_allclose(beam.x[0], 1e-5 - 1e-4, rtol=1e-12)
    np.testing.assert_allclose(beam.x[-1], 1e-5 + 1e-4, rtol=1e-12)
    np.testing.assert_allclose(beam.mu_x, 1e-5, atol=1e-12)


def test_xyz_pxpypz_round_trip(key):
    beam = ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    xp = beam.to_xyz_pxpypz()
    restored = ParticleBeam.from_xyz_pxpypz(
        xp, beam.energy, beam.particle_charges, beam.survival_probabilities,
        beam.s, beam.species,
    )
    # The gamma <-> momentum reconstruction chain loses ~1e-13 absolute on the
    # small relative-energy deviations; that is inherent, not a bug.
    np.testing.assert_allclose(
        restored.particles, beam.particles, rtol=1e-9, atol=1e-12
    )


def test_species():
    electron = Species("electron")
    assert electron.num_elementary_charges == -1
    assert float(electron.mass_eV) > 5e5
    custom = Species("ion", num_elementary_charges=2.0, mass_eV=3.0e9)
    np.testing.assert_allclose(custom.charge_coulomb, 2 * 1.602176634e-19)
    proton = Species("proton")
    np.testing.assert_allclose(float(proton.mass_kg), 1.6726e-27, rtol=1e-3)


def test_vectorized_beam_shapes(key):
    beam = ParticleBeam.from_parameters(
        num_particles=100,
        sigma_x=jnp.full((3, 2), 1e-4, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    assert beam.particles.shape == (3, 2, 100, 7)
    assert beam.sigma_x.shape == (3, 2)
    indexed = beam[0]
    assert indexed.particles.shape == (2, 100, 7)


def test_getitem_broadcasts(key):
    beam = ParticleBeam.from_parameters(
        num_particles=50, energy=jnp.full((4,), 1e8, jnp.float64), key=key
    )
    sliced = beam[2]
    assert sliced.particles.shape == (50, 7)


def test_species_error_cases():
    """Constructor validation (ref ``tests/test_species.py:51-93``)."""
    # Missing charge.
    with pytest.raises(AssertionError):
        Species("mystery", mass_eV=1e9)
    # Missing mass.
    with pytest.raises(AssertionError):
        Species("mystery", num_elementary_charges=1)
    # Missing both.
    with pytest.raises(AssertionError):
        Species("mystery")
    # Both charge representations.
    with pytest.raises(AssertionError):
        Species("mystery", num_elementary_charges=1, charge_coulomb=1.6e-19,
                mass_eV=1e9)
    # Both mass representations.
    with pytest.raises(AssertionError):
        Species("mystery", num_elementary_charges=1, mass_eV=1e9,
                mass_kg=1.8e-27)
    # Known species must not override charge/mass.
    with pytest.raises(AssertionError):
        Species("electron", num_elementary_charges=-1)


def test_species_antiparticle_masses():
    """Particle/antiparticle mass equality, opposite charges (ref
    ``tests/test_species.py:21-34``)."""
    for particle, antiparticle in [("electron", "positron"),
                                   ("proton", "antiproton")]:
        p, a = Species(particle), Species(antiparticle)
        np.testing.assert_array_equal(p.mass_eV, a.mass_eV)
        assert float(p.num_elementary_charges) == -float(
            a.num_elementary_charges
        )


def test_species_tracking_scales_with_rigidity(key):
    """A proton beam at the same energy bends less in a corrector than an
    electron beam does — species charge/mass genuinely enter the physics."""
    corrector = ct.HorizontalCorrector(
        length=jnp.asarray(0.1, jnp.float64),
        angle=jnp.asarray(1e-4, jnp.float64),
    )
    for name in ("electron", "proton", "deuteron"):
        beam = ParticleBeam.from_parameters(
            num_particles=100,
            energy=jnp.asarray(5e9, jnp.float64),
            species=Species(name),
            key=key,
        )
        outgoing = corrector.track(beam)
        assert outgoing.species.name == name
        assert bool(jnp.all(jnp.isfinite(outgoing.particles)))


def test_statistics_offset_beam_precision(key):
    """The one-pass (reduce-first) component moments stay accurate for beams
    with |mu| >> sigma — the worst case of the raw-moment identity the
    single HBM pass requires (see ParticleBeam._component_moments)."""
    sigma = 2e-5
    beam = ParticleBeam.from_parameters(
        num_particles=10_000,
        mu_x=jnp.array(2e-2, jnp.float64),  # mu/sigma = 1e3
        sigma_x=jnp.array(sigma, jnp.float64),
        energy=jnp.array(1.2e8, jnp.float64),
        key=key,
    )
    ref_beam = ref_particle_beam(beam)
    np.testing.assert_allclose(
        float(beam.sigma_x),
        ref_beam.sigma_x.detach().numpy(),
        rtol=1e-7,
    )
    np.testing.assert_allclose(
        float(beam.mu_x), ref_beam.mu_x.detach().numpy(), rtol=1e-12
    )


def test_component_moments_eager_memoization(key):
    """Reading many statistics eagerly costs one pass (identity-keyed cache),
    and any setter invalidates it."""
    beam = ParticleBeam.from_parameters(
        num_particles=500, energy=jnp.array(1e8, jnp.float64), key=key
    )
    first = beam._component_moments()
    assert beam._component_moments()[0] is first[0]  # cache hit

    mu_before = float(beam.mu_x)
    beam.x = beam.x + 1e-5  # setter replaces the particle array
    assert beam._component_moments()[0] is not first[0]  # invalidated
    np.testing.assert_allclose(float(beam.mu_x), mu_before + 1e-5, rtol=1e-9)

    # Tracers are never cached on the live object.
    def traced(b):
        b._component_moments()
        return b.sigma_x

    jax.jit(traced)(beam)
    cached = beam._moments_cache
    assert not any(
        isinstance(leaf, jax.core.Tracer)
        for leaf in jax.tree_util.tree_leaves(cached)
    )
