"""Systematic vectorisation sweep (analogue of ``tests/test_vectorized.py``):
every element type tracks with batched parameters of shapes ``(2,)`` and
``(3, 2)``, and every batch entry must equal the corresponding scalar run."""

import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

# Element constructor + the parameter to vectorise (name, base value).
VECTOR_CASES = {
    "Drift": (lambda **kw: ct.Drift(**kw), "length", 1.0, {}),
    "Drift_dkd": (
        lambda **kw: ct.Drift(tracking_method="drift_kick_drift", **kw),
        "length",
        1.0,
        {},
    ),
    "Quadrupole": (
        lambda **kw: ct.Quadrupole(length=jnp.asarray(0.3, jnp.float64), **kw),
        "k1",
        4.2,
        {},
    ),
    "Quadrupole_dkd": (
        lambda **kw: ct.Quadrupole(
            length=jnp.asarray(0.3, jnp.float64),
            tracking_method="drift_kick_drift",
            num_steps=2,
            **kw,
        ),
        "k1",
        4.2,
        {},
    ),
    "Quadrupole_second_order": (
        lambda **kw: ct.Quadrupole(
            length=jnp.asarray(0.3, jnp.float64),
            tracking_method="second_order",
            **kw,
        ),
        "k1",
        4.2,
        {},
    ),
    "Dipole": (
        lambda **kw: ct.Dipole(length=jnp.asarray(0.5, jnp.float64), **kw),
        "angle",
        0.1,
        {},
    ),
    "Dipole_dkd": (
        lambda **kw: ct.Dipole(
            length=jnp.asarray(0.5, jnp.float64),
            tracking_method="drift_kick_drift",
            **kw,
        ),
        "angle",
        0.1,
        {},
    ),
    "Sextupole": (
        lambda **kw: ct.Sextupole(length=jnp.asarray(0.25, jnp.float64), **kw),
        "k2",
        40.0,
        {},
    ),
    "Solenoid": (
        lambda **kw: ct.Solenoid(length=jnp.asarray(0.4, jnp.float64), **kw),
        "k",
        2.5,
        {},
    ),
    "Undulator": (
        lambda **kw: ct.Undulator(
            length=jnp.asarray(2.0, jnp.float64),
            period=jnp.asarray(0.05, jnp.float64),
            **kw,
        ),
        "kx",
        1.2,
        {},
    ),
    "Cavity": (
        lambda **kw: ct.Cavity(
            length=jnp.asarray(1.0, jnp.float64),
            frequency=jnp.asarray(1.3e9, jnp.float64),
            phase=jnp.asarray(30.0, jnp.float64),
            **kw,
        ),
        "voltage",
        5e6,
        {},
    ),
    "TransverseDeflectingCavity": (
        lambda **kw: ct.TransverseDeflectingCavity(
            length=jnp.asarray(0.6, jnp.float64),
            frequency=jnp.asarray(2.9e9, jnp.float64),
            phase=jnp.asarray(0.1, jnp.float64),
            **kw,
        ),
        "voltage",
        1e6,
        {},
    ),
    "HorizontalCorrector": (
        lambda **kw: ct.HorizontalCorrector(
            length=jnp.asarray(0.1, jnp.float64), **kw
        ),
        "angle",
        2e-4,
        {},
    ),
    "VerticalCorrector": (
        lambda **kw: ct.VerticalCorrector(
            length=jnp.asarray(0.1, jnp.float64), **kw
        ),
        "angle",
        -2e-4,
        {},
    ),
    "Aperture": (
        lambda **kw: ct.Aperture(y_max=jnp.asarray(3e-4, jnp.float64), **kw),
        "x_max",
        2e-4,
        {},
    ),
    "SpaceChargeKick": (
        lambda **kw: ct.SpaceChargeKick(grid_shape=(8, 8, 8), **kw),
        "effect_length",
        0.4,
        {},
    ),
}


def make_beam(key):
    return ct.ParticleBeam.from_parameters(
        num_particles=300,
        sigma_x=jnp.asarray(1.7e-4, jnp.float64),
        sigma_y=jnp.asarray(1.7e-4, jnp.float64),
        sigma_tau=jnp.asarray(1e-5, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        total_charge=jnp.asarray(1e-9, jnp.float64),
        energy=jnp.asarray(1.5e8, jnp.float64),
        key=key,
    )


@pytest.mark.parametrize("case_name", VECTOR_CASES.keys())
def test_vector_batch_matches_scalar_runs(case_name, key):
    build, param, base, extra = VECTOR_CASES[case_name]
    beam = make_beam(key)
    values = [base, base * 0.9]

    batched = build(**{param: jnp.asarray(values, jnp.float64)}, **extra)
    out_batched = batched.track(beam)
    if case_name == "Aperture":
        # Apertures only touch survival probabilities; the particle array
        # legitimately stays unvectorised (ref ``aperture.py:124-132``).
        assert out_batched.survival_probabilities.shape == (
            2,
            beam.num_particles,
        )
    else:
        assert out_batched.particles.shape == (2, beam.num_particles, 7)

    for i, value in enumerate(values):
        scalar = build(**{param: jnp.asarray(value, jnp.float64)}, **extra)
        out_scalar = scalar.track(beam)
        if case_name == "Aperture":
            np.testing.assert_allclose(
                out_batched.survival_probabilities[i],
                out_scalar.survival_probabilities,
                rtol=0,
                atol=0,
                err_msg=f"{case_name}[{i}]",
            )
            continue
        np.testing.assert_allclose(
            out_batched.particles[i],
            out_scalar.particles,
            rtol=1e-10,
            atol=1e-16,
            err_msg=f"{case_name}[{i}]",
        )


@pytest.mark.parametrize(
    "case_name", ["Quadrupole", "Dipole", "Cavity", "SpaceChargeKick"]
)
def test_two_dimensional_batch(case_name, key):
    build, param, base, extra = VECTOR_CASES[case_name]
    beam = make_beam(key)
    values = base * (1 + 0.1 * jnp.arange(6, dtype=jnp.float64)).reshape(3, 2)

    batched = build(**{param: values}, **extra)
    out = batched.track(beam)
    assert out.particles.shape == (3, 2, beam.num_particles, 7)

    # Spot-check one entry against the scalar run.
    scalar = build(**{param: values[1, 1]}, **extra)
    np.testing.assert_allclose(
        out.particles[1, 1],
        scalar.track(beam).particles,
        rtol=1e-10,
        atol=1e-16,
    )


def test_vectorized_beam_and_element_broadcast(key):
    """Vector dims on the beam and on the element broadcast together."""
    beam = make_beam(key)
    vector_beam = ct.ParticleBeam(
        particles=jnp.broadcast_to(
            beam.particles, (4, beam.num_particles, 7)
        ),
        energy=beam.energy,
        particle_charges=beam.particle_charges,
        survival_probabilities=beam.survival_probabilities,
        species=beam.species,
    )
    quad = ct.Quadrupole(
        jnp.asarray(0.3, jnp.float64),
        k1=jnp.linspace(-5, 5, 4, dtype=jnp.float64),
    )
    out = quad.track(vector_beam)
    assert out.particles.shape == (4, beam.num_particles, 7)

    # (3, 1) element batch x (4,) beam batch -> broadcast error is expected
    # because (3,1) x (4,) -> (3,4) mismatches the beam's (4,).
    quad2 = ct.Quadrupole(
        jnp.asarray(0.3, jnp.float64),
        k1=jnp.linspace(-5, 5, 3, dtype=jnp.float64)[:, None],
    )
    out2 = quad2.track(vector_beam)
    assert out2.particles.shape == (3, 4, beam.num_particles, 7)


def test_vectorized_parameter_beam_screen_reading():
    """The analytic ParameterBeam screen reading broadcasts over ``(3, 2)``
    vector dims (the reference raises ``NotImplementedError`` here,
    ``screen.py:252-258``)."""
    screen = ct.Screen(
        resolution=(32, 24),
        pixel_size=jnp.asarray([1e-4, 1e-4], jnp.float64),
        misalignment=jnp.asarray([3e-5, -2e-5], jnp.float64),
        method="histogram",
        is_active=True,
    )
    mu_x = jnp.linspace(-2e-4, 2e-4, 6, dtype=jnp.float64).reshape(3, 2)
    batched = ct.ParameterBeam.from_parameters(
        mu_x=mu_x,
        sigma_x=jnp.full((3, 2), 3e-4, jnp.float64),
        sigma_y=jnp.full((3, 2), 2e-4, jnp.float64),
        energy=jnp.full((3, 2), 1.5e8, jnp.float64),
    )
    images = screen.observe(batched)
    assert images.shape == (3, 2, 24, 32)

    # Each batch entry must equal the corresponding scalar-beam reading.
    for i in range(3):
        for j in range(2):
            single = ct.ParameterBeam(
                mu=batched.mu[i, j],
                cov=batched.cov[i, j],
                energy=batched.energy[i, j],
                total_charge=jnp.asarray(0.0, jnp.float64),
            )
            np.testing.assert_allclose(
                images[i, j], screen.observe(single), rtol=1e-12, atol=0
            )


def test_vectorized_segment_fusion(key):
    """Fused tracking with mixed scalar and batched element params."""
    beam = make_beam(key)
    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, jnp.float64)),
            ct.Quadrupole(
                jnp.asarray(0.3, jnp.float64),
                k1=jnp.linspace(-5, 5, 5, dtype=jnp.float64),
            ),
            ct.Drift(jnp.full((5,), 0.5, jnp.float64)),
        ]
    )
    out = segment.track(beam)
    assert out.particles.shape == (5, beam.num_particles, 7)
    assert out.sigma_x.shape == (5,)
