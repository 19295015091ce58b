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


# ---------------------------------------------------------------------------
# Mixed beam-batch x element-batch broadcasting (ref
# ``tests/test_vectorized.py:355-460``): a (2,)-vectorised beam energy times a
# (3, 1)-vectorised element parameter must produce (3, 2, N, 7) particles with
# unvectorised per-particle charges.
# ---------------------------------------------------------------------------

MIXED_LENGTH_CASES = {
    "Drift": lambda L: ct.Drift(L),
    "Quadrupole": lambda L: ct.Quadrupole(L, k1=jnp.asarray(3.0, jnp.float64)),
    "Dipole": lambda L: ct.Dipole(L, angle=jnp.asarray(0.05, jnp.float64)),
    "Sextupole": lambda L: ct.Sextupole(L, k2=jnp.asarray(30.0, jnp.float64)),
    "Solenoid": lambda L: ct.Solenoid(L, k=jnp.asarray(1.5, jnp.float64)),
    "Undulator": lambda L: ct.Undulator(
        L, period=jnp.asarray(0.05, jnp.float64), kx=jnp.asarray(1.0, jnp.float64)
    ),
    "Cavity": lambda L: ct.Cavity(
        L,
        voltage=jnp.asarray(5e6, jnp.float64),
        phase=jnp.asarray(30.0, jnp.float64),
        frequency=jnp.asarray(1.3e9, jnp.float64),
    ),
    "TransverseDeflectingCavity": lambda L: ct.TransverseDeflectingCavity(
        L,
        voltage=jnp.asarray(1e6, jnp.float64),
        phase=jnp.asarray(0.1, jnp.float64),
        frequency=jnp.asarray(2.9e9, jnp.float64),
    ),
    "HorizontalCorrector": lambda L: ct.HorizontalCorrector(
        L, angle=jnp.asarray(1e-4, jnp.float64)
    ),
    "VerticalCorrector": lambda L: ct.VerticalCorrector(
        L, angle=jnp.asarray(-1e-4, jnp.float64)
    ),
    "Drift_dkd": lambda L: ct.Drift(L, tracking_method="drift_kick_drift"),
    "Quadrupole_dkd": lambda L: ct.Quadrupole(
        L,
        k1=jnp.asarray(3.0, jnp.float64),
        tracking_method="drift_kick_drift",
    ),
    "Dipole_dkd": lambda L: ct.Dipole(
        L,
        angle=jnp.asarray(0.05, jnp.float64),
        tracking_method="drift_kick_drift",
    ),
    "TransverseDeflectingCavity_dkd": lambda L: ct.TransverseDeflectingCavity(
        L,
        voltage=jnp.asarray(1e6, jnp.float64),
        phase=jnp.asarray(0.1, jnp.float64),
        frequency=jnp.asarray(2.9e9, jnp.float64),
        tracking_method="drift_kick_drift",
    ),
}


def make_energy_batched_beam(key, num_particles=10_000):
    return ct.ParticleBeam.from_parameters(
        num_particles=num_particles,
        sigma_x=jnp.asarray(1.7e-4, jnp.float64),
        sigma_y=jnp.asarray(1.7e-4, jnp.float64),
        sigma_px=jnp.asarray(2e-5, jnp.float64),
        sigma_py=jnp.asarray(2e-5, jnp.float64),
        sigma_tau=jnp.asarray(1e-5, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        energy=jnp.asarray([154e6, 14e9], jnp.float64),
        key=key,
    )


@pytest.mark.parametrize("case_name", MIXED_LENGTH_CASES.keys())
def test_broadcasting_element_length_times_beam_energy(case_name, key):
    """(3, 1) element length x (2,) beam energy -> (3, 2, N, 7), with each
    broadcast entry equal to the corresponding scalar-length, scalar-energy
    run (ref ``tests/test_vectorized.py:355-400,420-434``)."""
    build = MIXED_LENGTH_CASES[case_name]
    beam = make_energy_batched_beam(key, num_particles=1_000)
    lengths = jnp.asarray([[0.6], [0.5], [0.4]], jnp.float64)

    out = build(lengths).track(beam)
    assert out.particles.shape == (3, 2, beam.num_particles, 7)
    assert out.particle_charges.shape == (beam.num_particles,)
    assert out.energy.shape == (2,)

    for i in (0, 2):
        for j in (0, 1):
            scalar = build(lengths[i, 0]).track(beam[j])
            np.testing.assert_allclose(
                out.particles[i, j],
                scalar.particles,
                rtol=1e-10,
                atol=1e-15,
                err_msg=f"{case_name}[{i},{j}]",
            )


def test_broadcasting_solenoid_misalignment_2d(key):
    """(3, 2, 2) solenoid misalignment x (2,) beam energy (ref
    ``tests/test_vectorized.py:436-459``)."""
    beam = make_energy_batched_beam(key, num_particles=1_000)
    misalignment = jnp.asarray(
        [
            [[1e-5, 2e-5], [2e-5, 3e-5]],
            [[3e-5, 4e-5], [4e-5, 5e-5]],
            [[5e-5, 6e-5], [6e-5, 7e-5]],
        ],
        jnp.float64,
    )
    element = ct.Solenoid(
        jnp.asarray(0.15, jnp.float64),
        k=jnp.asarray(1.2, jnp.float64),
        misalignment=misalignment,
    )
    out = element.track(beam)
    assert out.particles.shape == (3, 2, beam.num_particles, 7)
    scalar = ct.Solenoid(
        jnp.asarray(0.15, jnp.float64),
        k=jnp.asarray(1.2, jnp.float64),
        misalignment=misalignment[1, 0],
    ).track(beam[0])
    np.testing.assert_allclose(
        out.particles[1, 0], scalar.particles, rtol=1e-10, atol=1e-15
    )


def test_vectorized_aperture_broadcasting(key):
    """(3, 1) aperture size x (2,) beam energy: positions keep the beam's
    batch, survival gains the aperture's (ref
    ``tests/test_vectorized.py:462-504``)."""
    beam = make_energy_batched_beam(key, num_particles=10_000)
    for shape in ("rectangular", "elliptical"):
        segment = ct.Segment(
            [
                ct.Drift(jnp.asarray(0.5, jnp.float64)),
                ct.Aperture(
                    x_max=jnp.asarray([[1e-5], [2e-4], [3e-4]], jnp.float64),
                    y_max=jnp.asarray(2e-4, jnp.float64),
                    shape=shape,
                    is_active=True,
                ),
                ct.Drift(jnp.asarray(0.5, jnp.float64)),
            ]
        )
        out = segment.track(beam)
        assert out.particles.shape == (2, beam.num_particles, 7)
        assert out.energy.shape == (2,)
        assert out.particle_charges.shape == (beam.num_particles,)
        assert out.survival_probabilities.shape == (3, 2, beam.num_particles)
        # Wider apertures keep more particles.
        survival = np.asarray(out.survival_probabilities.mean(axis=-1))
        assert (np.diff(survival, axis=0) >= 0).all()


def test_enormous_parameter_beam_settings_through_ares():
    """(3, 100_000) quadrupole settings through the ARES EA subcell with a
    ParameterBeam (the reference's 'enormous' stress case, ref
    ``tests/test_vectorized.py:186-215``)."""
    from cheetah_tpu.lattices import ares_ea_subcell

    segment = ares_ea_subcell(dtype=jnp.float64)
    k1 = jnp.tile(
        jnp.linspace(-30.0, 30.0, 100_000, dtype=jnp.float64), (3, 1)
    )
    segment.AREAMQZM1.k1 = k1

    beam = ct.ParameterBeam.from_parameters(
        sigma_x=jnp.asarray(1.7e-4, jnp.float64),
        sigma_y=jnp.asarray(1.7e-4, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        energy=jnp.asarray(1.54e8, jnp.float64),
    )
    out = segment.track(beam)
    for stat in ("mu_x", "mu_px", "mu_y", "mu_py", "sigma_x", "sigma_px",
                 "sigma_y", "sigma_py", "sigma_tau", "sigma_p"):
        assert getattr(out, stat).shape == (3, 100_000), stat
    assert out.energy.shape == ()

    # Spot-check one setting against the scalar run.
    segment_scalar = ares_ea_subcell(dtype=jnp.float64)
    segment_scalar.AREAMQZM1.k1 = k1[1, 12_345]
    out_scalar = segment_scalar.track(beam)
    np.testing.assert_allclose(
        float(out.sigma_x[1, 12_345]), float(out_scalar.sigma_x), rtol=1e-10
    )


def test_vectorized_screen_2d_readings(key):
    """A (2, 3)-vectorised screen misalignment produces (2, 3, h, w) readings
    (ref ``tests/test_vectorized.py:307-352``)."""
    misalignment = jnp.asarray(
        [
            [[1e-4, 2e-4], [3e-4, 4e-4], [5e-4, 6e-4]],
            [[-1e-4, -2e-4], [-3e-4, -4e-4], [-5e-4, -6e-4]],
        ],
        jnp.float64,
    )
    for method in ("histogram", "kde"):
        segment = ct.Segment(
            [
                ct.Drift(jnp.asarray(1.0, jnp.float64)),
                ct.Screen(
                    resolution=(100, 100),
                    pixel_size=jnp.asarray([1e-5, 1e-5], jnp.float64),
                    misalignment=misalignment,
                    is_active=True,
                    method=method,
                    name="my_screen",
                ),
            ]
        )
        beam = ct.ParticleBeam.from_parameters(
            num_particles=1_000,
            sigma_x=jnp.asarray(1e-5, jnp.float64),
            energy=jnp.asarray(1.5e8, jnp.float64),
            key=key,
        )
        _, readings = segment.track_with_readings(beam)
        assert readings["my_screen"].shape == (2, 3, 100, 100), method


def test_vectorized_getitem_matches_scalar_tracking(key):
    """__getitem__ on a (3, 4)-vectorised outgoing beam returns exactly the
    per-entry scalar results (broadcast-then-index, ref
    ``particle_beam.py:1976-2001``)."""
    beam = make_beam(key)
    quad = ct.Quadrupole(
        jnp.asarray(0.3, jnp.float64),
        k1=jnp.linspace(-8.0, 8.0, 12, dtype=jnp.float64).reshape(3, 4),
    )
    out = quad.track(beam)
    assert out.particles.shape == (3, 4, beam.num_particles, 7)

    sub = out[1]
    assert sub.particles.shape == (4, beam.num_particles, 7)
    single = out[2, 3]
    assert single.particles.shape == (beam.num_particles, 7)

    scalar = ct.Quadrupole(
        jnp.asarray(0.3, jnp.float64), k1=quad.k1[2, 3]
    ).track(beam)
    np.testing.assert_allclose(
        np.asarray(single.particles), np.asarray(scalar.particles),
        rtol=1e-12, atol=1e-16,
    )
    np.testing.assert_allclose(
        np.asarray(sub.particles[3]), np.asarray(out.particles[1, 3]),
        rtol=0, atol=0,
    )
    # Unvectorised members broadcast before indexing.
    assert single.particle_charges.shape == (beam.num_particles,)
    assert single.energy.shape == ()


def test_plotting_vector_idx_selects_instance(key):
    """plot_overview / plot_beam_attrs with vector_idx on a vectorised
    lattice (smoke + the selected curve matches the scalar lattice)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    beam = make_beam(key)
    k1 = jnp.linspace(-5.0, 5.0, 3, dtype=jnp.float64)
    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, jnp.float64), name="d1"),
            ct.Quadrupole(jnp.asarray(0.3, jnp.float64), k1=k1, name="q1"),
            ct.Drift(jnp.asarray(0.5, jnp.float64), name="d2"),
        ]
    )
    fig = segment.plot_overview(incoming=beam, vector_idx=(1,))
    plt.close(fig)

    ax = segment.plot_beam_attrs(
        incoming=beam,
        attr_names=("sigma_x", "sigma_y"),
        vector_idx=(2,),
    )
    curve = ax.lines[0].get_ydata()
    plt.close(ax.figure)

    scalar_segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, jnp.float64), name="d1"),
            ct.Quadrupole(jnp.asarray(0.3, jnp.float64), k1=k1[2], name="q1"),
            ct.Drift(jnp.asarray(0.5, jnp.float64), name="d2"),
        ]
    )
    ax_scalar = scalar_segment.plot_beam_attrs(
        incoming=beam, attr_names=("sigma_x", "sigma_y")
    )
    curve_scalar = ax_scalar.lines[0].get_ydata()
    plt.close(ax_scalar.figure)
    np.testing.assert_allclose(curve, curve_scalar, rtol=1e-12)
