"""Cavity edge cases (ref ``cheetah/tests/test_cavity.py``).

The reference's two regressions here are (a) vectorised tracking through the
energy-gain branch must not trip scalar-only control flow (ref
``test_cavity.py:7-33``), and (b) a vectorised mix of switched-off and
switched-on cavities must not produce NaNs in the transfer map — the r55/r56
entries divide by voltage-dependent terms (ref ``test_cavity.py:36-83``).
Both are trace-safe by construction in this framework (``lax``-free masking
in ``cavity.py``), so these tests pin that property.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

F64 = jnp.float64


def test_vectorized_energy_gain_branch():
    """Vectorised cavity settings through the accelerating branch: the
    reference's scalar ``assert Ei > 0`` blew up on vector inputs (ref
    ``test_cavity.py:7-33``); here the whole path must be batch-clean."""
    cavity = ct.Cavity(
        length=jnp.full((3,), 3.0441, F64),
        voltage=jnp.full((3,), 48198468.0, F64),
        phase=jnp.full((3,), 48198468.0, F64),
        frequency=jnp.full((3,), 2.8560e9, F64),
        name="k26_2a",
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=10_000,
        sigma_x=jnp.asarray(1e-5, F64),
        key=jax.random.PRNGKey(0),
    )

    outgoing = cavity.track(beam)

    assert outgoing.particles.shape == (3, 10_000, 7)
    assert bool(jnp.all(jnp.isfinite(outgoing.particles)))
    # The (nonsensical, reference-chosen) phase lands off-crest: the energy
    # *changes*; the point of the test is that the vector path doesn't crash.
    assert bool(jnp.all(outgoing.energy != beam.energy))


@pytest.mark.parametrize(
    ("voltage", "phase"),
    [
        (0.0, [-90.0, 90.0]),
        ([0.0, 1e6], [[-90.0], [0.0], [90.0], [180.0]]),
        (1e6, [0.0, 180.0]),
    ],
    ids=["off", "mixed", "on"],
)
@pytest.mark.parametrize("cavity_type", ["standing_wave", "traveling_wave"])
def test_vectorized_inactive_cavity(cavity_type, voltage, phase):
    """A vectorised mix of off (zero-voltage / zero-crossing) and on cavities
    must produce a NaN-free transfer map and beam — the reference regression
    where removing the zero special case sent NaNs through ``_cavity_rmatrix``
    (ref ``test_cavity.py:36-83``)."""
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # zero-crossing PhysicsWarning
        cavity = ct.Cavity(
            cavity_type=cavity_type,
            length=jnp.asarray(3.0441, F64),
            voltage=jnp.asarray(voltage, F64),
            phase=jnp.asarray(phase, F64),
            frequency=jnp.asarray(2.8560e9, F64),
        )
    incoming = ct.ParameterBeam.from_parameters(
        sigma_x=jnp.asarray(4.8492e-6, F64),
        sigma_px=jnp.asarray(1.5603e-7, F64),
        sigma_y=jnp.asarray(4.1209e-7, F64),
        sigma_py=jnp.asarray(1.1035e-8, F64),
        sigma_tau=jnp.asarray(1.0e-10, F64),
        sigma_p=jnp.asarray(1.0e-6, F64),
        energy=jnp.asarray(8.0e9, F64),
        total_charge=jnp.asarray(0.0, F64),
    )

    outgoing = cavity.track(incoming)

    tm = cavity.first_order_transfer_map(incoming.energy, incoming.species)
    assert bool(jnp.all(jnp.isfinite(tm)))
    assert bool(jnp.all(jnp.isfinite(outgoing.sigma_x)))
    assert bool(jnp.all(jnp.isfinite(outgoing.sigma_y)))
    assert bool(jnp.all(jnp.isfinite(outgoing.beta_x)))
    assert bool(jnp.all(jnp.isfinite(outgoing.beta_y)))


def test_zero_voltage_equals_drift():
    """A zero-voltage cavity's first-order map is exactly the drift map, and
    its tracked beam matches the drift to the documented tolerance (the
    bespoke cavity ``track`` recomputes the energy spread even at zero
    voltage, ``cavity.py`` class docstring — same behaviour as the
    reference, which is why ``skippable_when_off`` is opt-in)."""
    length = jnp.asarray(2.1, F64)
    cavity = ct.Cavity(length=length, voltage=jnp.asarray(0.0, F64))
    drift = ct.Drift(length=length)
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_px=jnp.asarray(2e-6, F64),
        sigma_py=jnp.asarray(2e-6, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        key=jax.random.PRNGKey(1),
    )

    np.testing.assert_allclose(
        np.asarray(cavity.first_order_transfer_map(beam.energy, beam.species)),
        np.asarray(drift.first_order_transfer_map(beam.energy, beam.species)),
        rtol=1e-12,
        atol=1e-15,
    )
    np.testing.assert_allclose(
        np.asarray(cavity.track(beam).particles),
        np.asarray(drift.track(beam).particles),
        rtol=1e-6,
        atol=5e-9,
    )


def test_traveling_wave_differs_from_standing_wave():
    """The two cavity models are genuinely different transports at the same
    settings (guards against one silently aliasing the other)."""
    kwargs = dict(
        length=jnp.asarray(3.0441, F64),
        voltage=jnp.asarray(4.8e7, F64),
        phase=jnp.asarray(30.0, F64),
        frequency=jnp.asarray(2.856e9, F64),
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.asarray(1e-4, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=jax.random.PRNGKey(2),
    )

    out_sw = ct.Cavity(cavity_type="standing_wave", **kwargs).track(beam)
    out_tw = ct.Cavity(cavity_type="traveling_wave", **kwargs).track(beam)

    # Same energy gain model ...
    np.testing.assert_allclose(
        np.asarray(out_sw.energy), np.asarray(out_tw.energy), rtol=1e-12
    )
    # ... different in-cavity focusing.
    assert not np.allclose(
        np.asarray(out_sw.particles), np.asarray(out_tw.particles), rtol=1e-9
    )
