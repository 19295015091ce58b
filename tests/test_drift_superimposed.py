"""Drift and Superimposed edge cases (ref ``cheetah/tests/test_drift.py``,
``test_superimposed.py``, ``test_tracking_lengthless_elements.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

F64 = jnp.float64


# ----------------------------------------------------------------------
# Drift (ref test_drift.py)
# ----------------------------------------------------------------------


def test_diverging_parameter_beam():
    """sigma_px/py > 0 grows the beam through a drift (ref
    ``test_drift.py:7-22``), and total charge is conserved."""
    drift = ct.Drift(length=jnp.asarray(1.0, F64))
    incoming = ct.ParameterBeam.from_parameters(
        sigma_px=jnp.asarray(2e-7, F64),
        sigma_py=jnp.asarray(2e-7, F64),
        total_charge=jnp.asarray(1e-9, F64),
    )
    outgoing = drift.track(incoming)

    assert float(outgoing.sigma_x) > float(incoming.sigma_x)
    assert float(outgoing.sigma_y) > float(incoming.sigma_y)
    np.testing.assert_allclose(
        float(outgoing.total_charge), float(incoming.total_charge), rtol=1e-12
    )


def test_diverging_particle_beam(key):
    drift = ct.Drift(length=jnp.asarray(1.0, F64))
    incoming = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_px=jnp.asarray(2e-4, F64),
        sigma_py=jnp.asarray(2e-4, F64),
        total_charge=jnp.asarray(1e-9, F64),
        key=key,
    )
    outgoing = drift.track(incoming)

    assert float(outgoing.sigma_x) > float(incoming.sigma_x)
    assert float(outgoing.sigma_y) > float(incoming.sigma_y)
    np.testing.assert_allclose(
        np.asarray(outgoing.particle_charges),
        np.asarray(incoming.particle_charges),
        rtol=1e-12,
    )


@pytest.mark.parametrize(
    "tracking_method", ["linear", "drift_kick_drift"], ids=["linear", "dkd"]
)
def test_inversion_with_negative_length(key, tracking_method):
    """A -L drift undoes an +L drift exactly (ref
    ``test_drift.py:96-115``) — in the exact Bmad drift this holds to
    round-off, in the linear map identically."""
    segment = ct.Segment(
        [
            ct.Drift(length=jnp.asarray(0.7, F64), tracking_method=tracking_method),
            ct.Drift(length=jnp.asarray(-0.7, F64), tracking_method=tracking_method),
        ]
    )
    incoming = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_px=jnp.asarray(2e-5, F64),
        sigma_py=jnp.asarray(2e-5, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        key=key,
    )

    outgoing = segment.track(incoming)

    # The dkd path round-trips through Bmad (z, pz) coordinates; the
    # conversion costs a few ulp in p.
    np.testing.assert_allclose(
        np.asarray(outgoing.particles),
        np.asarray(incoming.particles),
        rtol=1e-12,
        atol=1e-14,
    )
    np.testing.assert_allclose(float(outgoing.energy), float(incoming.energy))


# ----------------------------------------------------------------------
# Superimposed (ref test_superimposed.py)
# ----------------------------------------------------------------------


def test_superimposed_base_split_length():
    """The internal segment is half-base / superimposed / half-base (ref
    ``test_superimposed.py:7-25``)."""
    superimposed = ct.Superimposed(
        base_element=ct.Quadrupole(length=jnp.asarray(1.0, F64)),
        superimposed_element=ct.BPM(),
    )
    segment = superimposed._segment()

    assert len(segment.elements) == 3
    assert isinstance(segment.elements[0], ct.Quadrupole)
    assert isinstance(segment.elements[1], ct.BPM)
    assert isinstance(segment.elements[2], ct.Quadrupole)
    np.testing.assert_allclose(float(segment.elements[0].length), 0.5)
    np.testing.assert_allclose(float(segment.elements[2].length), 0.5)
    np.testing.assert_allclose(float(superimposed.length), 1.0)


def test_superimposed_first_order_transfer_map():
    """The transfer map equals the base element's (ref
    ``test_superimposed.py:28-46``)."""
    quadrupole = ct.Quadrupole(
        length=jnp.asarray(1.0, F64), k1=jnp.asarray(4.2, F64)
    )
    superimposed = ct.Superimposed(
        base_element=quadrupole, superimposed_element=ct.BPM()
    )
    energy = jnp.asarray(1.0e9, F64)
    species = ct.Species("electron")

    np.testing.assert_allclose(
        np.asarray(superimposed.first_order_transfer_map(energy, species)),
        np.asarray(quadrupole.first_order_transfer_map(energy, species)),
        rtol=1e-12,
        atol=1e-18,
    )


def test_superimposed_flattening():
    """``Segment.flattened()`` unrolls the internal structure (ref
    ``test_superimposed.py:49-75``)."""
    segment = ct.Segment(
        [
            ct.Drift(length=jnp.asarray(1.0, F64)),
            ct.Superimposed(
                base_element=ct.Quadrupole(
                    length=jnp.asarray(1.0, F64), k1=jnp.asarray(1.0, F64)
                ),
                superimposed_element=ct.BPM(),
            ),
            ct.Drift(length=jnp.asarray(1.0, F64)),
        ]
    )
    flattened = segment.flattened()

    assert len(flattened.elements) == 5
    assert isinstance(flattened.elements[0], ct.Drift)
    assert isinstance(flattened.elements[1], ct.Quadrupole)
    assert isinstance(flattened.elements[2], ct.BPM)
    assert isinstance(flattened.elements[3], ct.Quadrupole)
    assert isinstance(flattened.elements[4], ct.Drift)


def test_superimposed_rejects_nonzero_length():
    with pytest.raises(AssertionError, match="must have zero length"):
        ct.Superimposed(
            base_element=ct.Quadrupole(length=jnp.asarray(1.0, F64)),
            superimposed_element=ct.Dipole(length=jnp.asarray(0.5, F64)),
        )


def test_superimposed_bpm_reads_midpoint(key):
    """The superimposed BPM observes the beam at the base element's centre,
    not at either end."""
    drift = ct.Drift(length=jnp.asarray(2.0, F64))
    bpm = ct.BPM(name="mid", is_active=True)
    superimposed = ct.Superimposed(base_element=drift, superimposed_element=bpm)
    incoming = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        mu_x=jnp.asarray(1e-4, F64),
        mu_px=jnp.asarray(1e-5, F64),
        key=key,
    )

    _, readings = ct.Segment([superimposed]).track_with_readings(incoming)

    half_tracked = ct.Drift(length=jnp.asarray(1.0, F64)).track(incoming)
    np.testing.assert_allclose(
        float(readings["mid"][0]), float(half_tracked.mu_x), rtol=1e-12
    )


# ----------------------------------------------------------------------
# Length-less elements (ref test_tracking_lengthless_elements.py)
# ----------------------------------------------------------------------


def test_tracking_marker_only(key):
    beam = ct.ParticleBeam.from_parameters(num_particles=100, key=key)
    segment = ct.Segment([ct.Marker(name="start")])

    outgoing = segment.track(beam)

    np.testing.assert_array_equal(
        np.asarray(outgoing.particles), np.asarray(beam.particles)
    )


def test_tracking_lengthless_between_nonskippable(key):
    """Markers sandwiched between non-skippable cavities track cleanly (ref
    ``test_tracking_lengthless_elements.py:18-31``)."""
    beam = ct.ParticleBeam.from_parameters(num_particles=100, key=key)
    segment = ct.Segment(
        [
            ct.Cavity(
                length=jnp.asarray(0.1, F64),
                voltage=jnp.asarray(1e6, F64),
                name="C2",
            ),
            ct.Marker(name="start"),
            ct.Cavity(
                length=jnp.asarray(0.1, F64),
                voltage=jnp.asarray(1e6, F64),
                name="C1",
            ),
        ]
    )

    outgoing = segment.track(beam)
    assert bool(jnp.all(jnp.isfinite(outgoing.particles)))
    assert float(outgoing.energy) > float(beam.energy)
