"""Sextupole edge cases (ref ``cheetah/tests/test_sextupole.py``).

The reference anchors the sextupole numerics to Ocelot's second-order
tracking; this repo's numeric anchors are the live torch oracle
(``tests/test_elements.py``) and the golden corpus. What lives here are the
reference's *analytic* invariants: k2=0 degenerates to a drift, misalignment
equivalence, the 3-fold rotational symmetry of the sextupole field, and
vectorised parameter broadcasting (ref ``test_sextupole.py:46-188``).
"""

import jax
import jax.numpy as jnp
import numpy as np

import cheetah_tpu as ct

F64 = jnp.float64


def make_beam(key, **overrides):
    params = dict(
        num_particles=2_000,
        mu_x=jnp.asarray(2e-4, F64),
        sigma_x=jnp.asarray(3e-4, F64),
        sigma_y=jnp.asarray(2e-4, F64),
        sigma_px=jnp.asarray(2e-7, F64),
        sigma_py=jnp.asarray(2e-7, F64),
        sigma_p=jnp.asarray(1e-2, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=key,
    )
    params.update(overrides)
    return ct.ParticleBeam.from_parameters(**params)


def test_sextupole_as_drift(key):
    """k2 = 0 transports identically to a second-order drift of the same
    length, and matches the linear drift to the reference's tolerance
    (second-order chromatic T5xx terms, ref ``test_sextupole.py:131-149``
    compares at atol=1e-5)."""
    beam = make_beam(key)
    sextupole = ct.Sextupole(length=jnp.asarray(0.11, F64), k2=jnp.asarray(0.0, F64))
    second_order_drift = ct.Drift(
        length=jnp.asarray(0.11, F64), tracking_method="second_order"
    )
    linear_drift = ct.Drift(length=jnp.asarray(0.11, F64))

    np.testing.assert_allclose(
        np.asarray(sextupole.track(beam).particles),
        np.asarray(second_order_drift.track(beam).particles),
        rtol=1e-12,
        atol=1e-18,
    )
    np.testing.assert_allclose(
        np.asarray(sextupole.track(beam).particles),
        np.asarray(linear_drift.track(beam).particles),
        rtol=1e-5,
        atol=1e-6,
    )


def test_sextupole_with_misalignment(key):
    """Centered beam through a misaligned sextupole == misaligned beam through
    a centered sextupole, with the output shifted back (ref
    ``test_sextupole.py:152-188``)."""
    dx = 1e-3
    misaligned_sextupole = ct.Sextupole(
        length=jnp.asarray(1.0, F64),
        k2=jnp.asarray(0.5, F64),
        misalignment=jnp.asarray([dx, 0.0], F64),
    )
    centered_beam = make_beam(key, mu_x=jnp.asarray(0.0, F64))

    through_misaligned = misaligned_sextupole.track(centered_beam)

    centered_sextupole = ct.Sextupole(
        length=jnp.asarray(1.0, F64), k2=jnp.asarray(0.5, F64)
    )
    shifted_beam = centered_beam.clone()
    shifted_beam.x = shifted_beam.x - dx
    through_centered = centered_sextupole.track(shifted_beam)
    shifted_back = through_centered.clone()
    shifted_back.x = shifted_back.x + dx

    np.testing.assert_allclose(
        np.asarray(through_misaligned.particles),
        np.asarray(shifted_back.particles),
        rtol=1e-9,
        atol=1e-16,
    )


def test_sextupole_three_fold_symmetry(key):
    """The sextupole potential ~ Re[(x+iy)^3] is invariant under a 2*pi/3
    tilt: rotating the magnet by its pole symmetry angle must reproduce the
    identical transport."""
    beam = make_beam(key)
    base = ct.Sextupole(length=jnp.asarray(0.3, F64), k2=jnp.asarray(40.0, F64))
    rotated = ct.Sextupole(
        length=jnp.asarray(0.3, F64),
        k2=jnp.asarray(40.0, F64),
        tilt=jnp.asarray(2 * jnp.pi / 3, F64),
    )

    # The symmetry holds to the T-tensor rotation-conjugation round-off
    # (~1e-11 absolute on mm-scale coordinates, ~1e-5 of the k2 kick).
    np.testing.assert_allclose(
        np.asarray(base.track(beam).particles),
        np.asarray(rotated.track(beam).particles),
        rtol=0,
        atol=1e-9,
    )


def test_sextupole_half_turn_flips_kick(key):
    """A pi/3 tilt flips the sextupole field sign — equivalent to negating
    k2 (the n=3 multipole analogue of the reference's tilt checks)."""
    beam = make_beam(key)
    tilted = ct.Sextupole(
        length=jnp.asarray(0.3, F64),
        k2=jnp.asarray(40.0, F64),
        tilt=jnp.asarray(jnp.pi / 3, F64),
    )
    negated = ct.Sextupole(length=jnp.asarray(0.3, F64), k2=jnp.asarray(-40.0, F64))

    np.testing.assert_allclose(
        np.asarray(tilted.track(beam).particles),
        np.asarray(negated.track(beam).particles),
        rtol=0,
        atol=1e-9,
    )


def test_sextupole_vectorized_broadcast(key):
    """(2,)-batched k2 against (3, 1)-batched tilt broadcasts to a (3, 2)
    batch and matches the per-entry scalar transports (ref
    ``test_sextupole.py:46-84``)."""
    beam = make_beam(key)
    k2 = jnp.asarray([40.0, 87.0], F64)
    tilt = jnp.asarray([[0.0], [jnp.pi / 6], [jnp.pi / 2]], F64)
    sextupole = ct.Sextupole(length=jnp.asarray(0.11, F64), k2=k2, tilt=tilt)

    outgoing = sextupole.track(beam)
    assert outgoing.particles.shape[:-2] == (3, 2)

    for i in range(3):
        for j in range(2):
            scalar = ct.Sextupole(
                length=jnp.asarray(0.11, F64), k2=k2[j], tilt=tilt[i, 0]
            )
            np.testing.assert_allclose(
                np.asarray(outgoing.particles[i, j]),
                np.asarray(scalar.track(beam).particles),
                rtol=1e-12,
                atol=1e-18,
            )
