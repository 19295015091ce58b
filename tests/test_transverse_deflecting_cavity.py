"""TransverseDeflectingCavity vectorisation edge cases (ref
``cheetah/tests/test_transverse_deflecting_cavity.py:45-137``).

The dkd step loop must broadcast element parameters against beam batch dims
in every combination — the reference's regressions were shape errors when the
beam's energy batch met a differently-shaped element-parameter batch. The
external Bmad-X numeric ground truth for the dkd kernel itself lives in
``tests/test_compare_bmadx_dkd.py``.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

F64 = jnp.float64


def make_energy_batched_beam():
    return ct.ParticleBeam.from_parameters(
        num_particles=10_000,
        sigma_px=jnp.asarray(2e-7, F64),
        sigma_py=jnp.asarray(2e-7, F64),
        energy=jnp.asarray([50e6, 60e6], F64),
        key=jax.random.PRNGKey(0),
    )


@pytest.mark.parametrize(
    "tdc_kwargs",
    [
        {"voltage": jnp.asarray([[1e7], [2e7], [3e7]], F64)},
        {"phase": jnp.asarray([[0.6], [0.5], [0.4]], F64)},
        {"frequency": jnp.asarray([[1e9], [2e9], [3e9]], F64)},
    ],
    ids=["voltage", "phase", "frequency"],
)
def test_tdc_parameter_times_energy_vectorization(tdc_kwargs):
    """A (3, 1)-batched TDC parameter broadcast against a (2,)-energy-batched
    beam yields a (3, 2) batch (ref ``test_transverse_deflecting_cavity.py``
    per-parameter vectorisation tests)."""
    defaults = dict(
        length=jnp.asarray(1.0, F64),
        voltage=jnp.asarray(1e7, F64),
        phase=jnp.asarray(0.4, F64),
        frequency=jnp.asarray(1e9, F64),
        tracking_method="drift_kick_drift",
    )
    defaults.update(tdc_kwargs)
    tdc = ct.TransverseDeflectingCavity(**defaults)

    outgoing = tdc.track(make_energy_batched_beam())

    assert outgoing.particles.shape[:-2] == (3, 2)
    assert bool(jnp.all(jnp.isfinite(outgoing.particles)))


def test_tdc_all_parameters_vectorization():
    """All element parameters batched on orthogonal axes broadcast to the
    full (4, 3, 2, 2) batch (ref
    ``test_transverse_deflecting_cavity.py:115-137``)."""
    tdc = ct.TransverseDeflectingCavity(
        length=jnp.asarray(1.0, F64),
        voltage=jnp.ones((4, 1, 1, 1), F64) * 1e7,
        phase=jnp.ones((1, 3, 1, 1), F64) * 0.4,
        frequency=jnp.ones((1, 1, 2, 1), F64) * 1e9,
        tracking_method="drift_kick_drift",
    )

    outgoing = tdc.track(make_energy_batched_beam())

    assert outgoing.particles.shape[:-2] == (4, 3, 2, 2)


def test_tdc_zero_voltage_equals_bmad_drift():
    """With zero voltage the dkd TDC reduces to the exact Bmad drift."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_px=jnp.asarray(2e-5, F64),
        sigma_py=jnp.asarray(2e-5, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=jax.random.PRNGKey(1),
    )
    tdc = ct.TransverseDeflectingCavity(
        length=jnp.asarray(1.0, F64),
        voltage=jnp.asarray(0.0, F64),
        frequency=jnp.asarray(1e9, F64),
        tracking_method="drift_kick_drift",
    )
    drift = ct.Drift(
        length=jnp.asarray(1.0, F64), tracking_method="drift_kick_drift"
    )

    np.testing.assert_allclose(
        np.asarray(tdc.track(beam).particles),
        np.asarray(drift.track(beam).particles),
        rtol=1e-12,
        atol=1e-15,
    )


def test_tdc_tilt_rotates_kick_plane():
    """A tilt of pi/2 moves the deflection from the horizontal to the
    vertical plane: x'-kick of the untilted TDC equals the y'-kick of the
    tilted one on a zero-transverse pencil beam (x = px = y = py = 0, so the
    transverse-coordinate coupling into tau vanishes and the mapping is
    exact)."""
    tau = jnp.linspace(-3e-4, 3e-4, 1_000, dtype=F64)
    p = jnp.linspace(-1e-3, 1e-3, 1_000, dtype=F64)
    particles = jnp.stack(
        [jnp.zeros_like(tau)] * 4 + [tau, p, jnp.ones_like(tau)], axis=-1
    )
    beam = ct.ParticleBeam(
        particles=particles, energy=jnp.asarray(1.5e8, F64)
    )
    kwargs = dict(
        length=jnp.asarray(1.0, F64),
        voltage=jnp.asarray(1e7, F64),
        phase=jnp.asarray(0.3, F64),
        frequency=jnp.asarray(1e9, F64),
        tracking_method="drift_kick_drift",
    )
    out_h = ct.TransverseDeflectingCavity(**kwargs).track(beam)
    out_v = ct.TransverseDeflectingCavity(
        tilt=jnp.asarray(jnp.pi / 2, F64), **kwargs
    ).track(beam)

    np.testing.assert_allclose(
        np.asarray(out_h.px), np.asarray(out_v.py), rtol=1e-9, atol=1e-16
    )
    np.testing.assert_allclose(
        np.asarray(out_h.tau), np.asarray(out_v.tau), rtol=1e-9, atol=1e-16
    )


def test_tdc_jit_and_grad():
    """The dkd TDC is jit- and reverse-mode-differentiable end to end."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=500,
        sigma_tau=jnp.asarray(1e-4, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=jax.random.PRNGKey(3),
    )

    def loss(voltage):
        tdc = ct.TransverseDeflectingCavity(
            length=jnp.asarray(1.0, F64),
            voltage=voltage,
            phase=jnp.asarray(0.3, F64),
            frequency=jnp.asarray(1e9, F64),
            tracking_method="drift_kick_drift",
        )
        return tdc.track(beam).sigma_px

    grad = jax.jit(jax.grad(loss))(jnp.asarray(1e7, F64))
    assert bool(jnp.isfinite(grad)) and float(grad) != 0.0
