"""Drift-kick-drift tracking validated against stored Bmad-X outputs for a
10k-particle beam (vendored from the reference's external ground-truth set,
ref ``tests/test_quadrupole.py:172-207``, ``test_dipole.py:105-150``,
``test_drift.py:41-66``, ``test_transverse_deflecting_cavity.py:7-41``).

Unlike the live torch oracle (a *translated* reference), these expected
outputs come from Bmad-X itself — in particular this is the only independent
check of the TransverseDeflectingCavity dkd kernel.
"""

import math
import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

RESOURCE = (
    pathlib.Path(__file__).parent
    / "resources"
    / "bmad"
    / "bmadx_dkd_ground_truth.npz"
)

pytestmark = pytest.mark.skipif(
    not RESOURCE.is_file(), reason="Bmad-X ground-truth resources unavailable"
)

_ANGLE = 20 * math.pi / 180


def _make_element(name: str, dtype) -> ct.Element:
    if name == "drift":
        return ct.Drift(
            length=jnp.asarray(1.0, dtype), tracking_method="drift_kick_drift"
        )
    if name == "quadrupole":
        return ct.Quadrupole(
            length=jnp.asarray(1.0, dtype),
            k1=jnp.asarray(10.0, dtype),
            misalignment=jnp.asarray([0.01, -0.02], dtype),
            tilt=jnp.asarray(0.5, dtype),
            num_steps=10,
            tracking_method="drift_kick_drift",
        )
    if name == "dipole":
        return ct.Dipole(
            length=jnp.asarray(0.5, dtype),
            angle=jnp.asarray(_ANGLE, dtype),
            dipole_e1=jnp.asarray(_ANGLE / 2, dtype),
            dipole_e2=jnp.asarray(_ANGLE / 2, dtype),
            tilt=jnp.asarray(0.1, dtype),
            fringe_integral=jnp.asarray(0.5, dtype),
            fringe_integral_exit=jnp.asarray(0.5, dtype),
            gap=jnp.asarray(0.05, dtype),
            gap_exit=jnp.asarray(0.05, dtype),
            fringe_at="both",
            fringe_type="linear_edge",
            tracking_method="drift_kick_drift",
        )
    if name == "transverse_deflecting_cavity":
        return ct.TransverseDeflectingCavity(
            length=jnp.asarray(1.0, dtype),
            voltage=jnp.asarray(1e7, dtype),
            phase=jnp.asarray(0.2, dtype),
            frequency=jnp.asarray(1e9, dtype),
            tracking_method="drift_kick_drift",
        )
    raise ValueError(name)


@pytest.mark.parametrize(
    "element_name", ["drift", "quadrupole", "dipole", "transverse_deflecting_cavity"]
)
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64], ids=["f32", "f64"])
def test_dkd_matches_bmadx_ground_truth(element_name, dtype):
    data = np.load(RESOURCE)
    incoming = ct.ParticleBeam(
        particles=jnp.asarray(data["incoming_particles"], dtype),
        energy=jnp.asarray(data["incoming_energy"], dtype),
        particle_charges=jnp.asarray(data["incoming_particle_charges"], dtype),
        species=ct.Species(str(data["incoming_species"]), dtype=dtype),
    )
    element = _make_element(element_name, dtype)

    outgoing = element.track(incoming)

    expected = data[f"outgoing_{element_name}"].reshape(-1, 7).astype(dtype)
    # Reference tolerances (``test_quadrupole.py:202-207``): exact at f64,
    # loose at f32.
    if dtype == jnp.float64:
        atol, rtol = 1e-14, 1e-14
    else:
        atol, rtol = 1e-5, 1e-6
    np.testing.assert_allclose(
        np.asarray(outgoing.particles), expected, atol=atol, rtol=rtol
    )


def test_dkd_quadrupole_gradient_matches_reference_autograd():
    """Reverse-mode gradient of a beam-size loss w.r.t. (k1, length, tilt)
    through the drift-kick-drift quadrupole matches torch autograd on the
    live reference — end-to-end AD parity evidence for the chromatic
    factorisation path (which torch does not use)."""
    import jax

    from reference_oracle import ref, ref_particle_beam, to_torch, torch

    incoming = ct.ParticleBeam.from_twiss(
        num_particles=2_000,
        beta_x=jnp.asarray(5.0, jnp.float64),
        alpha_x=jnp.asarray(-1.0, jnp.float64),
        emittance_x=jnp.asarray(2e-9, jnp.float64),
        beta_y=jnp.asarray(3.0, jnp.float64),
        alpha_y=jnp.asarray(0.5, jnp.float64),
        emittance_y=jnp.asarray(2e-9, jnp.float64),
        energy=jnp.asarray(1.54e8, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        key=jax.random.PRNGKey(11),
        dtype=jnp.float64,
    )

    def loss(params, beam):
        k1, length, tilt = params
        quad = ct.Quadrupole(
            length=length,
            k1=k1,
            tilt=tilt,
            misalignment=jnp.asarray([1e-4, -2e-4], jnp.float64),
            tracking_method="drift_kick_drift",
        )
        out = quad.track(beam)
        return out.sigma_x + out.sigma_px + out.mu_tau

    params = (
        jnp.asarray(8.0, jnp.float64),
        jnp.asarray(0.3, jnp.float64),
        jnp.asarray(0.05, jnp.float64),
    )
    value, grads = jax.value_and_grad(loss)(params, incoming)

    k1_t = to_torch(8.0).requires_grad_(True)
    length_t = to_torch(0.3).requires_grad_(True)
    tilt_t = to_torch(0.05).requires_grad_(True)
    ref_quad = ref.Quadrupole(
        length=length_t,
        k1=k1_t,
        tilt=tilt_t,
        misalignment=to_torch(np.asarray([1e-4, -2e-4])),
        tracking_method="drift_kick_drift",
        dtype=torch.float64,
    )
    ref_out = ref_quad.track(ref_particle_beam(incoming))
    ref_loss = ref_out.sigma_x + ref_out.sigma_px + ref_out.mu_tau
    ref_loss.backward()

    np.testing.assert_allclose(float(value), ref_loss.item(), rtol=1e-12)
    np.testing.assert_allclose(float(grads[0]), k1_t.grad.item(), rtol=1e-9)
    np.testing.assert_allclose(float(grads[1]), length_t.grad.item(), rtol=1e-9)
    np.testing.assert_allclose(float(grads[2]), tilt_t.grad.item(), rtol=1e-9)


def test_dkd_quadrupole_hessian_finite_and_matches_fd():
    """Second-order AD through the drift-kick-drift quadrupole (chromatic
    path: custom_jvp quartet + Taylor polynomial) is finite and matches a
    finite difference of the gradient — the damped-Newton tuning workflow
    (docs/tuning) differentiates twice."""
    import jax

    beam = ct.ParticleBeam.from_twiss(
        num_particles=1_000,
        beta_x=jnp.asarray(5.0, jnp.float64),
        emittance_x=jnp.asarray(2e-9, jnp.float64),
        beta_y=jnp.asarray(3.0, jnp.float64),
        emittance_y=jnp.asarray(2e-9, jnp.float64),
        energy=jnp.asarray(1.54e8, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        key=jax.random.PRNGKey(5),
        dtype=jnp.float64,
    )

    def loss(k1):
        quad = ct.Quadrupole(
            length=jnp.asarray(0.3, jnp.float64),
            k1=k1,
            tracking_method="drift_kick_drift",
        )
        return quad.track(beam).sigma_x

    k1 = jnp.asarray(8.0, jnp.float64)
    hess = jax.hessian(loss)(k1)
    assert np.isfinite(float(hess))
    eps = 1e-4
    fd = (jax.grad(loss)(k1 + eps) - jax.grad(loss)(k1 - eps)) / (2 * eps)
    np.testing.assert_allclose(float(hess), float(fd), rtol=1e-6)

    # And at the k1 = 0 singular point of the quartet's guarded derivative.
    hess0 = jax.hessian(loss)(jnp.asarray(0.0, jnp.float64))
    assert np.isfinite(float(hess0))
