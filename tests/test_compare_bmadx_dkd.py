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
