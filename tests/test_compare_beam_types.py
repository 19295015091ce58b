"""ParameterBeam and ParticleBeam tracked through the same lattice must agree
in their moments (analogue of ``tests/test_compare_beam_type.py``)."""

import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

TWISS = dict(
    beta_x=jnp.array(5.0, jnp.float64),
    alpha_x=jnp.array(-0.7, jnp.float64),
    emittance_x=jnp.array(2e-9, jnp.float64),
    beta_y=jnp.array(3.0, jnp.float64),
    alpha_y=jnp.array(0.4, jnp.float64),
    emittance_y=jnp.array(3e-9, jnp.float64),
    sigma_tau=jnp.array(1e-5, jnp.float64),
    sigma_p=jnp.array(1e-4, jnp.float64),
    energy=jnp.array(1.5e8, jnp.float64),
)


def make_beams(key):
    particle = ct.ParticleBeam.from_twiss(num_particles=200_000, key=key, **TWISS)
    parameter = ct.ParameterBeam.from_twiss(**TWISS)
    return particle, parameter


LATTICES = {
    "fodo": lambda: ct.Segment(
        [
            ct.Drift(jnp.array(0.6, jnp.float64)),
            ct.Quadrupole(jnp.array(0.2, jnp.float64), k1=jnp.array(6.0, jnp.float64)),
            ct.Drift(jnp.array(1.0, jnp.float64)),
            ct.Quadrupole(jnp.array(0.2, jnp.float64), k1=jnp.array(-6.0, jnp.float64)),
            ct.Drift(jnp.array(0.6, jnp.float64)),
        ]
    ),
    "dogleg": lambda: ct.Segment(
        [
            ct.Dipole(jnp.array(0.4, jnp.float64), angle=jnp.array(0.1, jnp.float64)),
            ct.Drift(jnp.array(1.0, jnp.float64)),
            ct.Dipole(jnp.array(0.4, jnp.float64), angle=jnp.array(-0.1, jnp.float64)),
        ]
    ),
    "solenoid_line": lambda: ct.Segment(
        [
            ct.Drift(jnp.array(0.3, jnp.float64)),
            ct.Solenoid(jnp.array(0.4, jnp.float64), k=jnp.array(2.0, jnp.float64)),
            ct.Drift(jnp.array(0.3, jnp.float64)),
        ]
    ),
    "cavity_line": lambda: ct.Segment(
        [
            ct.Drift(jnp.array(0.2, jnp.float64)),
            ct.Cavity(
                jnp.array(1.0, jnp.float64),
                voltage=jnp.array(1e7, jnp.float64),
                phase=jnp.array(20.0, jnp.float64),
                frequency=jnp.array(1.3e9, jnp.float64),
            ),
            ct.Drift(jnp.array(0.2, jnp.float64)),
        ]
    ),
}


@pytest.mark.parametrize("lattice_name", LATTICES.keys())
def test_beam_types_agree(lattice_name, key):
    particle, parameter = make_beams(key)
    segment = LATTICES[lattice_name]()

    out_particle = segment.track(particle)
    out_parameter = segment.track(parameter)

    for attr in ["mu_x", "mu_y", "mu_px", "mu_py"]:
        np.testing.assert_allclose(
            getattr(out_particle, attr),
            getattr(out_parameter, attr),
            atol=5e-7,
            err_msg=attr,
        )
    sigma_attrs = ["sigma_x", "sigma_y", "sigma_px", "sigma_py", "sigma_p"]
    if lattice_name == "cavity_line":
        # The cavity's ParameterBeam model freezes cov[5, 5] while the
        # ParticleBeam model recomputes per-particle energy deviations
        # (ref ``cavity.py:133`` vs ``cavity.py:134-151``), so sigma_p
        # legitimately disagrees between the beam types.
        sigma_attrs.remove("sigma_p")
    for attr in sigma_attrs:
        np.testing.assert_allclose(
            getattr(out_particle, attr),
            getattr(out_parameter, attr),
            rtol=2e-2,
            err_msg=attr,
        )
    np.testing.assert_allclose(out_particle.energy, out_parameter.energy, rtol=1e-12)
    np.testing.assert_allclose(out_particle.s, out_parameter.s, rtol=1e-12)


def test_conversion_round_trip(key):
    particle, _ = make_beams(key)
    collapsed = particle.as_parameter_beam()
    resampled = collapsed.as_particle_beam(100_000, key=key)
    np.testing.assert_allclose(resampled.sigma_x, particle.sigma_x, rtol=1e-6)
    np.testing.assert_allclose(resampled.cov_xpx, particle.cov_xpx, rtol=1e-4)
