"""Plot smoke tests: figures render without error (analogue of the
reference's ``tests/test_plotting.py``)."""

import matplotlib

matplotlib.use("Agg")

import jax
import jax.numpy as jnp
import matplotlib.pyplot as plt
import pytest

import cheetah_tpu as ct


@pytest.fixture
def segment():
    return ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64), k1=jnp.array(4.2, jnp.float64), name="q1"
            ),
            ct.HorizontalCorrector(
                jnp.array(0.1, jnp.float64), angle=jnp.array(1e-4, jnp.float64),
                name="hc",
            ),
            ct.Dipole(
                jnp.array(0.3, jnp.float64), angle=jnp.array(0.1, jnp.float64),
                name="b1",
            ),
            ct.Sextupole(
                jnp.array(0.2, jnp.float64), k2=jnp.array(30.0, jnp.float64),
                name="s1", tracking_method="linear",
            ),
            ct.Cavity(jnp.array(0.5, jnp.float64), name="c1"),
            ct.BPM(name="bpm1"),
            ct.Screen(name="scr1"),
            ct.Marker(name="m1"),
            ct.Drift(jnp.array(0.5, jnp.float64), name="d2"),
        ],
        name="plotting_test",
    )


@pytest.fixture
def beam(key):
    return ct.ParticleBeam.from_twiss(
        num_particles=2_000,
        beta_x=jnp.array(5.0, jnp.float64),
        emittance_x=jnp.array(2e-9, jnp.float64),
        beta_y=jnp.array(3.0, jnp.float64),
        emittance_y=jnp.array(2e-9, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
        key=key,
    )


def test_segment_plot(segment):
    segment.plot()
    plt.close("all")


def test_plot_mean_and_std(segment, beam):
    segment.plot_mean_and_std(beam)
    plt.close("all")


def test_plot_overview(segment, beam):
    segment.plot_overview(beam)
    plt.close("all")


def test_plot_twiss(segment, beam):
    segment.plot_twiss(beam)
    segment.plot_twiss_over_lattice(beam)
    plt.close("all")


def test_plot_beam_attrs(segment, beam):
    segment.plot_beam_attrs(beam, ("sigma_x", "sigma_y"))
    segment.plot_beam_attrs_over_lattice(beam, "emittance_x")
    plt.close("all")


def test_vectorized_segment_plot(segment, beam):
    segment.q1.k1 = jnp.linspace(-5, 5, 3, dtype=jnp.float64)
    segment.plot_mean_and_std(beam, vector_idx=(1,))
    plt.close("all")


def test_beam_distribution_plots(beam):
    beam.plot_1d_distribution("x")
    beam.plot_2d_distribution("x", "px")
    beam.plot_2d_distribution("x", "y", style="contour")
    beam.plot_point_cloud()
    plt.close("all")


def test_beam_corner_plot(beam):
    beam.plot_distribution(dimensions=("x", "px", "y"))
    beam.plot_distribution(dimensions=("x", "y"), bin_ranges="unit_same")
    plt.close("all")
