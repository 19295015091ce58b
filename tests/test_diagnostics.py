"""Diagnostics: screen image parity, CIC deposition parity, BPM readings,
jit-safe functional readout collection, Superimposed."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref, ref_particle_beam, to_numpy, to_torch, torch

import cheetah_tpu as ct
from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_charge_deposition


def make_beam(key, n=2000):
    return ct.ParticleBeam.from_parameters(
        num_particles=n,
        mu_x=jnp.array(1e-4, jnp.float64),
        sigma_x=jnp.array(3e-4, jnp.float64),
        sigma_y=jnp.array(2e-4, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
        key=key,
    )


@pytest.mark.parametrize("ndim", [1, 2, 3])
def test_cloud_in_cell_parity(ndim, key):
    """CIC deposition matches the reference's scatter_add implementation."""
    from cheetah.utils import cloud_in_cell_charge_deposition as ref_cic

    positions = jax.random.normal(key, (1000, ndim), dtype=jnp.float64)
    charges = jax.random.uniform(jax.random.PRNGKey(7), (1000,), dtype=jnp.float64)
    extent = jnp.stack(
        [jnp.full((ndim,), -2.5, jnp.float64), jnp.full((ndim,), 2.5, jnp.float64)],
        axis=-1,
    )
    bins = [8, 10, 12][:ndim]

    grid = cloud_in_cell_charge_deposition(positions, bins, extent, charges)
    ref_grid = ref_cic(
        to_torch(positions), bins, to_torch(extent), to_torch(charges)
    )
    np.testing.assert_allclose(grid, to_numpy(ref_grid), rtol=1e-9, atol=1e-14)
    # Total deposited charge equals the in-extent charge.
    assert grid.shape == tuple(bins)


def test_cloud_in_cell_vectorized(key):
    positions = jax.random.normal(key, (3, 2, 500, 2), dtype=jnp.float64)
    grid = cloud_in_cell_charge_deposition(positions, (16, 16))
    assert grid.shape == (3, 2, 16, 16)


def test_cloud_in_cell_differentiable(key):
    positions = jax.random.normal(key, (200, 2), dtype=jnp.float64)
    extent = jnp.array([[-3.0, 3.0], [-3.0, 3.0]], jnp.float64)

    def total_center_mass(positions):
        grid = cloud_in_cell_charge_deposition(positions, (8, 8), extent)
        return jnp.sum(grid * jnp.arange(8)[None, :])

    grad = jax.grad(total_center_mass)(positions)
    assert np.all(np.isfinite(grad))
    assert np.any(np.abs(np.asarray(grad)) > 0)


@pytest.mark.parametrize("method", ["histogram", "kde", "cloud-in-cell"])
def test_screen_reading_parity(method, key):
    beam = make_beam(key)
    spec = dict(
        resolution=(64, 48),
        pixel_size=[4e-5, 3e-5],
        method=method,
        is_active=True,
        misalignment=[1e-5, -2e-5],
    )
    screen = ct.Screen(
        resolution=spec["resolution"],
        pixel_size=jnp.asarray(spec["pixel_size"], jnp.float64),
        method=method,
        is_active=True,
        misalignment=jnp.asarray(spec["misalignment"], jnp.float64),
    )
    ref_screen = ref.Screen(
        resolution=spec["resolution"],
        pixel_size=torch.tensor(spec["pixel_size"], dtype=torch.float64),
        method=method,
        is_active=True,
        misalignment=torch.tensor(spec["misalignment"], dtype=torch.float64),
    )

    screen.track(beam)
    ref_screen.track(ref_particle_beam(beam))

    np.testing.assert_allclose(
        screen.reading,
        to_numpy(ref_screen.reading),
        rtol=1e-6,
        atol=1e-12,
        err_msg=method,
    )
    assert screen.reading.shape == (48, 64)


def test_screen_parameter_beam_reading(key):
    beam = ct.ParameterBeam.from_parameters(
        sigma_x=jnp.array(3e-4, jnp.float64),
        sigma_y=jnp.array(2e-4, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
    )
    screen = ct.Screen(
        resolution=(32, 24),
        pixel_size=jnp.asarray([1e-4, 1e-4], jnp.float64),
        is_active=True,
    )
    ref_screen = ref.Screen(
        resolution=(32, 24),
        pixel_size=torch.tensor([1e-4, 1e-4], dtype=torch.float64),
        is_active=True,
    )
    from reference_oracle import ref_parameter_beam

    screen.track(beam)
    ref_screen.track(ref_parameter_beam(beam))
    np.testing.assert_allclose(
        screen.reading, to_numpy(ref_screen.reading), rtol=1e-8, atol=1e-10
    )


def test_blocking_screen(key):
    beam = make_beam(key)
    screen = ct.Screen(is_active=True, is_blocking=True)
    out = screen.track(beam)
    np.testing.assert_allclose(out.survival_probabilities, 0.0)


def test_bpm_reading(key):
    beam = make_beam(key)
    bpm = ct.BPM(is_active=True, misalignment=jnp.asarray([1e-5, 2e-5], jnp.float64))
    bpm.track(beam)
    np.testing.assert_allclose(bpm.reading[0], beam.mu_x - 1e-5, rtol=1e-9)
    np.testing.assert_allclose(bpm.reading[1], beam.mu_y - 2e-5, rtol=1e-9)


def test_track_with_readings_under_jit(key):
    """Functional readout collection compiles and differentiates."""
    beam = make_beam(key, n=1000)
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="d1"),
            ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(3.0, jnp.float64), name="q1"),
            ct.BPM(is_active=True, name="bpm1"),
            ct.Drift(jnp.array(0.5, jnp.float64), name="d2"),
            ct.Screen(
                resolution=(32, 32),
                pixel_size=jnp.asarray([2e-5, 2e-5], jnp.float64),
                method="cloud-in-cell",
                is_active=True,
                name="screen1",
            ),
        ],
        name="diag",
    )

    @jax.jit
    def readout(segment, beam):
        _, readings = segment.track_with_readings(beam)
        return readings

    readings = readout(segment, beam)
    assert set(readings.keys()) == {"bpm1", "screen1"}
    assert readings["screen1"].shape == (32, 32)
    assert np.all(np.isfinite(readings["bpm1"]))

    # Gradient of the screen centroid w.r.t. quad strength (BASELINE config 2).
    def centroid(k1, segment, beam):
        segment.q1.k1 = k1
        _, readings = segment.track_with_readings(beam)
        image = readings["screen1"]
        xs = jnp.arange(image.shape[-1], dtype=image.dtype)
        return jnp.sum(image * xs) / jnp.sum(image)

    grad = jax.jit(jax.grad(centroid))(jnp.array(3.0, jnp.float64), segment, beam)
    assert np.isfinite(grad) and abs(float(grad)) > 0


def test_aperture_survival(key):
    beam = make_beam(key)
    aperture = ct.Aperture(
        x_max=jnp.array(2e-4, jnp.float64),
        y_max=jnp.array(2e-4, jnp.float64),
        shape="elliptical",
    )
    out = aperture.track(beam)
    inside = (
        np.asarray(beam.x) ** 2 / 4e-8 + np.asarray(beam.y) ** 2 / 4e-8
    ) <= 1.0
    np.testing.assert_allclose(out.survival_probabilities, inside.astype(float))
    # Surviving charge magnitude shrinks (charges are negative for electrons).
    assert abs(float(out.total_charge)) < abs(float(beam.total_charge)) or np.all(
        inside
    )


def test_superimposed(key):
    """Superimposed matches reference: half base + zero-length element + half."""
    beam = make_beam(key)
    base = ct.Quadrupole(jnp.array(0.4, jnp.float64), k1=jnp.array(5.0, jnp.float64), name="base")
    marker = ct.Marker(name="mid")
    superimposed = ct.Superimposed(base, marker, name="sup")
    out = superimposed.track(beam)

    ref_base = ref.Quadrupole(torch.tensor(0.4), k1=torch.tensor(5.0), name="base")
    ref_sup = ref.Superimposed(ref_base, ref.Marker(name="mid"), name="sup")
    ref_out = ref_sup.track(ref_particle_beam(beam))

    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-9, atol=1e-15
    )
    np.testing.assert_allclose(superimposed.length, 0.4, rtol=1e-12)


@pytest.mark.parametrize("method", ["histogram", "kde", "cloud-in-cell"])
def test_screen_vectorized_all_methods(method, key):
    """A (3, 2)-batched beam produces a (3, 2, height, width) image in every
    method, and each batch entry equals the corresponding scalar run. The
    reference's histogram path raises on vector dims (``screen.py:291-339``);
    the batch-offset segment_sum formulation removes that restriction."""
    mu_x = jnp.asarray(
        [[-2e-4, -1e-4], [0.0, 1e-4], [2e-4, 3e-4]], jnp.float64
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1500,
        mu_x=mu_x,
        sigma_x=jnp.array(3e-4, jnp.float64),
        sigma_y=jnp.array(2e-4, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
        key=key,
    )
    screen = ct.Screen(
        resolution=(32, 24),
        pixel_size=jnp.asarray([8e-5, 6e-5], jnp.float64),
        method=method,
        is_active=True,
        misalignment=jnp.asarray([1e-5, -2e-5], jnp.float64),
    )

    image = screen.observe(beam)
    assert image.shape == (3, 2, 24, 32)

    for i in range(3):
        for j in range(2):
            single = ct.ParticleBeam(
                particles=beam.particles[i, j],
                energy=beam.energy,
                particle_charges=beam.particle_charges,
                survival_probabilities=beam.survival_probabilities,
                species=beam.species,
            )
            np.testing.assert_allclose(
                image[i, j],
                screen.observe(single),
                rtol=1e-9,
                atol=1e-15,
                err_msg=f"{method} [{i},{j}]",
            )


def test_track_with_readings_fuses_between_observers(key):
    """Readings equal the element-wise loop's, while the transport between
    observers is fused (one sub-segment track per stretch, not one matmul per
    element) — including through a nested sub-segment without observers and a
    second_order-tracked element."""
    beam = make_beam(key, n=1000)
    f64 = jnp.float64
    nested = ct.Segment(
        [
            ct.Drift(jnp.array(0.2, f64), name="nd1"),
            ct.Quadrupole(jnp.array(0.1, f64), k1=jnp.array(-2.0, f64), name="nq1"),
        ],
        name="nested",
    )
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, f64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, f64),
                k1=jnp.array(3.0, f64),
                tracking_method="second_order",
                name="q1",
            ),
            nested,
            ct.BPM(is_active=True, name="bpm1"),
            ct.Drift(jnp.array(0.5, f64), name="d2"),
            ct.Screen(
                resolution=(32, 32),
                pixel_size=jnp.asarray([2e-5, 2e-5], f64),
                method="cloud-in-cell",
                is_active=True,
                name="screen1",
            ),
        ],
        name="diag",
    )

    out, readings = segment.track_with_readings(beam)

    # Element-wise oracle (the pre-fusion semantics).
    ref_beam = beam
    ref_readings = {}
    for element in [*segment.elements[:2], *nested.elements, *segment.elements[3:]]:
        if hasattr(element, "observe") and getattr(element, "is_active", False):
            ref_readings[element.name] = element.observe(ref_beam)
        ref_beam = element.track(ref_beam)

    assert list(readings.keys()) == list(ref_readings.keys()) == ["bpm1", "screen1"]
    np.testing.assert_allclose(
        readings["bpm1"], ref_readings["bpm1"], rtol=1e-12, atol=1e-15
    )
    np.testing.assert_allclose(
        readings["screen1"], ref_readings["screen1"], rtol=1e-9, atol=1e-12
    )
    np.testing.assert_allclose(
        out.particles, ref_beam.particles, rtol=1e-12, atol=1e-16
    )
    np.testing.assert_allclose(out.s, ref_beam.s, rtol=1e-14)


def test_track_with_readings_observer_inside_nested_segment(key):
    """A nested segment CONTAINING an active observer is recursed into (its
    readings surface by element name), while observer-free nesting fuses."""
    beam = make_beam(key, n=500)
    f64 = jnp.float64
    inner = ct.Segment(
        [
            ct.Drift(jnp.array(0.3, f64), name="id1"),
            ct.BPM(is_active=True, name="inner_bpm"),
            ct.Drift(jnp.array(0.3, f64), name="id2"),
        ],
        name="inner",
    )
    segment = ct.Segment(
        [ct.Drift(jnp.array(0.5, f64), name="d1"), inner], name="outer"
    )
    out, readings = segment.track_with_readings(beam)
    assert set(readings.keys()) == {"inner_bpm"}

    ref_beam = beam
    for element in [segment.elements[0], *inner.elements]:
        if getattr(element, "is_active", False) and hasattr(element, "observe"):
            np.testing.assert_allclose(
                readings[element.name], element.observe(ref_beam), rtol=1e-12
            )
        ref_beam = element.track(ref_beam)
    np.testing.assert_allclose(out.particles, ref_beam.particles, rtol=1e-12)
