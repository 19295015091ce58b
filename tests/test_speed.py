"""Speed guards (analogue of the reference's ``tests/test_speed.py:14-35``:
1e5 particles through the ARES EA subcell incl. screen readout in < 0.1 s on
CI CPU) and optimisation equivalence (``test_speed_optimizations.py``)."""

import os
import subprocess
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct
from cheetah_tpu.lattices import ares_ea_subcell


def make_beam(key, num_particles=100_000):
    return ct.ParticleBeam.from_twiss(
        num_particles=num_particles,
        beta_x=jnp.array(5.0, jnp.float64),
        emittance_x=jnp.array(2e-9, jnp.float64),
        beta_y=jnp.array(3.0, jnp.float64),
        emittance_y=jnp.array(2e-9, jnp.float64),
        energy=jnp.array(1.54e8, jnp.float64),
        total_charge=jnp.array(1e-10, jnp.float64),
        key=key,
    )


def test_track_100k_with_screen_under_100ms(key):
    """The reference's hard CI figure: tracking 1e5 particles through the ARES
    EA subcell including the active screen readout must take < 0.1 s
    (post-compile; compile time is amortised by jit caching)."""
    segment = ares_ea_subcell(dtype=jnp.float64, screen=True)
    beam = make_beam(key)

    @jax.jit
    def track_and_read(segment, beam):
        _, readings = segment.track_with_readings(beam)
        return readings["AREABSCR1"]

    # Compile.
    jax.block_until_ready(track_and_read(segment, beam))

    # Best of three to be robust against transient host contention.
    timings = []
    for _ in range(3):
        start = time.perf_counter()
        image = track_and_read(segment, beam)
        jax.block_until_ready(image)
        timings.append(time.perf_counter() - start)
    elapsed = min(timings)

    # Standalone this runs in 40-95 ms, satisfying the reference's 0.1 s CI
    # budget (enforced by the `standalone`-marked guard below); inside the
    # full suite, host memory pressure from hundreds of compiled programs can
    # inflate the wall clock, so this always-on guard allows headroom to stay
    # deterministic.
    assert elapsed < 0.5, f"Tracking took {elapsed:.3f} s (limit 0.5 s)"
    assert image.shape == (2040, 2448)


@pytest.mark.standalone
def test_track_100k_with_screen_reference_budget(key):
    """The reference's exact CI budget (< 0.1 s, ``tests/test_speed.py:14-35``)
    asserted strictly. Skipped inside the full suite (suite pressure corrupts
    wall-clock guards); run with ``pytest -m standalone``."""
    segment = ares_ea_subcell(dtype=jnp.float64, screen=True)
    beam = make_beam(key)

    @jax.jit
    def track_and_read(segment, beam):
        _, readings = segment.track_with_readings(beam)
        return readings["AREABSCR1"]

    jax.block_until_ready(track_and_read(segment, beam))

    timings = []
    for _ in range(5):
        start = time.perf_counter()
        jax.block_until_ready(track_and_read(segment, beam))
        timings.append(time.perf_counter() - start)
    elapsed = min(timings)

    assert elapsed < 0.1, f"Tracking took {elapsed:.3f} s (limit 0.1 s)"


def test_reference_budget_enforced_in_default_gate():
    """The strict < 0.1 s budget above IS part of the default gate: it runs
    here in a fresh subprocess (clean host, no suite memory pressure — the
    reason it is `standalone`-marked), so the reference's CI contract
    (``tests/test_speed.py:14-35``) is continuously enforced by a plain
    ``pytest tests/`` while the measurement stays isolated."""
    result = subprocess.run(
        [
            sys.executable,
            "-m",
            "pytest",
            "-m",
            "standalone",
            "-q",
            os.path.join(os.path.dirname(__file__), "test_speed.py"),
        ],
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert result.returncode == 0, (
        "strict speed budget failed in isolated run:\n"
        + result.stdout[-2000:]
        + result.stderr[-2000:]
    )
    assert "1 passed" in result.stdout


def test_merged_segment_is_equivalent_and_not_slower(key):
    """``transfer_maps_merged`` produces identical tracking results
    (ref ``tests/test_speed_optimizations.py``)."""
    segment = ares_ea_subcell(dtype=jnp.float64)
    beam = make_beam(key, num_particles=10_000)

    merged = segment.transfer_maps_merged(incoming_beam=beam)
    out = segment.track(beam)
    out_merged = merged.track(beam)
    np.testing.assert_allclose(
        out.particles, out_merged.particles, rtol=1e-9, atol=1e-14
    )
    # The merged segment collapses all skippable elements into one map.
    assert len(merged.elements) < len(segment.elements)


def test_optimization_passes_preserve_tracking(key):
    segment = ares_ea_subcell(dtype=jnp.float64)
    beam = make_beam(key, num_particles=5_000)
    expected = segment.track(beam)

    optimized = (
        segment.without_inactive_markers()
        .without_inactive_zero_length_elements()
        .inactive_elements_as_drifts(except_for=["AREAMQZM1", "AREAMQZM2", "AREAMQZM3"])
    )
    out = optimized.track(beam)
    np.testing.assert_allclose(
        out.particles, expected.particles, rtol=1e-9, atol=1e-14
    )


def test_no_markers_left_after_removal():
    """Every Marker is gone unless excepted (ref
    ``test_speed_optimizations.py:107-125``)."""
    segment = ct.Segment(
        [
            ct.Marker(name="m0"),
            ct.Drift(jnp.asarray(0.5, jnp.float64)),
            ct.Marker(name="m1"),
            ct.Drift(jnp.asarray(0.5, jnp.float64)),
            ct.Marker(name="m2"),
        ]
    )
    cleaned = segment.without_inactive_markers()
    assert not any(isinstance(e, ct.Marker) for e in cleaned.elements)

    kept = segment.without_inactive_markers(except_for=["m1"])
    assert [e.name for e in kept.elements if isinstance(e, ct.Marker)] == ["m1"]


def test_inactive_magnet_is_replaced_by_drift():
    """k1=0 quads become drifts; active ones and excepted names stay (ref
    ``test_speed_optimizations.py:128-199``)."""
    segment = ct.Segment(
        [
            ct.Quadrupole(jnp.asarray(0.3, jnp.float64), k1=jnp.asarray(0.0, jnp.float64), name="q_off"),
            ct.Quadrupole(jnp.asarray(0.3, jnp.float64), k1=jnp.asarray(4.0, jnp.float64), name="q_on"),
            ct.Quadrupole(jnp.asarray(0.3, jnp.float64), k1=jnp.asarray(0.0, jnp.float64), name="q_keep"),
        ]
    )
    as_drifts = segment.inactive_elements_as_drifts(except_for=["q_keep"])

    assert isinstance(as_drifts.elements[0], ct.Drift)
    assert as_drifts.elements[0].name == "q_off"
    assert isinstance(as_drifts.elements[1], ct.Quadrupole)  # active stays
    assert isinstance(as_drifts.elements[2], ct.Quadrupole)  # excepted stays
    np.testing.assert_allclose(float(as_drifts.length), float(segment.length))


def test_inactive_drift_replacement_preserves_dtype():
    for dtype in (jnp.float32, jnp.float64):
        segment = ct.Segment(
            [ct.Quadrupole(jnp.asarray(0.3, dtype), k1=jnp.asarray(0.0, dtype))]
        )
        drifted = segment.inactive_elements_as_drifts()
        assert drifted.elements[0].length.dtype == dtype


def test_without_zero_length_elements():
    """Inactive zero-length elements vanish; active diagnostics stay (ref
    ``test_speed_optimizations.py:238-262``)."""
    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, jnp.float64)),
            ct.BPM(name="bpm_off", is_active=False),
            ct.BPM(name="bpm_on", is_active=True),
            ct.Marker(name="m"),
            ct.Drift(jnp.asarray(0.5, jnp.float64)),
        ]
    )
    cleaned = segment.without_inactive_zero_length_elements()

    names = [e.name for e in cleaned.elements]
    assert "bpm_off" not in names
    assert "m" not in names
    assert "bpm_on" in names
    np.testing.assert_allclose(float(cleaned.length), float(segment.length))
