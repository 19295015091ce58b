"""Ocelot converter vs the live torch reference (analogue of
``tests/test_compare_ocelot.py``).

``ocelot`` is not installable here, but both converters run against the same
shim registered in ``sys.modules`` (see ``test_full_ares._install_ocelot_shim``):
ours dispatches on class *names*, the reference's ``isinstance`` checks
resolve against the shim classes — so every dispatch branch (incl. the
Monitor BSC/BPM/Marker split and the UnknownElementWarning Drift fallback) is
cross-checked element-by-element against the reference's own ``from_ocelot``,
and tracking through the converted elements must agree to float64 precision
(the reference's installed-ocelot test uses 1e-6, ref
``tests/test_compare_ocelot.py:13-100``).
"""

import warnings

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref, to_numpy
from test_full_ares import _install_ocelot_shim

import cheetah_tpu as ct
from cheetah_tpu.utils.warnings import DefaultParameterWarning, UnknownElementWarning

F64 = jnp.float64


def _make_cases():
    ocelot = _install_ocelot_shim()

    class Undefined(ocelot.Drift.__mro__[1]):  # bare OcelotElement subclass
        pass

    return {
        "drift": ocelot.Drift(eid="d1", l=1.1),
        "quadrupole": ocelot.Quadrupole(eid="q1", l=0.31, k1=4.2),
        "sextupole": ocelot.Sextupole(eid="s1", l=0.21, k2=60.0),
        "solenoid": ocelot.Solenoid(eid="so1", l=0.4, k=2.5),
        "hcor": ocelot.Hcor(eid="hc1", l=0.05, angle=1.3e-4),
        "vcor": ocelot.Vcor(eid="vc1", l=0.05, angle=-2.1e-4),
        "sbend": ocelot.SBend(
            eid="b1", l=0.5, angle=0.08, e1=0.01, e2=0.015, tilt=0.05,
            fint=0.1, fintx=0.2, gap=0.02,
        ),
        "rbend": ocelot.RBend(
            eid="rb1", l=0.5, angle=0.06, e1=0.04, e2=0.05, tilt=0.0,
            fint=0.0, fintx=0.0, gap=0.0,
        ),
        "bend": ocelot.Bend(
            eid="be1", l=0.45, angle=-0.03, e1=0.0, e2=0.0, tilt=0.0,
            fint=0.0, fintx=0.0, gap=0.0,
        ),
        "cavity": ocelot.Cavity(eid="c1", l=1.0377, v=0.01815975, freq=1.3e9, phi=0.0),
        "twcavity": ocelot.TWCavity(eid="tw1", l=1.0, v=0.005, freq=3e9, phi=10.0),
        "tdcavity": ocelot.TDCavity(eid="td1", l=0.7, v=0.002, freq=2.9e9, phi=5.0),
        "monitor_bsc": ocelot.Monitor(eid="AREABSCR1", l=0.0),
        "monitor_bpm": ocelot.Monitor(eid="AREABPMG1", l=0.0),
        "monitor_other": ocelot.Monitor(eid="monitor1", l=0.0),
        "marker": ocelot.Marker(eid="m1"),
        "undulator": ocelot.Undulator(eid="u1", l=2.0, lperiod=0.05, Kx=1.2, Ky=0.0),
        "aperture_rect": ocelot.Aperture(
            eid="ap1", xmax=2e-4, ymax=3e-4, type="rect"
        ),
        "aperture_elip": ocelot.Aperture(
            eid="ap2", xmax=2e-4, ymax=3e-4, type="elip"
        ),
        "unknown": Undefined(eid="weird1", l=0.25),
    }


CASES = _make_cases()


@pytest.fixture(scope="module")
def beams():
    import torch

    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.asarray(1.7e-4, F64),
        sigma_y=jnp.asarray(1.7e-4, F64),
        sigma_px=jnp.asarray(2e-5, F64),
        sigma_py=jnp.asarray(2e-5, F64),
        sigma_tau=jnp.asarray(1e-5, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        energy=jnp.asarray(1.54e8, F64),
        total_charge=jnp.asarray(1e-10, F64),
        key=jax.random.PRNGKey(7),
        dtype=F64,
    )
    ref_beam = ref.ParticleBeam(
        particles=torch.from_numpy(np.asarray(beam.particles)).to(torch.float64),
        energy=torch.tensor(float(beam.energy), dtype=torch.float64),
        particle_charges=torch.from_numpy(
            np.asarray(beam.particle_charges)
        ).to(torch.float64),
    )
    return beam, ref_beam


@pytest.mark.parametrize("case_name", CASES.keys())
def test_converted_element_matches_reference(case_name, beams):
    """Class, name and full f64 tracking parity with the reference's own
    conversion of the identical (shim) Ocelot element."""
    import torch

    element = CASES[case_name]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        ours = ct.converters.ocelot.convert_element(element, dtype=F64)
        theirs = ref.converters.ocelot.convert_element(
            element, dtype=torch.float64
        )

    if case_name == "rbend":
        # Real ocelot's RBend subclasses Bend, so the reference's
        # isinstance(element, ocelot.Bend) branch wins and returns a plain
        # Dipole carrying the (already angle/2-shifted) ocelot edge angles;
        # we return an RBend with rbend_e1 = e1 - angle/2 — the same
        # effective edges in the rectangular convention. Physically
        # identical (the tracking comparison below is the decisive check).
        assert type(ours).__name__ == "RBend"
        assert type(theirs).__name__ == "Dipole"
    else:
        assert type(ours).__name__ == type(theirs).__name__, case_name
    assert ours.name == theirs.name

    beam, ref_beam = beams
    out = ours.track(beam)
    ref_out = theirs.track(ref_beam)
    np.testing.assert_allclose(
        np.asarray(out.particles),
        to_numpy(ref_out.particles),
        rtol=1e-9,
        atol=1e-14,
        err_msg=case_name,
    )
    np.testing.assert_allclose(
        np.asarray(out.survival_probabilities),
        to_numpy(ref_out.survival_probabilities),
        rtol=1e-9,
        atol=1e-12,
        err_msg=case_name,
    )
    np.testing.assert_allclose(
        float(jnp.mean(out.energy)), float(ref_out.energy.mean()), rtol=1e-12
    )


def test_monitor_dispatch_and_screen_defaults():
    """Monitor -> Screen('BSC') with the reference's default screen
    properties / BPM('BPM') / Marker(otherwise)."""
    with pytest.warns(DefaultParameterWarning):
        screen = ct.converters.ocelot.convert_element(CASES["monitor_bsc"])
    assert isinstance(screen, ct.Screen)
    assert screen.resolution == (2448, 2040)
    np.testing.assert_allclose(
        np.asarray(screen.pixel_size), [3.5488e-6, 2.5003e-6]
    )

    bpm = ct.converters.ocelot.convert_element(CASES["monitor_bpm"])
    assert isinstance(bpm, ct.BPM)
    other = ct.converters.ocelot.convert_element(CASES["monitor_other"])
    assert isinstance(other, ct.Marker)


def test_unknown_element_warns_and_becomes_drift():
    with pytest.warns(UnknownElementWarning, match="weird1"):
        converted = ct.converters.ocelot.convert_element(CASES["unknown"])
    assert isinstance(converted, ct.Drift)
    np.testing.assert_allclose(float(converted.length), 0.25)


def test_tdcavity_falls_back_to_standing_wave():
    """The reference converts TDCavity to a default (standing-wave) Cavity
    (ref ``converters/ocelot.py:144-153``)."""
    converted = ct.converters.ocelot.convert_element(CASES["tdcavity"])
    assert isinstance(converted, ct.Cavity)
    assert converted.cavity_type == "standing_wave"
    np.testing.assert_allclose(float(converted.voltage), 0.002 * 1e9)


def test_subcell_of_ocelot_matches_reference():
    ocelot = _install_ocelot_shim()
    cell = [
        ocelot.Drift(eid="d1", l=0.5),
        ocelot.Marker(eid="start"),
        ocelot.Quadrupole(eid="q1", l=0.3, k1=2.0),
        ocelot.Drift(eid="d2", l=0.4),
        ocelot.Marker(eid="stop"),
        ocelot.Drift(eid="d3", l=0.6),
    ]
    ours = ct.converters.ocelot.subcell_of_ocelot(cell, "start", "stop")
    theirs = ref.converters.ocelot.subcell_of_ocelot(cell, "start", "stop")
    assert [e.id for e in ours] == [e.id for e in theirs]
    assert [e.id for e in ours] == ["start", "q1", "d2", "stop"]


def test_full_cell_segment_matches_reference(beams):
    """A mixed cell through Segment.from_ocelot tracks identically to the
    reference's from_ocelot (fused vs the reference's merged runs)."""
    import torch

    cell = [
        CASES["drift"], CASES["quadrupole"], CASES["hcor"], CASES["sbend"],
        CASES["monitor_bpm"], CASES["sextupole"], CASES["vcor"],
        CASES["aperture_rect"], CASES["drift"],
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_ocelot(cell, name="cmp", dtype=F64)
        ref_segment = ref.Segment.from_ocelot(cell, name="cmp").to(torch.float64)

    beam, ref_beam = beams
    out = segment.track(beam)
    ref_out = ref_segment.track(ref_beam)
    np.testing.assert_allclose(
        np.asarray(out.particles), to_numpy(ref_out.particles),
        rtol=1e-9, atol=1e-13,
    )
    np.testing.assert_allclose(
        np.asarray(out.survival_probabilities),
        to_numpy(ref_out.survival_probabilities),
        rtol=1e-9, atol=1e-12,
    )
