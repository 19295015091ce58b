"""Converters: LatticeJSON round trip, Elegant/Bmad lattice files (using the
reference repo's fixture files), ASTRA beams, Ocelot duck typing, NX Tables,
and the expression evaluators."""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref, ref_particle_beam, to_numpy

import pathlib

import cheetah_tpu as ct
from cheetah_tpu.converters.expressions import evaluate_infix, evaluate_rpn

RESOURCES = str(pathlib.Path(__file__).parent / "resources")


# ----------------------------------------------------------------------
# Expression evaluators (analogues of tests/test_infix.py, test_rpn.py)
# ----------------------------------------------------------------------


@pytest.mark.parametrize(
    "expression,expected",
    [
        ("1 + 2 * 3", 7.0),
        ("(1 + 2) * 3", 9.0),
        ("2 ^ 3 ^ 1", 8.0),
        ("-5 + 3", -2.0),
        ("sqrt(16)", 4.0),
        ("2 * sin(0)", 0.0),
        ("0.5 * (0.3 + 0.7)", 0.5),
        ("0.6  -0.1", 0.5),
        ("1 / 4", 0.25),
    ],
)
def test_infix(expression, expected):
    np.testing.assert_allclose(evaluate_infix(expression), expected, rtol=1e-12)


def test_infix_context_and_lookup():
    context = {"a": 2.0, "b": {"l": 0.1}}
    np.testing.assert_allclose(evaluate_infix("a * 3", context), 6.0)
    np.testing.assert_allclose(evaluate_infix("-b[l]", context), -0.1)


def test_infix_invalid():
    with pytest.raises(SyntaxError):
        evaluate_infix("1 + unknown_thing")
    with pytest.raises(SyntaxError):
        evaluate_infix("(1 + 2")


@pytest.mark.parametrize(
    "expression,expected",
    [
        ("1 2 +", 3.0),
        ("2 3 4 + *", 14.0),
        ("9 sqrt", 3.0),
        ("1 2 + # some comment", 3.0),
    ],
)
def test_rpn(expression, expected):
    np.testing.assert_allclose(evaluate_rpn(expression), expected, rtol=1e-12)


def test_rpn_invalid():
    with pytest.raises(SyntaxError):
        evaluate_rpn("1 +")
    with pytest.raises(SyntaxError):
        evaluate_rpn("1 2")


# ----------------------------------------------------------------------
# LatticeJSON
# ----------------------------------------------------------------------


def test_lattice_json_round_trip(tmp_path):
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64),
                k1=jnp.array(4.2, jnp.float64),
                misalignment=jnp.array([1e-4, -2e-4], jnp.float64),
                name="q1",
            ),
            ct.Dipole(
                jnp.array(0.5, jnp.float64),
                angle=jnp.array(0.1, jnp.float64),
                name="b1",
            ),
            ct.Cavity(
                jnp.array(1.0, jnp.float64),
                voltage=jnp.array(5e6, jnp.float64),
                phase=jnp.array(30.0, jnp.float64),
                frequency=jnp.array(1.3e9, jnp.float64),
                name="c1",
            ),
            ct.Screen(name="scr1", resolution=(100, 80)),
            ct.BPM(name="bpm1"),
            ct.Marker(name="m1"),
            ct.Aperture(
                x_max=jnp.array(1e-3, jnp.float64),
                y_max=jnp.array(1e-3, jnp.float64),
                name="ap1",
            ),
        ],
        name="round_trip_test",
    )
    path = tmp_path / "lattice.json"
    segment.to_lattice_json(str(path))
    restored = ct.Segment.from_lattice_json(str(path), dtype=jnp.float64)

    assert restored.name == segment.name
    assert restored.element_names == segment.element_names
    assert restored == segment


def test_lattice_json_nested_segments(tmp_path):
    inner = ct.Segment(
        [ct.Drift(jnp.array(0.5, jnp.float64), name="d_inner")], name="inner"
    )
    outer = ct.Segment(
        [inner, ct.Drift(jnp.array(1.0, jnp.float64), name="d_outer")], name="outer"
    )
    path = tmp_path / "nested.json"
    outer.to_lattice_json(str(path))
    restored = ct.Segment.from_lattice_json(str(path), dtype=jnp.float64)
    assert restored.element_names == ["inner", "d_outer"]
    assert isinstance(restored.elements[0], ct.Segment)


# ----------------------------------------------------------------------
# Elegant
# ----------------------------------------------------------------------


def test_elegant_fodo_matches_reference(key):
    """Importing fodo.lte gives the same lattice as the reference importer
    (verified by tracking the same beam through both)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_elegant(
            f"{RESOURCES}/fodo.lte", "fodo", sanitize_names=True, dtype=jnp.float64
        )
        import torch

        ref_segment = ref.Segment.from_elegant(
            f"{RESOURCES}/fodo.lte", "fodo", sanitize_names=True,
            dtype=torch.float64,
        )

    beam = ct.ParticleBeam.from_parameters(
        num_particles=200, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    out = segment.track(beam)
    ref_out = ref_segment.track(ref_particle_beam(beam))
    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-9, atol=1e-14
    )


def test_elegant_cavity_lattice(key):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_elegant(
            f"{RESOURCES}/cavity.lte", "cavity", sanitize_names=True,
            dtype=jnp.float64,
        )
    assert isinstance(segment.elements[0], ct.CustomTransferMap)
    assert isinstance(segment.elements[1], ct.Cavity)
    np.testing.assert_allclose(segment.elements[1].voltage, 16175000.0)
    np.testing.assert_allclose(segment.elements[1].phase, 0.0)  # 90 - 90

    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    out = segment.track(beam)
    assert np.all(np.isfinite(np.asarray(out.particles)))
    assert float(out.energy) > float(beam.energy)


# ----------------------------------------------------------------------
# Bmad
# ----------------------------------------------------------------------


def test_bmad_tutorial_lattice_matches_reference(key):
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_bmad(
            f"{RESOURCES}/bmad_tutorial_lattice.bmad", dtype=jnp.float64
        )
        import torch

        ref_segment = ref.Segment.from_bmad(
            f"{RESOURCES}/bmad_tutorial_lattice.bmad", dtype=torch.float64
        )

    assert segment.name == "lat"
    assert [type(e).__name__ for e in segment.elements] == [
        type(e).__name__ for e in ref_segment.elements
    ]

    beam = ct.ParticleBeam.from_parameters(
        num_particles=200, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    out = segment.track(beam)
    ref_out = ref_segment.track(ref_particle_beam(beam))
    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-9, atol=1e-14
    )


# ----------------------------------------------------------------------
# ASTRA
# ----------------------------------------------------------------------


def _write_synthetic_astra_file(path, num_particles=50):
    rng = np.random.default_rng(42)
    data = np.zeros((num_particles, 10))
    data[:, 0] = rng.normal(0, 1e-4, num_particles)  # x
    data[:, 1] = rng.normal(0, 1e-4, num_particles)  # y
    data[:, 2] = rng.normal(0, 1e-5, num_particles)  # z (relative)
    data[0, 2] = 1.0  # reference particle: absolute z
    data[:, 3] = rng.normal(0, 500.0, num_particles)  # px eV/c
    data[:, 4] = rng.normal(0, 500.0, num_particles)  # py
    data[:, 5] = rng.normal(0, 1e4, num_particles)  # pz relative to ref
    data[0, 5] = 1.2e8  # reference particle: absolute pz
    data[:, 7] = -1.6e-10  # charge in nC
    data[:, 9] = 1  # status flag: alive
    data[5, 9] = -1  # one lost particle
    np.savetxt(path, data)


def test_astra_import_matches_reference(tmp_path):
    path = tmp_path / "synthetic.astra"
    _write_synthetic_astra_file(path)

    beam = ct.ParticleBeam.from_astra(str(path), dtype=jnp.float64)

    from cheetah.converters.astra import from_astrabeam as ref_from_astrabeam

    ref_particles, ref_energy, ref_charges = ref_from_astrabeam(str(path))
    np.testing.assert_allclose(
        np.asarray(beam.particles[:, :6]), ref_particles, rtol=1e-12
    )
    np.testing.assert_allclose(float(beam.energy), ref_energy, rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(beam.particle_charges), ref_charges, rtol=1e-12
    )
    assert beam.num_particles == 49  # One lost particle removed

    parameter_beam = ct.ParameterBeam.from_astra(str(path), dtype=jnp.float64)
    np.testing.assert_allclose(
        float(parameter_beam.mu_x), float(beam.mu_x), rtol=1e-9
    )


# ----------------------------------------------------------------------
# Ocelot (duck-typed)
# ----------------------------------------------------------------------


class _FakeOcelotElement:
    def __init__(self, **kwargs):
        for key, value in kwargs.items():
            setattr(self, key, value)


def _fake(name, **kwargs):
    cls = type(name, (_FakeOcelotElement,), {})
    return cls(**kwargs)


def test_ocelot_duck_typed_conversion():
    cell = [
        _fake("Drift", id="d1", l=1.0),
        _fake("Quadrupole", id="q1", l=0.3, k1=4.2),
        _fake("Hcor", id="hc1", l=0.05, angle=1e-4),
        _fake("Vcor", id="vc1", l=0.05, angle=-1e-4),
        _fake("SBend", id="b1", l=0.5, angle=0.1, e1=0.01, e2=0.02, tilt=0.0,
              fint=0.0, fintx=0.0, gap=0.0),
        _fake("Cavity", id="c1", l=1.0, v=0.005, freq=1.3e9, phi=0.0),
        _fake("Monitor", id="BSC_screen", l=0.0),
        _fake("Monitor", id="BPM_1", l=0.0),
        _fake("Monitor", id="other", l=0.0),
        _fake("Marker", id="m1"),
        _fake("Aperture", id="ap1", xmax=1e-3, ymax=1e-3, type="rect"),
        _fake("Unknown", id="u1", l=0.25),
    ]
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_ocelot(cell, name="test", sanitize_names=True)

    types = [type(e).__name__ for e in segment.elements]
    assert types == [
        "Drift", "Quadrupole", "HorizontalCorrector", "VerticalCorrector",
        "Dipole", "Cavity", "Screen", "BPM", "Marker", "Marker", "Aperture",
        "Drift",
    ]
    np.testing.assert_allclose(segment.elements[5].voltage, 5e6)  # GeV -> eV


# ----------------------------------------------------------------------
# NX Tables
# ----------------------------------------------------------------------


def test_nx_tables_conversion():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_nx_tables(f"{RESOURCES}/Stage4v3_9.txt")
    assert isinstance(segment, ct.Segment)
    assert len(segment.elements) > 10
    # Elements are in increasing s order with inferred drifts in between.
    assert any(type(e).__name__ == "Drift" for e in segment.elements)


def test_lattice_json_preserves_tracking_method(tmp_path):
    segment = ct.Segment(
        [
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64),
                k1=jnp.array(4.2, jnp.float64),
                num_steps=4,
                tracking_method="drift_kick_drift",
                name="q_dkd",
            ),
            ct.Sextupole(
                jnp.array(0.2, jnp.float64),
                k2=jnp.array(30.0, jnp.float64),
                tracking_method="linear",
                name="s_lin",
            ),
        ],
        name="methods",
    )
    path = tmp_path / "methods.json"
    segment.to_lattice_json(str(path))
    restored = ct.Segment.from_lattice_json(str(path), dtype=jnp.float64)
    assert restored.q_dkd.tracking_method == "drift_kick_drift"
    assert restored.q_dkd.num_steps == 4
    assert restored.s_lin.tracking_method == "linear"
    assert restored == segment


def test_load_reference_ares_lattice_json(key):
    """The reference's shipped real-world LatticeJSON of the full ARES lattice
    (``docs/examples/ARESlatticeStage3v1_9.json``) loads directly."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        segment = ct.Segment.from_lattice_json(
            f"{RESOURCES}/ARESlatticeStage3v1_9.json",
            dtype=jnp.float64,
        )
    assert len(segment.elements) == 195
    np.testing.assert_allclose(float(segment.length), 42.3495, atol=1e-4)

    beam = ct.ParticleBeam.from_parameters(
        num_particles=100,
        energy=jnp.asarray(1.07e8, jnp.float64),
        key=key,
    )
    out = segment.track(beam)
    assert np.all(np.isfinite(np.asarray(out.particles)))


def test_lattice_json_interop_with_reference(tmp_path, key):
    """A lattice saved by us loads in the torch reference (and tracks the
    same), proving the JSON dialect is fully compatible in both directions."""
    import torch
    from reference_oracle import ref_particle_beam

    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.4, jnp.float64), name="d1"),
            ct.Quadrupole(
                jnp.asarray(0.122, jnp.float64),
                k1=jnp.asarray(8.0, jnp.float64),
                misalignment=jnp.asarray([1e-4, -5e-5], jnp.float64),
                name="q1",
            ),
            ct.Dipole(
                jnp.asarray(0.3, jnp.float64),
                angle=jnp.asarray(0.05, jnp.float64),
                name="b1",
            ),
            ct.Cavity(
                jnp.asarray(1.0, jnp.float64),
                voltage=jnp.asarray(2e6, jnp.float64),
                phase=jnp.asarray(20.0, jnp.float64),
                frequency=jnp.asarray(1.3e9, jnp.float64),
                name="c1",
            ),
        ],
        name="interop",
    )
    path = tmp_path / "interop.json"
    segment.to_lattice_json(str(path))

    ref_segment = ref.Segment.from_lattice_json(str(path)).to(torch.float64)
    assert [type(e).__name__ for e in ref_segment.elements] == [
        "Drift",
        "Quadrupole",
        "Dipole",
        "Cavity",
    ]

    beam = ct.ParticleBeam.from_parameters(
        num_particles=300, energy=jnp.asarray(1.5e8, jnp.float64), key=key
    )
    out = segment.track(beam)
    ref_out = ref_segment.track(ref_particle_beam(beam))
    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-9, atol=1e-14
    )


# ----------------------------------------------------------------------
# Elegant extras: reversed beamline, SDDS beam import
# ----------------------------------------------------------------------


def test_elegant_reversed_beamline_import():
    """A ``line=(-fodo)`` reversed beamline imports as the element-wise
    reverse of the forward line (ref ``test_elegant_conversion.py:123-138``)."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        forward = ct.Segment.from_elegant(
            f"{RESOURCES}/fodo.lte", "fodo", sanitize_names=True,
            dtype=jnp.float64,
        )
        reversed_import = ct.Segment.from_elegant(
            f"{RESOURCES}/fodo.lte", "reversed_fodo", sanitize_names=True,
            dtype=jnp.float64,
        ).flattened()

    correct = forward.reversed()
    assert [e.name for e in reversed_import.elements] == [
        e.name for e in correct.elements
    ]
    np.testing.assert_allclose(
        float(reversed_import.length), float(forward.length), rtol=1e-12
    )


def test_elegant_sdds_beam_import(tmp_path):
    """``ParticleBeam.from_elegant`` reads an ASCII SDDS beam via the
    built-in reader (no ``sdds`` package on this host — the torch reference
    hard-requires it, ref ``elegant.py:468-474``). The coordinate conversion
    is oracled against the reference's ``elegant_to_cheetah_coordinates``."""
    import torch
    from cheetah.converters.elegant import (
        elegant_to_cheetah_coordinates as ref_convert,
    )

    p_central = 300.0  # beta*gamma ~ 153 MeV electrons
    rows = [
        # x, xp, y, yp, t, p — first particle exactly on reference momentum
        [1e-3, 0.0, 0.0, 0.0, 0.0, p_central],
        [-2e-4, 1e-4, 3e-4, -2e-4, 1e-12, 1.05 * p_central],
        [5e-4, -3e-4, -1e-4, 2e-4, -2e-12, 0.95 * p_central],
    ]
    charges = [1e-12, 2e-12, 3e-12]
    lines = [
        "SDDS1",
        "&parameter name=pCentral, type=double, &end",
        "&column name=x, type=double, &end",
        "&column name=xp, type=double, &end",
        "&column name=y, type=double, &end",
        "&column name=yp, type=double, &end",
        "&column name=t, type=double, &end",
        "&column name=p, type=double, &end",
        "&column name=q, type=double, &end",
        "&data mode=ascii, &end",
        f"{p_central}",
        f"{len(rows)}",
    ] + [
        " ".join(f"{value:.17g}" for value in row + [charge])
        for row, charge in zip(rows, charges)
    ]
    path = tmp_path / "beam.sdds"
    path.write_text("\n".join(lines) + "\n")

    beam = ct.ParticleBeam.from_elegant(str(path), dtype=jnp.float64)

    assert beam.num_particles == 3
    # Oracle: the torch reference's coordinate conversion on the same data.
    expected = ref_convert(
        torch.tensor([rows], dtype=torch.float64),
        torch.tensor(p_central, dtype=torch.float64),
    )[0]
    np.testing.assert_allclose(
        np.asarray(beam.particles[..., :6]).reshape(3, 6),
        expected.numpy()[..., :6],
        rtol=1e-12,
        atol=1e-18,
    )
    np.testing.assert_allclose(
        np.asarray(beam.particle_charges).reshape(3), charges, rtol=1e-12
    )
    # On-momentum zero-angle particle: identity coordinates.
    first = np.asarray(beam.particles).reshape(3, 7)[0]
    np.testing.assert_allclose(first[:6], [1e-3, 0, 0, 0, 0, 0], atol=1e-15)
    # Reference energy from pCentral.
    me = 510998.95069
    np.testing.assert_allclose(
        float(jnp.squeeze(beam.energy)),
        np.sqrt((p_central * me) ** 2 + me**2),
        rtol=1e-12,
    )
