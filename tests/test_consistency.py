"""Golden-file consistency regression (analogue of the reference's pickled
corpus, ``tests/test_elements.py:355-432``).

Unlike the live-oracle tests this does NOT require the torch reference to be
importable: expected outputs were generated once from the reference at
float64 (``generate_consistency_corpus.py``) and stored as .npz.
"""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest
from element_zoo import (
    COMPOSITE_CASES,
    ELEMENT_CASES,
    PARAMETER_ELEMENT_INDICES,
    build_jax_composite,
    build_jax_element,
)

import cheetah_tpu as ct

RESOURCES = pathlib.Path(__file__).parent / "resources" / "consistency"

GOLDEN_CASES = [
    (index, class_name, spec)
    for index, (class_name, spec, parity) in enumerate(ELEMENT_CASES)
    if spec is not None
    and parity
    and (RESOURCES / f"{index:03d}_{class_name}.npz").is_file()
]


def make_incoming() -> ct.ParticleBeam:
    particles = np.load(RESOURCES / "incoming.npz")["particles"]
    return ct.ParticleBeam(
        particles=jnp.asarray(particles, jnp.float64),
        energy=jnp.asarray(1.5e8, jnp.float64),
    )


def test_corpus_is_complete():
    """Every parity case in the zoo must have a golden file (regenerate with
    generate_consistency_corpus.py when adding cases)."""
    expected = sum(
        1 for _, spec, parity in ELEMENT_CASES if spec is not None and parity
    )
    assert len(GOLDEN_CASES) == expected


@pytest.mark.parametrize(
    "index,class_name,spec",
    GOLDEN_CASES,
    ids=[f"{c}-{i}" for i, c, _ in GOLDEN_CASES],
)
def test_golden_consistency(index, class_name, spec):
    incoming = make_incoming()
    element = build_jax_element(class_name, spec)
    outgoing = element.track(incoming)

    golden = np.load(RESOURCES / f"{index:03d}_{class_name}.npz")
    np.testing.assert_allclose(
        outgoing.particles, golden["particles"], rtol=1e-8, atol=1e-14,
        err_msg=class_name,
    )
    np.testing.assert_allclose(outgoing.energy, golden["energy"], rtol=1e-12)
    np.testing.assert_allclose(
        outgoing.survival_probabilities,
        golden["survival_probabilities"],
        rtol=1e-12,
        atol=0,
    )
    np.testing.assert_allclose(outgoing.s, golden["s"], rtol=1e-12, atol=1e-15)


def make_parameter_incoming() -> ct.ParameterBeam:
    return ct.ParameterBeam.from_parameters(
        mu_x=jnp.asarray(1e-4, jnp.float64),
        mu_px=jnp.asarray(-2e-5, jnp.float64),
        sigma_x=jnp.asarray(1.7e-4, jnp.float64),
        sigma_px=jnp.asarray(4e-6, jnp.float64),
        sigma_y=jnp.asarray(1.7e-4, jnp.float64),
        sigma_py=jnp.asarray(4e-6, jnp.float64),
        sigma_tau=jnp.asarray(1e-5, jnp.float64),
        sigma_p=jnp.asarray(1e-3, jnp.float64),
        cov_xpx=jnp.asarray(1e-10, jnp.float64),
        energy=jnp.asarray(1.5e8, jnp.float64),
        total_charge=jnp.asarray(1e-9, jnp.float64),
    )


PARAMETER_GOLDEN_CASES = [
    (index, ELEMENT_CASES[index][0], ELEMENT_CASES[index][1])
    for index in PARAMETER_ELEMENT_INDICES
]


def test_parameter_corpus_is_complete():
    for index, class_name, _ in PARAMETER_GOLDEN_CASES:
        assert (RESOURCES / f"param_{index:03d}_{class_name}.npz").is_file(), (
            f"missing ParameterBeam golden file for case {index} {class_name}; "
            "regenerate with generate_consistency_corpus.py"
        )


@pytest.mark.parametrize(
    "index,class_name,spec",
    PARAMETER_GOLDEN_CASES,
    ids=[f"{c}-{i}" for i, c, _ in PARAMETER_GOLDEN_CASES],
)
def test_golden_consistency_parameter_beam(index, class_name, spec):
    """Per-element ParameterBeam-tracked golden variants (round-3 corpus
    extension; the reference regenerates its corpus per Element x BeamClass,
    ``tests/test_elements.py:355-432``)."""
    import warnings

    element = build_jax_element(class_name, spec)
    with warnings.catch_warnings():
        # Aperture pass-through for ParameterBeam warns in both frameworks.
        warnings.simplefilter("ignore")
        outgoing = element.track(make_parameter_incoming())

    golden = np.load(RESOURCES / f"param_{index:03d}_{class_name}.npz")
    np.testing.assert_allclose(
        outgoing.mu, golden["mu"], rtol=1e-8, atol=1e-14, err_msg=class_name
    )
    np.testing.assert_allclose(
        outgoing.cov, golden["cov"], rtol=1e-8, atol=1e-18, err_msg=class_name
    )
    np.testing.assert_allclose(outgoing.energy, golden["energy"], rtol=1e-12)
    np.testing.assert_allclose(
        outgoing.total_charge, golden["total_charge"], rtol=1e-12, atol=0
    )
    np.testing.assert_allclose(outgoing.s, golden["s"], rtol=1e-12, atol=1e-15)


def test_composite_corpus_is_complete():
    for name, beam_kind in COMPOSITE_CASES:
        assert (RESOURCES / f"composite_{name}_{beam_kind}.npz").is_file(), (
            f"missing golden file for composite case {name}/{beam_kind}; "
            "regenerate with generate_consistency_corpus.py"
        )


@pytest.mark.parametrize(
    "name,beam_kind", COMPOSITE_CASES, ids=[f"{n}-{b}" for n, b in COMPOSITE_CASES]
)
def test_golden_consistency_composite(name, beam_kind):
    """Composite golden cases: CustomTransferMap, Superimposed, nested
    Segment, space-charge segment (charged beam), and ParameterBeam-tracked
    variants (round-1 verdict corpus extension)."""
    element = build_jax_composite(name)
    golden = np.load(RESOURCES / f"composite_{name}_{beam_kind}.npz")

    if beam_kind == "parameter":
        beam = ct.ParameterBeam.from_parameters(
            mu_x=jnp.asarray(1e-4, jnp.float64),
            mu_px=jnp.asarray(-2e-5, jnp.float64),
            sigma_x=jnp.asarray(1.7e-4, jnp.float64),
            sigma_px=jnp.asarray(4e-6, jnp.float64),
            sigma_y=jnp.asarray(1.7e-4, jnp.float64),
            sigma_py=jnp.asarray(4e-6, jnp.float64),
            sigma_tau=jnp.asarray(1e-5, jnp.float64),
            sigma_p=jnp.asarray(1e-3, jnp.float64),
            cov_xpx=jnp.asarray(1e-10, jnp.float64),
            energy=jnp.asarray(1.5e8, jnp.float64),
            total_charge=jnp.asarray(1e-9, jnp.float64),
        )
        outgoing = element.track(beam)
        np.testing.assert_allclose(
            outgoing.mu, golden["mu"], rtol=1e-8, atol=1e-14, err_msg=name
        )
        np.testing.assert_allclose(
            outgoing.cov, golden["cov"], rtol=1e-8, atol=1e-18, err_msg=name
        )
        np.testing.assert_allclose(outgoing.energy, golden["energy"], rtol=1e-12)
        np.testing.assert_allclose(outgoing.s, golden["s"], rtol=1e-12, atol=1e-15)
        return

    beam = make_incoming()
    if beam_kind == "charged":
        beam = ct.ParticleBeam(
            particles=beam.particles,
            energy=beam.energy,
            particle_charges=jnp.full(
                (beam.particles.shape[-2],), 1e-9 / beam.particles.shape[-2],
                jnp.float64,
            ),
        )
    outgoing = element.track(beam)
    np.testing.assert_allclose(
        outgoing.particles, golden["particles"], rtol=1e-8, atol=1e-14,
        err_msg=name,
    )
    np.testing.assert_allclose(outgoing.energy, golden["energy"], rtol=1e-12)
    np.testing.assert_allclose(
        outgoing.survival_probabilities,
        golden["survival_probabilities"],
        rtol=1e-12,
        atol=0,
    )
