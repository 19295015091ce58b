"""Per-element parity against the torch reference at float64, for every
element case in the zoo, plus coverage enforcement (the analogue of the
reference's ``for_every_element`` auto-failing marker,
``tests/conftest.py:248-312``)."""

import inspect

import jax.numpy as jnp
import numpy as np
import pytest
from element_zoo import ELEMENT_CASES, build_jax_element, build_ref_element
from reference_oracle import ref_parameter_beam, ref_particle_beam, to_numpy

import cheetah_tpu as ct


def make_particle_beam(key):
    return ct.ParticleBeam.from_parameters(
        num_particles=500,
        mu_x=jnp.array(2e-5, jnp.float64),
        mu_y=jnp.array(-1e-5, jnp.float64),
        sigma_x=jnp.array(1.7e-4, jnp.float64),
        sigma_y=jnp.array(1.7e-4, jnp.float64),
        sigma_px=jnp.array(4e-6, jnp.float64),
        sigma_py=jnp.array(4e-6, jnp.float64),
        sigma_tau=jnp.array(1e-5, jnp.float64),
        sigma_p=jnp.array(1e-3, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
        key=key,
    )


def make_parameter_beam():
    return ct.ParameterBeam.from_parameters(
        mu_x=jnp.array(2e-5, jnp.float64),
        sigma_x=jnp.array(1.7e-4, jnp.float64),
        sigma_y=jnp.array(1.7e-4, jnp.float64),
        sigma_p=jnp.array(1e-3, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
    )


def test_every_element_subclass_has_a_case():
    """Any new Element subclass without a zoo entry auto-fails."""
    covered = {name for name, _, _ in ELEMENT_CASES}
    all_subclasses = set()

    def collect(cls):
        for sub in cls.__subclasses__():
            # Only the library's own PUBLIC elements are enforced;
            # user-defined subclasses (e.g. the docs-test examples) and
            # private trace-time internals (e.g. _SecondOrderBracket, which
            # has its own dedicated suite in test_second_order_fusion.py)
            # are out of scope.
            if (
                not inspect.isabstract(sub)
                and sub.__module__.startswith("cheetah_tpu")
                and not sub.__name__.startswith("_")
            ):
                all_subclasses.add(sub.__name__)
            collect(sub)

    collect(ct.Element)
    missing = all_subclasses - covered
    assert not missing, (
        f"Element subclasses without a registered test case: {missing}. "
        "Add canonical constructor args to tests/element_zoo.py."
    )


PARITY_CASES = [
    (name, spec) for name, spec, parity in ELEMENT_CASES if parity and spec is not None
]


@pytest.mark.parametrize(
    "class_name,spec", PARITY_CASES, ids=[f"{n}-{i}" for i, (n, _) in enumerate(PARITY_CASES)]
)
def test_particle_beam_parity(class_name, spec, key):
    beam = make_particle_beam(key)
    element = build_jax_element(class_name, spec)
    ref_element = build_ref_element(class_name, spec)

    out = element.track(beam)
    ref_out = ref_element.track(ref_particle_beam(beam))

    np.testing.assert_allclose(
        out.particles,
        to_numpy(ref_out.particles),
        rtol=1e-8,
        atol=1e-14,
        err_msg=f"{class_name} particles mismatch",
    )
    np.testing.assert_allclose(
        out.energy, to_numpy(ref_out.energy), rtol=1e-12, err_msg=class_name
    )
    np.testing.assert_allclose(
        out.survival_probabilities,
        to_numpy(ref_out.survival_probabilities),
        rtol=1e-12,
        atol=0,
        err_msg=class_name,
    )


# ParameterBeam parity: only linear-tracking elements (second-order and dkd
# are ParticleBeam-only in both implementations); TDC tracks dkd-only and the
# Aperture is a ParticleBeam-only effect.
LINEAR_PARITY_CASES = [
    (name, spec)
    for name, spec, parity in ELEMENT_CASES
    if parity
    and spec is not None
    and spec.get("tracking_method", "linear") == "linear"
    and name not in ("TransverseDeflectingCavity", "Aperture", "Sextupole")
]


@pytest.mark.parametrize(
    "class_name,spec",
    LINEAR_PARITY_CASES,
    ids=[f"{n}-{i}" for i, (n, _) in enumerate(LINEAR_PARITY_CASES)],
)
def test_parameter_beam_parity(class_name, spec):
    beam = make_parameter_beam()
    element = build_jax_element(class_name, spec)
    ref_element = build_ref_element(class_name, spec)

    out = element.track(beam)
    ref_out = ref_element.track(ref_parameter_beam(beam))

    np.testing.assert_allclose(
        out.mu, to_numpy(ref_out.mu), rtol=1e-9, atol=1e-16, err_msg=class_name
    )
    np.testing.assert_allclose(
        out.cov, to_numpy(ref_out.cov), rtol=1e-8, atol=1e-20, err_msg=class_name
    )
    np.testing.assert_allclose(out.energy, to_numpy(ref_out.energy), rtol=1e-12)
