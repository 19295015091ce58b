"""Randomised full-lattice parity fuzz against the live torch reference.

The element zoo (`test_elements.py`) proves per-element parity and
`test_fusion_fuzz.py` proves the fused plan matches element-wise tracking
*internally*. This closes the remaining gap: random COMPOSITIONS of the
known-good element specs, tracked end to end through both implementations,
must agree at float64 — including mid-lattice energy changes from active
cavities, mixed tracking methods, apertures and diagnostics in arbitrary
order. The analogue of the reference's full-ARES cross-check
(``tests/test_compare_ocelot.py``) on adversarially-shuffled lattices.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct
from element_zoo import ELEMENT_CASES, build_jax_element, build_ref_element
from reference_oracle import ref, ref_particle_beam, to_numpy

f64 = jnp.float64

# Compose from every parity-checked case except SpaceChargeKick (its grids
# depend on running beam sigmas — covered head-to-head in
# test_space_charge.py; composing it here would only slow the fuzz).
_COMPOSABLE = [
    (class_name, spec)
    for class_name, spec, parity in ELEMENT_CASES
    if parity and class_name != "SpaceChargeKick"
]


def _make_beam():
    return ct.ParticleBeam.from_twiss(
        num_particles=2_000,
        beta_x=jnp.asarray(6.0, f64),
        alpha_x=jnp.asarray(-0.8, f64),
        emittance_x=jnp.asarray(3e-9, f64),
        beta_y=jnp.asarray(4.0, f64),
        alpha_y=jnp.asarray(0.6, f64),
        emittance_y=jnp.asarray(2e-9, f64),
        energy=jnp.asarray(1.2e8, f64),
        total_charge=jnp.asarray(1e-10, f64),
        sigma_tau=jnp.asarray(1e-4, f64),
        sigma_p=jnp.asarray(2e-3, f64),
        key=jax.random.PRNGKey(3),
        dtype=f64,
    )


@pytest.mark.parametrize("seed", range(12))
def test_random_lattice_matches_reference(seed):
    rng = np.random.default_rng(1000 + seed)
    picks = rng.choice(len(_COMPOSABLE), size=rng.integers(4, 9))

    jax_elements = []
    ref_elements = []
    for i, pick in enumerate(picks):
        class_name, spec = _COMPOSABLE[int(pick)]
        spec = {**spec, "name": f"el_{i}_{class_name}"}
        jax_elements.append(build_jax_element(class_name, spec))
        ref_elements.append(build_ref_element(class_name, spec))

    beam = _make_beam()
    jax_out = ct.Segment(jax_elements).track(beam)
    ref_out = ref.Segment(ref_elements).track(ref_particle_beam(beam))

    np.testing.assert_allclose(
        np.asarray(jax_out.particles),
        to_numpy(ref_out.particles),
        rtol=1e-9,
        atol=1e-11,
        err_msg=f"seed {seed}: {[e.name for e in jax_elements]}",
    )
    np.testing.assert_allclose(
        float(jax_out.energy), float(ref_out.energy), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(jax_out.survival_probabilities),
        to_numpy(ref_out.survival_probabilities),
        rtol=1e-9,
        atol=1e-12,
    )
    # The jitted plan agrees too. Tolerance note: with the segment passed as
    # a jit ARGUMENT, an idle cavity's voltage is traced, so it runs the
    # bespoke Cavity.track instead of fusing to a drift map (Cavity
    # docstring) — and the bespoke track deviates ~1e-9..4e-8 from the
    # fused map (the reference's own element-wise vs fused tracks differ by
    # the same amount at voltage = 0). Eager matches the oracle at 1e-11
    # above because both fuse.
    jit_out = jax.jit(lambda s, b: s.track(b))(ct.Segment(jax_elements), beam)
    np.testing.assert_allclose(
        np.asarray(jit_out.particles),
        to_numpy(ref_out.particles),
        rtol=1e-6,
        atol=5e-8,
    )


# ParameterBeam composition: linear-tracking elements only (second-order and
# dkd are ParticleBeam-only in both implementations; Aperture is a
# ParticleBeam-only effect; the zoo Sextupole defaults to second_order).
_PARAM_COMPOSABLE = [
    (class_name, spec)
    for class_name, spec, parity in ELEMENT_CASES
    if parity
    and spec.get("tracking_method", "linear") == "linear"
    and class_name
    not in ("TransverseDeflectingCavity", "Aperture", "Sextupole", "SpaceChargeKick")
]


def _make_parameter_beam():
    return ct.ParameterBeam.from_twiss(
        beta_x=jnp.asarray(6.0, f64),
        alpha_x=jnp.asarray(-0.8, f64),
        emittance_x=jnp.asarray(3e-9, f64),
        beta_y=jnp.asarray(4.0, f64),
        alpha_y=jnp.asarray(0.6, f64),
        emittance_y=jnp.asarray(2e-9, f64),
        energy=jnp.asarray(1.2e8, f64),
        total_charge=jnp.asarray(1e-10, f64),
        sigma_tau=jnp.asarray(1e-4, f64),
        sigma_p=jnp.asarray(2e-3, f64),
        dtype=f64,
    )


@pytest.mark.parametrize("seed", range(8))
def test_random_lattice_parameter_beam_matches_reference(seed):
    from reference_oracle import ref_parameter_beam

    rng = np.random.default_rng(2000 + seed)
    picks = rng.choice(len(_PARAM_COMPOSABLE), size=rng.integers(4, 9))

    jax_elements, ref_elements = [], []
    for i, pick in enumerate(picks):
        class_name, spec = _PARAM_COMPOSABLE[int(pick)]
        spec = {**spec, "name": f"pel_{i}_{class_name}"}
        jax_elements.append(build_jax_element(class_name, spec))
        ref_elements.append(build_ref_element(class_name, spec))

    beam = _make_parameter_beam()
    jax_out = ct.Segment(jax_elements).track(beam)
    ref_out = ref.Segment(ref_elements).track(ref_parameter_beam(beam))

    np.testing.assert_allclose(
        np.asarray(jax_out.mu), to_numpy(ref_out.mu), rtol=1e-9, atol=1e-13
    )
    np.testing.assert_allclose(
        np.asarray(jax_out.cov), to_numpy(ref_out.cov), rtol=1e-8, atol=1e-18
    )
    np.testing.assert_allclose(
        float(jax_out.energy), float(ref_out.energy), rtol=1e-12
    )


@pytest.mark.parametrize("seed", range(8))
def test_random_batched_lattice_matches_reference(seed):
    """Vectorisation parity fuzz: random lattices where random scalar
    parameters are promoted to a (3,)-batch of perturbed values must
    broadcast identically in both implementations (the reference
    broadcasts leading dims natively; here it falls out of the pytree
    design). Complements the structured sweep in test_vectorized.py."""
    rng = np.random.default_rng(3000 + seed)
    picks = rng.choice(len(_COMPOSABLE), size=rng.integers(3, 7))

    jax_elements, ref_elements = [], []
    batched_any = False
    for i, pick in enumerate(picks):
        class_name, spec = _COMPOSABLE[int(pick)]
        spec = {**spec, "name": f"bel_{i}_{class_name}"}
        float_keys = [k for k, v in spec.items() if isinstance(v, float)]
        if float_keys and rng.random() < 0.6:
            key_to_batch = str(rng.choice(float_keys))
            base = spec[key_to_batch]
            spec[key_to_batch] = [
                base * (1.0 + delta) for delta in rng.uniform(-0.3, 0.3, size=3)
            ]
            batched_any = True
        jax_elements.append(build_jax_element(class_name, spec))
        ref_elements.append(build_ref_element(class_name, spec))
    if not batched_any:  # guarantee the test exercises broadcasting
        jax_elements.insert(0, ct.Quadrupole(
            jnp.asarray(0.2, f64), k1=jnp.asarray([1.0, -2.0, 3.0], f64),
            name="bel_forced",
        ))
        from reference_oracle import torch
        ref_elements.insert(0, ref.Quadrupole(
            torch.tensor(0.2, dtype=torch.float64),
            k1=torch.tensor([1.0, -2.0, 3.0], dtype=torch.float64),
            name="bel_forced",
        ))

    beam = _make_beam()
    jax_out = ct.Segment(jax_elements).track(beam)
    ref_out = ref.Segment(ref_elements).track(ref_particle_beam(beam))

    assert jax_out.particles.shape == tuple(ref_out.particles.shape)
    np.testing.assert_allclose(
        np.asarray(jax_out.particles),
        to_numpy(ref_out.particles),
        rtol=1e-9,
        atol=1e-11,
        err_msg=f"seed {seed}: {[e.name for e in jax_elements]}",
    )
    np.testing.assert_allclose(
        np.asarray(jnp.broadcast_to(jax_out.energy, ref_out.energy.shape)),
        to_numpy(ref_out.energy),
        rtol=1e-12,
    )
