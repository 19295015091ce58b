"""Gradient sweep over every element type.

The reference's gradient coverage is per-primitive (``tests/test_autograd.py``)
and per-lattice (``tests/test_differentiable.py:10-133``); this sweep is
systematic instead: for EVERY entry in the element zoo it differentiates
tracking with respect to (a) the incoming particle coordinates and (b) every
floating-point element parameter, asserting finite gradients. Elements are
pytrees, so (b) is one ``jax.grad`` over the whole element — a capability the
torch reference gets per-``Parameter`` only.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from element_zoo import ELEMENT_CASES, build_jax_element

import cheetah_tpu as ct

F64 = jnp.float64

GRAD_CASES = [
    (index, class_name, spec)
    for index, (class_name, spec, _) in enumerate(ELEMENT_CASES)
    if spec is not None
]


def make_incoming(key) -> ct.ParticleBeam:
    return ct.ParticleBeam.from_parameters(
        num_particles=256,
        mu_x=jnp.asarray(1e-4, F64),
        sigma_x=jnp.asarray(1.7e-4, F64),
        sigma_px=jnp.asarray(2e-5, F64),
        sigma_y=jnp.asarray(1.5e-4, F64),
        sigma_py=jnp.asarray(2e-5, F64),
        sigma_tau=jnp.asarray(1e-4, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        energy=jnp.asarray(1.5e8, F64),
        total_charge=jnp.asarray(1e-9, F64),
        key=key,
    )


def tracked_scalar(element, beam) -> jnp.ndarray:
    """A scalar readout that touches every outgoing coordinate."""
    outgoing = element.track(beam)
    return jnp.sum(jnp.square(outgoing.particles[..., :6])) + jnp.sum(
        outgoing.energy
    ) / 1e8


@pytest.mark.parametrize(
    "index,class_name,spec",
    GRAD_CASES,
    ids=[f"{c}-{i}" for i, c, _ in GRAD_CASES],
)
def test_grad_wrt_incoming_particles(index, class_name, spec, key):
    """d(readout)/d(incoming particles) is finite for every element."""
    import warnings

    element = build_jax_element(class_name, spec)
    beam = make_incoming(key)

    def loss(particles):
        moved = ct.ParticleBeam(
            particles=particles,
            energy=beam.energy,
            particle_charges=beam.particle_charges,
            species=beam.species,
        )
        return tracked_scalar(element, moved)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")  # zero-crossing cavity case
        grads = jax.jit(jax.grad(loss))(beam.particles)

    assert grads.shape == beam.particles.shape
    assert bool(jnp.all(jnp.isfinite(grads)))
    # Some coordinate must matter (Markers/BPMs pass through: identity map
    # still has nonzero d(sum x^2)/dx).
    assert float(jnp.max(jnp.abs(grads))) > 0.0


@pytest.mark.parametrize(
    "index,class_name,spec",
    GRAD_CASES,
    ids=[f"{c}-{i}" for i, c, _ in GRAD_CASES],
)
def test_grad_wrt_element_parameters(index, class_name, spec, key):
    """d(readout)/d(every element leaf) is finite: elements are pytrees, so
    one ``jax.grad`` differentiates w.r.t. all parameters at once."""
    import warnings

    element = build_jax_element(class_name, spec)
    beam = make_incoming(key)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        grads = jax.jit(jax.grad(tracked_scalar))(element, beam)

    leaves = jax.tree.leaves(grads)
    if class_name == "Marker":
        assert not leaves  # Marker is parameterless by design.
        return
    assert leaves, f"{class_name} has no differentiable leaves"
    for leaf in leaves:
        assert bool(jnp.all(jnp.isfinite(leaf))), class_name
