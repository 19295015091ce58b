"""Eager lattice-surgery passes on large lattices.

The reference runs its optimisation passes eagerly per element
(ref ``segment.py:179-367``); here `transfer_maps_merged` batches map
construction per element *structure* (one vmap call per group, power-of-two
padded so jit caches stay bounded) and folds the ordered product in one
compiled scan — these tests pin that the batched engine is exactly
equivalent to per-element construction, across mixed structures, vectorised
parameters, and group sizes that exercise the padding.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct
from cheetah_tpu.accelerator.custom_transfer_map import (
    _fold_transfer_maps,
    _group_key,
    _next_pow2,
    _run_transfer_maps,
)

F64 = jnp.float64


def _mixed_elements(n, rng, dtype=F64):
    elements = []
    for i in range(n):
        kind = i % 5
        length = jnp.asarray(rng.uniform(0.05, 0.4), dtype)
        if kind == 4:
            # Zero-leaf element: nothing for vmap to batch — must take the
            # per-element path.
            elements.append(ct.Marker(name=f"m{i}"))
        elif kind == 0:
            elements.append(ct.Drift(length, name=f"d{i}"))
        elif kind == 1:
            elements.append(
                ct.Quadrupole(
                    length,
                    k1=jnp.asarray(rng.uniform(-0.5, 0.5), dtype),
                    name=f"q{i}",
                )
            )
        elif kind == 2:
            elements.append(
                ct.HorizontalCorrector(
                    length, angle=jnp.asarray(1e-5, dtype), name=f"h{i}"
                )
            )
        else:
            elements.append(
                ct.VerticalCorrector(
                    length, angle=jnp.asarray(-2e-5, dtype), name=f"v{i}"
                )
            )
    return elements


@pytest.mark.parametrize("n", [1, 2, 3, 7, 16, 61])
def test_run_transfer_maps_matches_per_element(n):
    """The grouped/padded map builder returns exactly the per-element maps
    (identity in the padding rows)."""
    rng = np.random.default_rng(42 + n)
    elements = _mixed_elements(n, rng)
    energy = jnp.asarray(1.5e8, F64)
    species = ct.Species("electron")

    maps = _run_transfer_maps(elements, energy, species)
    assert maps.shape[0] == _next_pow2(n)
    for i, element in enumerate(elements):
        expected = element.first_order_transfer_map(energy, species)
        np.testing.assert_array_equal(
            np.asarray(maps[i]), np.asarray(expected), err_msg=f"element {i}"
        )
    eye = np.eye(7)
    for i in range(n, maps.shape[0]):
        np.testing.assert_array_equal(np.asarray(maps[i]), eye)


def test_run_transfer_maps_vectorised_and_ungroupable():
    """Vectorised parameters batch within their own structure group; elements
    with tracer-free but distinct shapes land in different groups; the
    broadcast output carries the widest batch shape."""
    energy = jnp.asarray(1.5e8, F64)
    species = ct.Species("electron")
    elements = [
        ct.Drift(jnp.asarray([0.1, 0.2, 0.3], F64), name="dvec0"),
        ct.Drift(jnp.asarray(0.25, F64), name="dscal"),
        ct.Drift(jnp.asarray([0.15, 0.05, 0.4], F64), name="dvec1"),
        ct.Quadrupole(
            jnp.asarray(0.3, F64), k1=jnp.asarray(0.8, F64), name="q0"
        ),
    ]
    assert _group_key(elements[0]) == _group_key(elements[2])
    assert _group_key(elements[0]) != _group_key(elements[1])

    maps = _run_transfer_maps(elements, energy, species)
    assert maps.shape == (_next_pow2(4), 3, 7, 7)
    for i, element in enumerate(elements):
        expected = jnp.broadcast_to(
            element.first_order_transfer_map(energy, species), (3, 7, 7)
        )
        np.testing.assert_allclose(
            np.asarray(maps[i]), np.asarray(expected), rtol=0, atol=0
        )


def test_fold_transfer_maps_identity_padding_is_exact():
    rng = np.random.default_rng(7)
    elements = _mixed_elements(5, rng)
    energy = jnp.asarray(1.5e8, F64)
    species = ct.Species("electron")
    maps = _run_transfer_maps(elements, energy, species)
    tm = _fold_transfer_maps(maps)
    expected = jnp.eye(7, dtype=F64)
    for element in elements:
        expected = element.first_order_transfer_map(energy, species) @ expected
    np.testing.assert_allclose(
        np.asarray(tm), np.asarray(expected), rtol=1e-14, atol=1e-18
    )


def test_transfer_maps_merged_large_lattice_matches_elementwise_tracking():
    """600 mixed elements merged to one map track identically (f64)."""
    rng = np.random.default_rng(3)
    segment = ct.Segment(_mixed_elements(600, rng))
    beam = ct.ParticleBeam.from_parameters(
        num_particles=200,
        energy=jnp.asarray(1.5e8, F64),
        sigma_x=jnp.asarray(1e-4, F64),
        sigma_y=jnp.asarray(1e-4, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        key=jax.random.PRNGKey(0),
        dtype=F64,
    )
    merged = segment.transfer_maps_merged(incoming_beam=beam)
    assert len(merged.elements) == 1

    out_ref = beam
    for element in segment.elements:
        out_ref = element.track(out_ref)
    out_merged = merged.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_merged.particles),
        np.asarray(out_ref.particles),
        rtol=1e-10,
        atol=1e-15,
    )
    np.testing.assert_allclose(
        float(merged.length), float(segment.length), rtol=1e-12
    )


def test_transfer_maps_merged_except_for_keeps_tunables():
    """`except_for` splits the fold around the kept element, as the reference
    does (ref ``segment.py:179-229``)."""
    rng = np.random.default_rng(11)
    segment = ct.Segment(_mixed_elements(40, rng))
    keep = segment.elements[17].name
    beam = ct.ParticleBeam.from_parameters(
        num_particles=50, energy=jnp.asarray(1.5e8, F64), dtype=F64
    )
    merged = segment.transfer_maps_merged(incoming_beam=beam, except_for=[keep])
    names = [element.name for element in merged.elements]
    assert keep in names
    assert len(merged.elements) == 3

    out_ref = beam
    for element in segment.elements:
        out_ref = element.track(out_ref)
    out_merged = merged.track(beam)
    np.testing.assert_allclose(
        np.asarray(out_merged.particles),
        np.asarray(out_ref.particles),
        rtol=1e-10,
        atol=1e-15,
    )


def test_merging_under_jit_traces(n=6):
    """from_merging_elements with tracer leaves (every element a jit arg)
    falls back to per-element construction and stays correct."""
    rng = np.random.default_rng(5)
    segment = ct.Segment(_mixed_elements(n, rng))
    beam = ct.ParticleBeam.from_parameters(
        num_particles=50, energy=jnp.asarray(1.5e8, F64), dtype=F64
    )

    def merge_and_track(seg, b):
        merged = seg.transfer_maps_merged(incoming_beam=b)
        return merged.track(b).particles

    jitted = jax.jit(merge_and_track)(segment, beam)
    eager = merge_and_track(segment, beam)
    np.testing.assert_allclose(
        np.asarray(jitted), np.asarray(eager), rtol=1e-12, atol=1e-16
    )


def test_segment_length_batched_matches_sum():
    rng = np.random.default_rng(9)
    elements = _mixed_elements(100, rng)
    segment = ct.Segment(elements)
    expected = sum(float(element.length) for element in elements)
    np.testing.assert_allclose(float(segment.length), expected, rtol=1e-12)

    # Mixed vectorised shapes broadcast.
    segment2 = ct.Segment(
        [
            ct.Drift(jnp.asarray([0.1, 0.2], F64), name="a"),
            ct.Drift(jnp.asarray(0.3, F64), name="b"),
        ]
    )
    np.testing.assert_allclose(
        np.asarray(segment2.length), np.asarray([0.4, 0.5]), rtol=1e-12
    )

    # Under tracing the sum stays differentiable.
    grad = jax.grad(lambda seg: jnp.sum(seg.length))(segment2)
    np.testing.assert_allclose(np.asarray(grad.elements[0].length), [1.0, 1.0])
    # The scalar length broadcasts into both vector entries, so its cotangent
    # accumulates over them.
    np.testing.assert_allclose(np.asarray(grad.elements[1].length), 2.0)


def test_from_merging_empty_list_is_identity():
    """The public classmethod keeps identity-element semantics for []."""
    from cheetah_tpu.accelerator.custom_transfer_map import CustomTransferMap

    beam = ct.ParticleBeam.from_parameters(
        num_particles=10, energy=jnp.asarray(1e8, F64), dtype=F64
    )
    merged = CustomTransferMap.from_merging_elements([], incoming_beam=beam)
    np.testing.assert_array_equal(
        np.asarray(merged.predefined_transfer_map), np.eye(7)
    )
    np.testing.assert_allclose(float(merged.length), 0.0)
    out = merged.track(beam)
    np.testing.assert_array_equal(
        np.asarray(out.particles), np.asarray(beam.particles)
    )
