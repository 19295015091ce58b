"""Split / merge sweeps over every element (ref ``tests/test_split.py``,
``tests/test_merge.py`` — their ``for_every_element`` marker).

Splittable elements (Drift, Quadrupole, Solenoid — same set as the
reference) must track identically to their split segments, and re-merging
the splits must recover the original transport. Non-splittable elements
return ``[self]`` and pass trivially, keeping the sweep total."""

import jax.numpy as jnp
import numpy as np
import pytest

from element_zoo import ELEMENT_CASES, build_jax_element

import cheetah_tpu as ct

F64 = jnp.float64

SWEEP_CASES = [
    (index, class_name, spec)
    for index, (class_name, spec, _) in enumerate(ELEMENT_CASES)
    if spec is not None
]


def make_incoming(key) -> ct.ParticleBeam:
    return ct.ParticleBeam.from_parameters(
        num_particles=512,
        mu_x=jnp.asarray(1e-4, F64),
        sigma_x=jnp.asarray(1.7e-4, F64),
        sigma_px=jnp.asarray(2e-5, F64),
        sigma_y=jnp.asarray(1.5e-4, F64),
        sigma_py=jnp.asarray(2e-5, F64),
        sigma_tau=jnp.asarray(1e-4, F64),
        sigma_p=jnp.asarray(1e-3, F64),
        energy=jnp.asarray(1.5e8, F64),
        key=key,
    )


def tolerance_for(element) -> float:
    # Second-order maps truncate, so their composition differs at O(eps^3)
    # (the reference compares at rtol=1e-2, test_split.py:26-29).
    return 1e-2 if element.tracking_method == "second_order" else 1e-5


@pytest.mark.parametrize(
    "index,class_name,spec",
    SWEEP_CASES,
    ids=[f"{c}-{i}" for i, c, _ in SWEEP_CASES],
)
def test_split_tracks_like_original(index, class_name, spec, key):
    import warnings

    element = build_jax_element(class_name, spec)
    incoming = make_incoming(key)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        split = ct.Segment(element.split(jnp.asarray(0.015, F64)))
        # Track the original through a one-element Segment so skippable
        # elements (e.g. an idle Cavity) compare fused-vs-fused — the bespoke
        # element-wise cavity track differs from its own linear map by ~4e-8
        # at zero voltage (shared with the reference, see cavity.py docstring).
        out_original = ct.Segment([element]).track(incoming)
        out_split = split.track(incoming)

    np.testing.assert_allclose(
        np.asarray(out_split.particles),
        np.asarray(out_original.particles),
        rtol=tolerance_for(element),
        atol=1e-12,
        err_msg=class_name,
    )
    np.testing.assert_allclose(
        float(jnp.max(out_split.energy)), float(jnp.max(out_original.energy))
    )


@pytest.mark.parametrize(
    "index,class_name,spec",
    SWEEP_CASES,
    ids=[f"{c}-{i}" for i, c, _ in SWEEP_CASES],
)
def test_remerged_splits_track_like_original(index, class_name, spec, key):
    import warnings

    element = build_jax_element(class_name, spec)
    incoming = make_incoming(key)

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        split = ct.Segment(element.split(jnp.asarray(0.015, F64)))
        merged = split.with_consecutive_elements_merged()
        out_original = ct.Segment([element]).track(incoming)  # see note above
        out_merged = merged.track(incoming)

    np.testing.assert_allclose(
        np.asarray(out_merged.particles),
        np.asarray(out_original.particles),
        rtol=tolerance_for(element),
        atol=1e-12,
        err_msg=class_name,
    )


def test_split_preserves_dtype():
    for dtype in (jnp.float32, jnp.float64):
        quad = ct.Quadrupole(
            length=jnp.asarray(0.3, dtype), k1=jnp.asarray(4.0, dtype)
        )
        for piece in quad.split(jnp.asarray(0.1, dtype)):
            assert piece.length.dtype == dtype


def test_merge_preserves_dtype():
    for dtype in (jnp.float32, jnp.float64):
        quad = ct.Quadrupole(
            length=jnp.asarray(0.3, dtype), k1=jnp.asarray(4.0, dtype)
        )
        merged = ct.Segment(
            quad.split(jnp.asarray(0.1, dtype))
        ).with_consecutive_elements_merged()
        for element in merged.elements:
            assert element.length.dtype == dtype


def test_merge_except_for():
    """`except_for` keeps the named element un-merged (ref
    ``test_merge.py:54-68``)."""
    segment = ct.Segment(
        [ct.Drift(length=jnp.asarray(0.5, F64), name=f"d{i}") for i in range(6)]
    )
    merged = segment.with_consecutive_elements_merged(except_for=["d4"])

    assert len(merged.elements) == 3
    assert [e.name for e in merged.elements][1] == "d4"
    np.testing.assert_allclose(float(merged.length), 3.0, rtol=1e-12)


def test_merge_nested_segments():
    """Nested segments merge their own elements (ref
    ``test_merge.py:71-95``)."""
    sub1 = ct.Segment(
        [
            ct.Drift(length=jnp.asarray(0.5, F64), name="drift_1"),
            ct.Drift(length=jnp.asarray(0.5, F64), name="drift_2"),
        ],
        name="sub1",
    )
    sub2 = ct.Segment(
        [
            ct.Drift(length=jnp.asarray(0.5, F64), name="drift_3"),
            ct.Drift(length=jnp.asarray(0.5, F64), name="drift_4"),
        ],
        name="sub2",
    )
    parent = ct.Segment(
        [sub1, sub2, ct.Drift(length=jnp.asarray(0.5, F64), name="drift_5")],
        name="parent",
    )
    merged = parent.with_consecutive_elements_merged()

    assert isinstance(merged.elements[0], ct.Segment)
    assert len(merged.elements[0].elements) == 1
    assert isinstance(merged.elements[1], ct.Segment)
    assert len(merged.elements[1].elements) == 1


def test_merge_around_obstruction():
    """Mergeable runs on both sides of a non-mergeable element merge
    independently (ref ``test_merge.py:98-117``)."""
    segment = ct.Segment(
        [
            ct.Drift(length=jnp.asarray(0.5, F64), name="d1"),
            ct.Drift(length=jnp.asarray(0.5, F64), name="d2"),
            ct.Quadrupole(length=jnp.asarray(0.2, F64), name="q1"),
            ct.Drift(length=jnp.asarray(0.5, F64), name="d3"),
            ct.Drift(length=jnp.asarray(0.5, F64), name="d4"),
        ]
    )
    merged = segment.with_consecutive_elements_merged()

    assert len(merged.elements) == 3
    assert isinstance(merged.elements[1], ct.Quadrupole)
