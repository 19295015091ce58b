"""Dtype matrix (analogue of ``tests/test_elements.py:99-204``: every element
in float32 and float64), lengthless-element tracking, clone/equality."""

import jax.numpy as jnp
import numpy as np
import pytest
from element_zoo import ELEMENT_CASES, build_jax_element

import cheetah_tpu as ct


@pytest.fixture
def beam32(key):
    return ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.asarray(1.5e8, jnp.float32),
        dtype=jnp.float32, key=key,
    )


DTYPE_CASES = [
    (name, spec) for name, spec, _ in ELEMENT_CASES if spec is not None
]


@pytest.mark.parametrize(
    "class_name,spec",
    DTYPE_CASES,
    ids=[f"{n}-{i}" for i, (n, _) in enumerate(DTYPE_CASES)],
)
def test_element_tracks_in_float32(class_name, spec, beam32):
    """Every element case tracks a float32 beam producing float32 output
    (even with jax_enable_x64 on)."""
    kwargs = dict(spec)
    element = getattr(ct, class_name)(
        **{
            key: (jnp.asarray(value, jnp.float32) if isinstance(value, (int, float))
                  and key not in ("num_steps", "binning") else
                  jnp.asarray(value, jnp.float32) if isinstance(value, list) else value)
            for key, value in kwargs.items()
        }
    )
    out = element.track(beam32)
    assert out.particles.dtype == jnp.float32, class_name
    assert np.all(np.isfinite(np.asarray(out.particles))), class_name


def test_tracking_lengthless_elements(key):
    """Zero-length elements between thick ones do not disturb tracking
    (analogue of ``tests/test_tracking_lengthless_elements.py``)."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    plain = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64)),
            ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(3.0, jnp.float64)),
            ct.Drift(jnp.array(1.0, jnp.float64)),
        ]
    )
    with_lengthless = ct.Segment(
        [
            ct.Marker(),
            ct.Drift(jnp.array(1.0, jnp.float64)),
            ct.BPM(is_active=True),
            ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(3.0, jnp.float64)),
            ct.Marker(),
            ct.Drift(jnp.array(1.0, jnp.float64)),
            ct.Screen(),
        ]
    )
    out_plain = plain.track(beam)
    out_lengthless = with_lengthless.track(beam)
    np.testing.assert_allclose(
        out_plain.particles, out_lengthless.particles, rtol=1e-12, atol=1e-18
    )
    np.testing.assert_allclose(out_plain.s, out_lengthless.s, rtol=1e-12)


def test_clone_every_element():
    """Every element case clones to an equal but independent object
    (analogue of ``tests/test_clone.py``)."""
    for class_name, spec, _ in ELEMENT_CASES:
        if spec is None:
            continue
        element = build_jax_element(class_name, spec)
        clone = element.clone()
        assert clone == element, class_name
        assert clone is not element, class_name


def test_equality_distinguishes_parameters():
    a = ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(1.0, jnp.float64))
    b = ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(2.0, jnp.float64))
    c = ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(1.0, jnp.float64))
    assert a != b
    assert a == c
    assert a != ct.Drift(jnp.array(0.3, jnp.float64))


def test_bfloat16_tracking_moment_accuracy(key):
    """bfloat16 tracking (half the HBM traffic on TPU) keeps beam moments
    within ~1% of float32 — the accuracy bound quoted in PERF_NOTES.md for
    RL reward shaping."""
    import jax

    from cheetah_tpu.lattices import ares_ea_subcell

    beam32 = ct.ParticleBeam.from_parameters(
        num_particles=10_000,
        sigma_x=jnp.asarray(2e-4, jnp.float32),
        sigma_y=jnp.asarray(2e-4, jnp.float32),
        energy=jnp.asarray(1.54e8, jnp.float32),
        key=key,
        dtype=jnp.float32,
    )
    seg32 = ares_ea_subcell(dtype=jnp.float32)

    to_bf16 = lambda tree: jax.tree_util.tree_map(  # noqa: E731
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32
        else x,
        tree,
    )
    out32 = seg32.track(beam32)
    out16 = to_bf16(seg32).track(to_bf16(beam32))

    assert out16.particles.dtype == jnp.bfloat16
    for attr in ("sigma_x", "sigma_y", "mu_x", "mu_y"):
        v32 = float(getattr(out32, attr))
        v16 = float(getattr(out16, attr).astype(jnp.float32))
        assert abs(v16 - v32) <= max(0.01 * abs(v32), 5e-6), (attr, v32, v16)
