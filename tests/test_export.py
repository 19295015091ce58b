"""AOT deployment path: ``jax.export`` round trips of tracking computations.

The reference's deployment story is ``torch.compile``/TorchScript; the
TPU-native equivalent is ahead-of-time lowering plus :mod:`jax.export`
serialisation — compile once, ship the StableHLO artifact, run it without
retracing (or without the framework installed at all). Every element/beam
pytree is registered for export serialisation at package import
(``utils/pytree.py::register_export_serialization``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import export

import cheetah_tpu as ct
from cheetah_tpu.utils.pytree import (
    _decode_static,
    _encode_static,
    register_export_serialization,
)

f32 = jnp.float32


@pytest.fixture
def segment():
    return ct.Segment(
        [
            ct.Drift(jnp.asarray(1.0, f32)),
            ct.Quadrupole(
                jnp.asarray(0.3, f32),
                k1=jnp.asarray(8.0, f32),
                name="q1",
                metadata={"pv": "Q1:STRENGTH", "nested": {"hw": [1, 2]}},
            ),
            ct.Screen(resolution=(128, 128), is_active=True, name="scr"),
        ]
    )


@pytest.fixture
def beam(key):
    return ct.ParticleBeam.from_twiss(
        num_particles=1_000,
        beta_x=jnp.asarray(8.0, f32),
        emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(8.0, f32),
        emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.5e8, f32),
        key=key,
        dtype=f32,
    )


def test_export_serialize_roundtrip(segment, beam):
    """Serialize -> deserialize -> call reproduces the jitted computation,
    with Segment/ParticleBeam pytrees in the calling convention."""
    step = jax.jit(lambda seg, b: seg.track(b).sigma_x)
    exported = export.export(step)(segment, beam)
    blob = exported.serialize()
    assert isinstance(blob, (bytes, bytearray)) and len(blob) > 0

    rehydrated = export.deserialize(blob)
    got = rehydrated.call(segment, beam)
    want = step(segment, beam)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)


def test_export_roundtrip_vectorized_instances(segment, beam):
    """Exported computations keep the batched-instance calling convention."""
    segment.q1.k1 = jnp.linspace(-20, 20, 8, dtype=f32)
    step = jax.jit(lambda seg, b: seg.track(b).sigma_x)
    rehydrated = export.deserialize(export.export(step)(segment, beam).serialize())
    got = rehydrated.call(segment, beam)
    assert got.shape == (8,)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(step(segment, beam)), rtol=1e-6
    )


def test_aot_lower_compile(segment, beam):
    """Ahead-of-time lower+compile executes without retracing and exposes
    cost analysis (the serving-side deployment primitive)."""
    step = jax.jit(lambda seg, b: seg.track(b).sigma_x)
    compiled = step.lower(segment, beam).compile()
    np.testing.assert_allclose(
        np.asarray(compiled(segment, beam)),
        np.asarray(step(segment, beam)),
        rtol=1e-7,
    )
    assert compiled.cost_analysis()["flops"] > 0


def test_static_codec_roundtrips_exact_types():
    """Tuples stay tuples and nested dicts survive — static values feed jit
    cache keys and kernel shape parameters, so types must be exact."""
    values = (
        "name",
        None,
        True,
        3,
        0.5,
        (32, 32, 32),
        {"pv": "A:Q1", "nest": {"xs": [1, 2], "t": (4, 5)}},
        ["a", ("b", 1)],
    )
    decoded = tuple(_decode_static(_encode_static(v)) for v in values)
    assert decoded == values
    assert isinstance(decoded[5], tuple)
    assert isinstance(decoded[6]["nest"]["t"], tuple)
    assert isinstance(decoded[7], list) and isinstance(decoded[7][1], tuple)


def test_static_codec_rejects_unserializable():
    with pytest.raises(ValueError, match="not serializable"):
        _encode_static(lambda: None)
    with pytest.raises(ValueError, match="string keys"):
        _encode_static({1: "a"})


def test_register_export_serialization_idempotent():
    """Registering twice is a no-op. (The first call flushes any pytree
    classes defined since package import — other tests and executed docs
    legitimately create custom elements mid-suite — the second must find
    nothing new and must not raise on the already-registered ones.)"""
    import cheetah_tpu.parallel  # noqa: F401  (registers its own pytrees)

    register_export_serialization()
    assert register_export_serialization() == 0


def test_symbolic_beam_rejects_ambiguous_particle_count(segment):
    """A particle count colliding with another axis size (here the 7-wide
    coordinate axis) must raise, not silently miscompile the artifact."""
    from cheetah_tpu.utils import aot

    tiny = ct.ParticleBeam.from_twiss(
        num_particles=7,
        beta_x=jnp.asarray(8.0, f32),
        emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(8.0, f32),
        emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.5e8, f32),
        key=jax.random.PRNGKey(4),
        dtype=f32,
    )
    with pytest.raises(ValueError, match="ambiguous particle axis"):
        aot.symbolic_particle_beam(tiny)


def test_shape_polymorphic_export(segment, beam):
    """One artifact serves any particle count: export with the particle axis
    symbolic (``utils.aot.symbolic_particle_beam``), call at two different
    N, match the jitted computation at each."""
    from cheetah_tpu.utils import aot

    step = jax.jit(lambda seg, b: seg.track(b).sigma_x)
    exported = export.export(step)(
        aot.abstract_like(segment), aot.symbolic_particle_beam(beam)
    )
    rehydrated = export.deserialize(exported.serialize())

    for n in (500, 2_000):
        other = ct.ParticleBeam.from_twiss(
            num_particles=n,
            beta_x=jnp.asarray(8.0, f32),
            emittance_x=jnp.asarray(2e-9, f32),
            beta_y=jnp.asarray(8.0, f32),
            emittance_y=jnp.asarray(2e-9, f32),
            energy=jnp.asarray(1.5e8, f32),
            key=jax.random.PRNGKey(3),
            dtype=f32,
        )
        np.testing.assert_allclose(
            np.asarray(rehydrated.call(segment, other)),
            np.asarray(step(segment, other)),
            rtol=1e-6,
            err_msg=f"n={n}",
        )
