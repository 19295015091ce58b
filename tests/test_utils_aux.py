"""Aux utilities: checkpointing, profiling helpers, name utilities."""

import jax.numpy as jnp
import numpy as np

import cheetah_tpu as ct
from cheetah_tpu.utils import checkpoint, profiling
from cheetah_tpu.utils.names import UniqueNameGenerator, merge_element_names


def test_checkpoint_round_trip_segment(tmp_path, key):
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64), k1=jnp.array(4.2, jnp.float64), name="q1"
            ),
        ],
        name="ckpt",
    )
    path = str(tmp_path / "segment.npz")
    checkpoint.save(segment, path)

    # Template with different parameter values, same structure.
    template = segment.clone()
    template.q1.k1 = jnp.array(0.0, jnp.float64)
    restored = checkpoint.load(template, path)
    np.testing.assert_allclose(restored.q1.k1, 4.2)
    assert restored == segment


def test_checkpoint_round_trip_beam(tmp_path, key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.array(1e8, jnp.float64), key=key
    )
    path = str(tmp_path / "beam.npz")
    checkpoint.save(beam, path)
    template = beam.transformed_to(mu_x=jnp.array(1.0, jnp.float64))
    restored = checkpoint.load(template, path)
    np.testing.assert_allclose(restored.particles, beam.particles)


def test_state_dict_paths():
    quad = ct.Quadrupole(jnp.array(0.3, jnp.float64), k1=jnp.array(1.0, jnp.float64))
    state = checkpoint.state_dict(quad)
    assert any("k1" in key for key in state)
    assert any("length" in key for key in state)


def test_profiling_benchmark(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.array(1e8, jnp.float64), key=key
    )
    drift = ct.Drift(jnp.array(1.0, jnp.float64))
    import jax

    stats = profiling.benchmark(
        jax.jit(lambda d, b: d.track(b).particles), drift, beam, iters=3
    )
    assert stats["min_ms"] > 0


def test_profiling_compiled_stats(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1000, energy=jnp.array(1e8, jnp.float64), key=key
    )
    drift = ct.Drift(jnp.array(1.0, jnp.float64))
    stats = profiling.compiled_stats(lambda d, b: d.track(b).particles, drift, beam)
    assert stats["flops"] > 0


def test_unique_name_generator():
    generator = UniqueNameGenerator("thing")
    assert generator() == "thing_0"
    assert generator() == "thing_1"


def test_merge_element_names():
    assert merge_element_names("d_1", "d_2") == "d_1_2"
    assert merge_element_names("alpha", "beta") == "alpha_beta"


def test_cache_transfer_map_alias():
    """`utils/cache.py` parity shim: identity decorator (caching is jit's job)."""
    from cheetah_tpu.utils.cache import cache_transfer_map

    def f(x):
        return x + 1

    assert cache_transfer_map(f) is f


def test_remat_compatible_tracking(key):
    """`jax.checkpoint` (rematerialisation) composes with tracking + grad —
    the standard TPU memory/FLOPs trade for long lattices."""
    import jax

    from cheetah_tpu.lattices import ares_ea_subcell

    segment = ares_ea_subcell(jnp.float64)
    beam = ct.ParticleBeam.from_parameters(
        num_particles=256, energy=jnp.asarray(1.5e8, jnp.float64), key=key
    )

    def loss(k1, segment, beam):
        segment.AREAMQZM1.k1 = k1
        out = segment.track(beam)
        return jnp.mean(out.x**2 + out.y**2)

    k1 = jnp.asarray(4.2, jnp.float64)
    plain = jax.jit(jax.grad(loss))(k1, segment, beam)
    remat = jax.jit(jax.grad(jax.checkpoint(loss, static_argnums=())))(k1, segment, beam)
    np.testing.assert_allclose(remat, plain, rtol=1e-12)
    assert jnp.isfinite(plain)


def test_elementwise_linspace():
    """Batched linspace along a new trailing axis (ref
    ``tests/test_elementwise_linspace.py``): exact edges, per-element
    interpolation, and broadcastable endpoints."""
    from cheetah_tpu.utils.elementwise_linspace import elementwise_linspace

    start = jnp.asarray([[1.0, 2.0, 3.0], [4.0, 5.0, 6.0]])
    end = jnp.asarray([[5.0, 6.0, 7.0], [8.0, 9.0, 10.0]])
    result = elementwise_linspace(start, end, 5)

    assert result.shape == (2, 3, 5)
    np.testing.assert_allclose(result[:, :, 0], start)
    np.testing.assert_allclose(result[:, :, -1], end)
    for i in range(2):
        for j in range(3):
            np.testing.assert_allclose(
                result[i, j], np.linspace(start[i, j], end[i, j], 5), rtol=1e-6
            )

    # Broadcastable endpoints: scalar start against a (2, 3) end.
    broad = elementwise_linspace(jnp.asarray(0.0), end, 3)
    assert broad.shape == (2, 3, 3)
    np.testing.assert_allclose(broad[..., 1], end / 2, rtol=1e-6)
