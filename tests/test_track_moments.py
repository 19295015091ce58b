"""``Segment.track_moments``: the exact moments fast path.

For linear (skippable) runs, the moments of the tracked particle
distribution are *identical* (an algebraic identity, not an approximation)
to moment-congruence transport of the beam's sufficient statistics — so
``track_moments`` must match ``track(...)`` + ``as_parameter_beam()`` to
float64 precision, while never materialising the transported particle
array. No reference analogue (the reference has no moments-only fast path).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct
from cheetah_tpu.parallel import BatchedLatticeEnv

F64 = jnp.float64


def make_beam(num_particles=10_000):
    return ct.ParticleBeam.from_twiss(
        num_particles=num_particles,
        beta_x=jnp.array(6.0, F64),
        alpha_x=jnp.array(-0.8, F64),
        emittance_x=jnp.array(3e-9, F64),
        beta_y=jnp.array(4.0, F64),
        alpha_y=jnp.array(0.4, F64),
        emittance_y=jnp.array(2e-9, F64),
        energy=jnp.array(1.5e8, F64),
        total_charge=jnp.array(1e-10, F64),
        key=jax.random.PRNGKey(3),
        dtype=F64,
    )


def make_linear_segment():
    return ct.Segment(
        [
            ct.Drift(jnp.array(0.8, F64), name="d1"),
            ct.Quadrupole(jnp.array(0.3, F64), k1=jnp.array(6.0, F64), name="q1"),
            ct.Drift(jnp.array(0.5, F64), name="d2"),
            ct.HorizontalCorrector(
                jnp.array(0.1, F64), angle=jnp.array(2e-4, F64), name="hc"
            ),
            ct.Quadrupole(jnp.array(0.3, F64), k1=jnp.array(-5.0, F64), name="q2"),
            ct.Drift(jnp.array(1.2, F64), name="d3"),
        ],
        name="linear",
    )


def assert_moments_match(moments, tracked_particles, rtol=1e-9, atol=1e-14):
    expected = tracked_particles.as_parameter_beam()
    assert isinstance(moments, ct.ParameterBeam)
    np.testing.assert_allclose(moments.mu, expected.mu, rtol=rtol, atol=atol)
    np.testing.assert_allclose(moments.cov, expected.cov, rtol=rtol, atol=atol)
    np.testing.assert_allclose(moments.energy, expected.energy, rtol=rtol)


def test_fully_linear_segment_exact():
    segment, beam = make_linear_segment(), make_beam()
    moments = segment.track_moments(beam)
    assert_moments_match(moments, segment.track(beam))


def test_mixed_segment_tracks_particles_through_nonlinear_parts():
    # A drift-kick-drift quadrupole mid-lattice is NOT skippable: particles
    # must be tracked through it, with only the trailing linear run
    # collapsed to moments.
    nonlinear_quad = ct.Quadrupole(
        jnp.array(0.3, F64),
        k1=jnp.array(30.0, F64),
        tracking_method="drift_kick_drift",
        num_steps=4,
        name="qnl",
    )
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(0.6, F64), name="d1"),
            nonlinear_quad,
            ct.Drift(jnp.array(0.9, F64), name="d2"),
            ct.Quadrupole(jnp.array(0.3, F64), k1=jnp.array(-4.0, F64), name="q2"),
            ct.Drift(jnp.array(0.7, F64), name="d3"),
        ],
        name="mixed",
    )
    assert not segment.is_skippable
    beam = make_beam(5_000)
    moments = segment.track_moments(beam)
    assert_moments_match(moments, segment.track(beam))


def test_parameter_beam_input_passthrough():
    segment = make_linear_segment()
    parameter_beam = make_beam().as_parameter_beam()
    moments = segment.track_moments(parameter_beam)
    expected = segment.track(parameter_beam)
    np.testing.assert_allclose(moments.mu, expected.mu, rtol=1e-12)
    np.testing.assert_allclose(moments.cov, expected.cov, rtol=1e-12)


def test_batched_instances():
    segment, beam = make_linear_segment(), make_beam(2_000)
    segment.q1.k1 = jnp.linspace(-12.0, 12.0, 32, dtype=F64)
    moments = jax.jit(lambda s, b: s.track_moments(b))(segment, beam)
    assert moments.sigma_x.shape == (32,)
    tracked = segment.track(beam)
    np.testing.assert_allclose(
        moments.sigma_x, tracked.sigma_x, rtol=1e-9, atol=1e-14
    )
    np.testing.assert_allclose(
        moments.sigma_y, tracked.sigma_y, rtol=1e-9, atol=1e-14
    )


def test_gradients_match_particle_path():
    segment, beam = make_linear_segment(), make_beam(2_000)

    def loss_moments(k1, segment, beam):
        segment.q1.k1 = k1
        return segment.track_moments(beam).sigma_x

    def loss_particles(k1, segment, beam):
        segment.q1.k1 = k1
        return segment.track(beam).sigma_x

    k1 = jnp.array(6.0, F64)
    grad_moments = jax.jit(jax.grad(loss_moments))(k1, segment, beam)
    grad_particles = jax.jit(jax.grad(loss_particles))(k1, segment, beam)
    assert jnp.isfinite(grad_moments)
    np.testing.assert_allclose(grad_moments, grad_particles, rtol=1e-8)


def test_survival_weighted_moments():
    # Upstream apertures scale per-particle survival; the conversion point
    # is after the aperture, so the weighted statistics carry through.
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(0.5, F64), name="d1"),
            ct.Aperture(
                x_max=jnp.array(2e-4, F64),
                y_max=jnp.array(2e-4, F64),
                shape="rectangular",
                is_active=True,
                name="ap",
            ),
            ct.Drift(jnp.array(0.5, F64), name="d2"),
        ],
        name="apertured",
    )
    beam = make_beam(5_000)
    moments = segment.track_moments(beam)
    assert_moments_match(moments, segment.track(beam))


def test_env_moments_only_matches_particle_env():
    segment, beam = make_linear_segment(), make_beam(2_000)
    env = BatchedLatticeEnv(segment, beam, [("q1", "k1")])
    env_moments = BatchedLatticeEnv(
        segment, beam, [("q1", "k1")], moments_only=True
    )
    settings = jnp.linspace(-8.0, 8.0, 16, dtype=F64)[:, None]
    _, _, reward = jax.jit(env.step)(settings)
    _, readings, reward_moments = jax.jit(env_moments.step)(settings)
    assert readings == {}
    np.testing.assert_allclose(reward_moments, reward, rtol=1e-9, atol=1e-14)


def test_empty_segment_converts():
    segment = ct.Segment([], name="empty")
    beam = make_beam(1_000)
    moments = segment.track_moments(beam)
    assert isinstance(moments, ct.ParameterBeam)
    np.testing.assert_allclose(moments.mu, beam.as_parameter_beam().mu, rtol=1e-12)


def test_track_checkpointed_matches_track():
    # Rematerialised tracking: same forward results and gradients as track().
    nonlinear = ct.Quadrupole(
        jnp.array(0.3, F64),
        k1=jnp.array(25.0, F64),
        tracking_method="drift_kick_drift",
        num_steps=3,
        name="qnl",
    )
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(0.5, F64), name="d1"),
            nonlinear,
            ct.Drift(jnp.array(0.5, F64), name="d2"),
            ct.Quadrupole(jnp.array(0.3, F64), k1=jnp.array(-4.0, F64), name="q2"),
            ct.Drift(jnp.array(0.5, F64), name="d3"),
        ],
        name="remat",
    )
    beam = make_beam(2_000)
    out_remat = jax.jit(lambda s, b: s.track_checkpointed(b))(segment, beam)
    out = segment.track(beam)
    # jit fuses differently inside checkpoint: allow reassociation-level
    # noise (measured 4e-16 absolute).
    np.testing.assert_allclose(
        out_remat.particles, out.particles, rtol=1e-9, atol=1e-14
    )

    def loss(k1, segment, beam, checkpointed):
        segment.qnl.k1 = k1
        tracked = (
            segment.track_checkpointed(beam)
            if checkpointed
            else segment.track(beam)
        )
        return tracked.sigma_x

    k1 = jnp.array(25.0, F64)
    grad_remat = jax.jit(jax.grad(loss), static_argnums=3)(k1, segment, beam, True)
    grad_plain = jax.jit(jax.grad(loss), static_argnums=3)(k1, segment, beam, False)
    np.testing.assert_allclose(grad_remat, grad_plain, rtol=1e-10)


def test_second_order_elements_transport_moments_directly():
    """second_order-tracked elements no longer force particle tracking: the
    moments path collapses BEFORE them and uses the exact Gaussian closure —
    identical to collapsing at the boundary and tracking the ParameterBeam."""
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(0.6, F64), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, F64),
                k1=jnp.array(8.0, F64),
                tracking_method="second_order",
                name="q1",
            ),
            ct.Drift(jnp.array(0.9, F64), name="d2"),
        ],
        name="so",
    )
    beam = make_beam(50_000)

    moments = segment.track_moments(beam)

    # Semantics: equivalent to collapsing at the entrance (nothing upstream
    # is particle-only) and tracking the ParameterBeam through the segment.
    expected = segment.track(beam.as_parameter_beam())
    np.testing.assert_allclose(moments.mu, expected.mu, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(moments.cov, expected.cov, rtol=1e-10, atol=1e-22)

    # And close to the tracked-particle sample moments (differs only by the
    # sampled beam's 3rd/4th-moment deviation from Gaussian).
    tracked = segment.track(beam)
    np.testing.assert_allclose(moments.sigma_x, tracked.sigma_x, rtol=2e-2)
    np.testing.assert_allclose(moments.sigma_px, tracked.sigma_px, rtol=2e-2)


def test_nonlinear_dkd_after_second_order_still_tracks_particles():
    """A dkd element AFTER a second-order one keeps the particle path up to
    and including the dkd element."""
    segment = ct.Segment(
        [
            ct.Quadrupole(
                jnp.array(0.3, F64),
                k1=jnp.array(8.0, F64),
                tracking_method="second_order",
                name="q1",
            ),
            ct.Quadrupole(
                jnp.array(0.3, F64),
                k1=jnp.array(30.0, F64),
                tracking_method="drift_kick_drift",
                name="qnl",
            ),
            ct.Drift(jnp.array(0.9, F64), name="d2"),
        ],
        name="so_dkd",
    )
    beam = make_beam(5_000)
    moments = segment.track_moments(beam)
    assert_moments_match(moments, segment.track(beam))


def test_second_order_particles_mode_restores_exact_sample_moments():
    """track_moments(..., second_order="particles") particle-tracks through
    second-order elements — exact sample moments, as before the closure."""
    segment = ct.Segment(
        [
            ct.Quadrupole(
                jnp.array(0.3, F64),
                k1=jnp.array(8.0, F64),
                tracking_method="second_order",
                name="q1",
            ),
            ct.Drift(jnp.array(0.9, F64), name="d2"),
        ],
        name="so",
    )
    beam = make_beam(5_000)
    moments = segment.track_moments(beam, second_order="particles")
    assert_moments_match(moments, segment.track(beam))
