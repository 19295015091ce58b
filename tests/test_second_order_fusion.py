"""Second-order bracket fusion (``Segment._fuse_second_order_brackets``).

A ``second_order``-tracked element bracketed by skippable linear runs folds
the runs into its 7x7x7 T-tensor exactly (the augmented coordinate makes the
composition closed — no higher-order truncation), so ``Segment.track``
transports the bracket with ONE quadratic apply. These tests pin the fusion's
exactness against element-wise tracking, its plan structure, and its
interaction with jit / grad / vmap / checkpointing / moments. The reference
has no analogue (its ``segment.py:545-574`` breaks runs at every
non-skippable element), so the oracle here is our own element-wise path —
which `tests/test_full_ares.py` and the golden corpus pin against the
reference.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct
from cheetah_tpu.accelerator.segment import _SecondOrderBracket

f64 = jnp.float64


@pytest.fixture
def beam(key):
    return ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.asarray(1e-4, f64),
        sigma_px=jnp.asarray(2e-5, f64),
        sigma_y=jnp.asarray(1.3e-4, f64),
        sigma_py=jnp.asarray(1.7e-5, f64),
        sigma_tau=jnp.asarray(1e-5, f64),
        sigma_p=jnp.asarray(1e-3, f64),
        energy=jnp.asarray(150e6, f64),
        key=key,
        dtype=f64,
    )


def make_segment(method="second_order"):
    return ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, f64), name="d1"),
            ct.Quadrupole(
                jnp.asarray(0.2, f64),
                k1=jnp.asarray(4.2, f64),
                tilt=jnp.asarray(0.1, f64),
                misalignment=jnp.asarray([1e-4, -2e-4], f64),
                tracking_method=method,
                name="q1",
            ),
            ct.Drift(jnp.asarray(0.3, f64), name="d2"),
            ct.Sextupole(
                jnp.asarray(0.1, f64),
                k2=jnp.asarray(30.0, f64),
                tracking_method="second_order",
                name="s1",
            ),
            ct.Drift(jnp.asarray(0.7, f64), name="d3"),
        ]
    )


def track_elementwise(segment, beam):
    for element in segment.elements:
        beam = element.track(beam)
    return beam


def test_plan_fuses_brackets():
    """[run, so, run, so, run] plans to exactly two brackets: the middle run
    is claimed as the SECOND element's upstream, not the first's downstream."""
    plan = make_segment()._plan()
    assert [type(todo).__name__ for todo in plan] == [
        "_SecondOrderBracket",
        "_SecondOrderBracket",
    ]
    first, second = plan
    assert [e.name for e in first.upstream] == ["d1"]
    assert first.element.name == "q1"
    assert first.downstream == []
    assert [e.name for e in second.upstream] == ["d2"]
    assert second.element.name == "s1"
    assert [e.name for e in second.downstream] == ["d3"]


def test_fused_track_matches_elementwise(beam):
    segment = make_segment()
    out = segment.track(beam)
    ref = track_elementwise(segment, beam)
    np.testing.assert_allclose(out.particles, ref.particles, rtol=0, atol=1e-17)
    np.testing.assert_allclose(out.s, ref.s, rtol=1e-15)
    np.testing.assert_array_equal(
        out.survival_probabilities, ref.survival_probabilities
    )


def test_fused_track_matches_under_jit(beam):
    segment = make_segment()
    out = jax.jit(lambda seg, b: seg.track(b))(segment, beam)
    ref = track_elementwise(segment, beam)
    np.testing.assert_allclose(out.particles, ref.particles, rtol=0, atol=1e-17)


def test_fused_track_batched_instances(beam):
    """Vectorised lattice settings batch the folded T-tensor per instance."""
    segment = make_segment()
    segment.q1.k1 = jnp.linspace(3.0, 5.0, 4, dtype=f64)
    out = segment.track(beam)
    ref = track_elementwise(segment, beam)
    assert out.particles.shape == (4, 1_000, 7)
    np.testing.assert_allclose(out.particles, ref.particles, rtol=0, atol=1e-17)


def test_fused_track_batched_particles(beam):
    """Batched particle arrays take the per-component unroll path."""
    segment = make_segment()
    batched = beam.clone()
    batched.particles = jnp.stack([beam.particles, beam.particles * 1.01])
    out = segment.track(batched)
    ref = track_elementwise(segment, batched)
    assert out.particles.shape == (2, 1_000, 7)
    np.testing.assert_allclose(out.particles, ref.particles, rtol=0, atol=1e-17)


def test_gradient_through_fused_bracket(beam):
    """d(sigma_x)/d(k1) agrees between the fused and element-wise paths."""

    def fused_loss(k1):
        segment = make_segment()
        segment.q1.k1 = k1
        return segment.track(beam).sigma_x

    def elementwise_loss(k1):
        segment = make_segment()
        segment.q1.k1 = k1
        return track_elementwise(segment, beam).sigma_x

    k1 = jnp.asarray(4.2, f64)
    g_fused = jax.grad(fused_loss)(k1)
    g_ref = jax.grad(elementwise_loss)(k1)
    np.testing.assert_allclose(g_fused, g_ref, rtol=1e-12)


def test_checkpointed_track_matches(beam):
    segment = make_segment()
    out = segment.track_checkpointed(beam)
    ref = track_elementwise(segment, beam)
    np.testing.assert_allclose(out.particles, ref.particles, rtol=0, atol=1e-17)


def test_track_moments_with_bracket(beam):
    """``track_moments`` transports moments THROUGH brackets via the Gaussian
    closure: identical to collapsing at the entrance and tracking the
    ParameterBeam, and within the sampled beam's non-Gaussianity of the
    tracked-particle moments."""
    segment = make_segment()
    moments = segment.track_moments(beam)
    assert isinstance(moments, ct.ParameterBeam)
    closure = segment.track(beam.as_parameter_beam())
    np.testing.assert_allclose(moments.mu, closure.mu, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(moments.cov, closure.cov, rtol=1e-10, atol=1e-24)
    ref = track_elementwise(segment, beam)
    np.testing.assert_allclose(moments.mu_x, ref.mu_x, rtol=1e-4)
    # The sigma comparison is statistical: the closure predicts the *exact*
    # Gaussian-input moments while the 1k-particle MC carries the sampled
    # beam's higher moments through the sextupole — measured rel deviation
    # is ~3e-5 typical with a seed tail past 1e-4 (a real closure bug shows
    # at the 1e-2 level). The exact pins are the closure==ParameterBeam
    # asserts above.
    np.testing.assert_allclose(moments.sigma_x, ref.sigma_x, rtol=1e-3)


def test_no_bracket_for_lone_second_order_element(beam):
    """A second-order element with no adjacent runs tracks directly."""
    segment = ct.Segment(
        [
            ct.Sextupole(
                jnp.asarray(0.1, f64),
                k2=jnp.asarray(30.0, f64),
                tracking_method="second_order",
                name="s1",
            )
        ]
    )
    (todo,) = segment._plan()
    assert not isinstance(todo, _SecondOrderBracket)
    out = segment.track(beam)
    ref = segment.s1.track(beam)
    np.testing.assert_array_equal(out.particles, ref.particles)


def test_bracket_broken_by_nonskippable_element(beam):
    """An active aperture between the run and the second-order element keeps
    them separate — and tracking still matches element-wise semantics."""
    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, f64), name="d1"),
            ct.Aperture(
                x_max=jnp.asarray(3e-4, f64),
                y_max=jnp.asarray(3e-4, f64),
                shape="rectangular",
                is_active=True,
                name="ap",
            ),
            ct.Quadrupole(
                jnp.asarray(0.2, f64),
                k1=jnp.asarray(4.2, f64),
                tracking_method="second_order",
                name="q1",
            ),
            ct.Drift(jnp.asarray(0.3, f64), name="d2"),
        ]
    )
    plan = segment._plan()
    names = [type(todo).__name__ for todo in plan]
    assert names == ["Segment", "Aperture", "_SecondOrderBracket"]
    assert plan[2].upstream == []
    out = segment.track(beam)
    ref = track_elementwise(segment, beam)
    np.testing.assert_allclose(out.particles, ref.particles, rtol=0, atol=1e-17)
    np.testing.assert_allclose(
        out.survival_probabilities, ref.survival_probabilities, atol=0
    )


def test_parameter_beam_second_order_matches_particle_moments(key):
    """ParameterBeam second-order tracking (Gaussian moment closure — the
    reference raises here) agrees with the Monte-Carlo moments of a large
    tracked ParticleBeam from the same Gaussian."""
    segment = make_segment()
    mu = jnp.zeros(7, f64).at[6].set(1.0)
    sigmas = jnp.asarray([1e-4, 2e-5, 1.3e-4, 1.7e-5, 1e-5, 1e-3, 0.0], f64)
    cov = jnp.diag(sigmas**2)
    param = ct.ParameterBeam(
        mu, cov, energy=jnp.asarray(150e6, f64), species=ct.Species("electron")
    )
    particle = ct.ParticleBeam.from_distribution(
        num_particles=200_000, mu=mu[:6], cov=cov[:6, :6],
        energy=jnp.asarray(150e6, f64), key=key, dtype=f64,
    )

    out_param = segment.track(param)
    out_particle = segment.track(particle)

    # from_distribution matches the requested moments exactly (Cholesky
    # whitening), so the residual here is purely the 3rd/4th-moment sampling
    # error of the quadratic terms, ~sqrt(1/N) of the nonlinear correction.
    np.testing.assert_allclose(
        out_param.mu[..., :6],
        out_particle.as_parameter_beam().mu[..., :6],
        atol=3e-3 * float(jnp.max(sigmas)),
    )
    np.testing.assert_allclose(
        jnp.sqrt(jnp.diagonal(out_param.cov)[..., :6]),
        jnp.sqrt(jnp.diagonal(out_particle.as_parameter_beam().cov)[..., :6]),
        rtol=2e-2,
    )
    np.testing.assert_allclose(out_param.s, out_particle.s, rtol=1e-14)


def test_parameter_beam_second_order_reduces_to_linear_for_pure_linear_T():
    """With the quadratic entries zeroed, the Gaussian closure reproduces the
    linear congruence mu' = M mu, cov' = M cov M^T exactly."""
    from cheetah_tpu.accelerator.element import second_order_moment_transport

    rng = np.random.default_rng(7)
    M = np.eye(7)
    M[:6, :6] += 0.1 * rng.standard_normal((6, 6))
    T = np.zeros((7, 7, 7))
    T[:, 6, :] = M  # augmented convention: linear block at j == 6
    T[6] = 0.0
    T[6, 6, 6] = 1.0
    mu = np.zeros(7)
    mu[:6] = 1e-4 * rng.standard_normal(6)
    mu[6] = 1.0
    A = 1e-4 * rng.standard_normal((6, 6))
    cov = np.zeros((7, 7))
    cov[:6, :6] = A @ A.T

    mu_out, cov_out = second_order_moment_transport(
        jnp.asarray(T), jnp.asarray(mu), jnp.asarray(cov)
    )
    np.testing.assert_allclose(mu_out, M @ mu, rtol=1e-12, atol=1e-18)
    np.testing.assert_allclose(cov_out, M @ cov @ M.T, rtol=1e-12, atol=1e-22)


def test_parameter_beam_fused_bracket_matches_elementwise(key):
    """ParameterBeam through the fused bracket == element-wise second-order
    moment transport (exact up to float reassociation)."""
    segment = make_segment()
    mu = jnp.zeros(7, f64).at[6].set(1.0)
    sigmas = jnp.asarray([1e-4, 2e-5, 1.3e-4, 1.7e-5, 1e-5, 1e-3, 0.0], f64)
    param = ct.ParameterBeam(
        mu, jnp.diag(sigmas**2), energy=jnp.asarray(150e6, f64),
        species=ct.Species("electron"),
    )
    out = segment.track(param)
    ref = track_elementwise(segment, param)
    np.testing.assert_allclose(out.mu, ref.mu, rtol=1e-10, atol=1e-16)
    np.testing.assert_allclose(out.cov, ref.cov, rtol=1e-8, atol=1e-20)


def test_bracket_fusion_reduces_compiled_traffic():
    """Compiled-cost guard: the fused second-order env step must move ~6x
    less logical traffic (and ~2x fewer flops) than element-wise tracking.
    Catches plan regressions (e.g. the bracket silently not forming) on CPU
    without TPU hardware."""
    from cheetah_tpu.lattices import ares_ea_subcell

    f32 = jnp.float32
    num_instances, num_particles = 32, 2_000
    segment = ares_ea_subcell(dtype=f32)
    segment.AREAMQZM1.tracking_method = "second_order"
    segment.AREAMQZM1.k1 = jnp.linspace(-20, 20, num_instances, dtype=f32)
    beam32 = ct.ParticleBeam.from_twiss(
        num_particles=num_particles,
        beta_x=jnp.asarray(5.0, f32),
        emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(3.0, f32),
        emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.54e8, f32),
        key=jax.random.PRNGKey(0),
        dtype=f32,
    )

    fused = (
        jax.jit(lambda s, b: s.track(b).sigma_x).lower(segment, beam32).compile()
    )

    def track_elementwise_sigma(s, b):
        for element in s.elements:
            b = element.track(b)
        return b.sigma_x

    unfused = (
        jax.jit(track_elementwise_sigma).lower(segment, beam32).compile()
    )

    fused_bytes = fused.cost_analysis().get("bytes accessed", 0.0)
    unfused_bytes = unfused.cost_analysis().get("bytes accessed", 0.0)
    assert fused_bytes > 0 and unfused_bytes > 0
    assert fused_bytes < 0.4 * unfused_bytes, (
        f"bracket fusion regressed: fused step accesses {fused_bytes:.3g} B "
        f"vs {unfused_bytes:.3g} B element-wise"
    )


def test_explain_plan_describes_fusion():
    """``explain_plan`` renders the fused execution plan: brackets, fused
    linear runs, and fusion-breaking elements with their tracking method."""
    segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.5, f64), name="d1"),
            ct.Quadrupole(jnp.asarray(0.3, f64), k1=jnp.asarray(5.0, f64), name="q1"),
            ct.Sextupole(
                jnp.asarray(0.1, f64),
                k2=jnp.asarray(30.0, f64),
                tracking_method="second_order",
                name="s1",
            ),
            ct.Drift(jnp.asarray(0.2, f64), name="d2"),
            ct.Quadrupole(
                jnp.asarray(0.3, f64),
                k1=jnp.asarray(-4.0, f64),
                tracking_method="drift_kick_drift",
                name="q2",
            ),
            ct.Drift(jnp.asarray(0.4, f64), name="d3"),
        ]
    )
    plan = segment.explain_plan()
    lines = plan.splitlines()
    assert "second-order bracket" in lines[0]
    assert "2 upstream" in lines[0] and "1 downstream" in lines[0]
    assert "Quadrupole 'q2' [drift_kick_drift]" in lines[1]
    assert "fused linear run (1 matmul, 1 elements): d3" in lines[2]
    assert len(lines) == 3

    # Purely informational: tracking after explain_plan is unchanged.
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100,
        sigma_x=jnp.asarray(1e-4, f64),
        energy=jnp.asarray(1.5e8, f64),
        key=jax.random.PRNGKey(0),
        dtype=f64,
    )
    np.testing.assert_allclose(
        segment.track(beam).particles,
        track_elementwise(segment, beam).particles,
        rtol=0,
        atol=1e-17,
    )
