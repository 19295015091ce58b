"""Tracking parity with the torch reference and core execution semantics:
fusion equivalence, jit, grad, vectorisation."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref, ref_parameter_beam, ref_particle_beam, to_numpy, torch

import cheetah_tpu as ct


def make_segment(dtype=jnp.float64):
    return ct.Segment(
        [
            ct.Drift(jnp.array(1.0, dtype), name="d1"),
            ct.Quadrupole(
                jnp.array(0.3, dtype),
                k1=jnp.array(4.2, dtype),
                misalignment=jnp.array([1e-4, -2e-4], dtype),
                tilt=jnp.array(0.05, dtype),
                name="q1",
            ),
            ct.Drift(jnp.array(0.4, dtype), name="d2"),
            ct.HorizontalCorrector(
                jnp.array(0.1, dtype), angle=jnp.array(2e-4, dtype), name="hc"
            ),
            ct.VerticalCorrector(
                jnp.array(0.1, dtype), angle=jnp.array(-1e-4, dtype), name="vc"
            ),
            ct.Quadrupole(jnp.array(0.3, dtype), k1=jnp.array(-3.1, dtype), name="q2"),
            ct.Marker(name="m1"),
            ct.Drift(jnp.array(0.6, dtype), name="d3"),
        ],
        name="test_segment",
    )


def make_ref_segment():
    return ref.Segment(
        [
            ref.Drift(torch.tensor(1.0), name="d1"),
            ref.Quadrupole(
                torch.tensor(0.3),
                k1=torch.tensor(4.2),
                misalignment=torch.tensor([1e-4, -2e-4]),
                tilt=torch.tensor(0.05),
                name="q1",
            ),
            ref.Drift(torch.tensor(0.4), name="d2"),
            ref.HorizontalCorrector(
                torch.tensor(0.1), angle=torch.tensor(2e-4), name="hc"
            ),
            ref.VerticalCorrector(
                torch.tensor(0.1), angle=torch.tensor(-1e-4), name="vc"
            ),
            ref.Quadrupole(torch.tensor(0.3), k1=torch.tensor(-3.1), name="q2"),
            ref.Marker(name="m1"),
            ref.Drift(torch.tensor(0.6), name="d3"),
        ],
        name="test_segment",
    )


def test_particle_beam_tracking_parity(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    out = make_segment().track(beam)
    ref_out = make_ref_segment().track(ref_particle_beam(beam))
    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-9, atol=1e-18
    )
    np.testing.assert_allclose(out.s, to_numpy(ref_out.s), rtol=1e-12)


def test_parameter_beam_tracking_parity():
    beam = ct.ParameterBeam.from_twiss(
        beta_x=jnp.array(5.0, jnp.float64),
        alpha_x=jnp.array(-1.0, jnp.float64),
        emittance_x=jnp.array(2e-9, jnp.float64),
        beta_y=jnp.array(3.0, jnp.float64),
        alpha_y=jnp.array(0.5, jnp.float64),
        emittance_y=jnp.array(2e-9, jnp.float64),
        energy=jnp.array(1.5e8, jnp.float64),
    )
    out = make_segment().track(beam)
    ref_out = make_ref_segment().track(ref_parameter_beam(beam))
    np.testing.assert_allclose(out.mu, to_numpy(ref_out.mu), rtol=1e-9, atol=1e-18)
    np.testing.assert_allclose(out.cov, to_numpy(ref_out.cov), rtol=1e-9, atol=1e-22)


def test_second_order_tracking_parity(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=500, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    quad = ct.Quadrupole(
        jnp.array(0.3, jnp.float64),
        k1=jnp.array(4.2, jnp.float64),
        tracking_method="second_order",
    )
    ref_quad = ref.Quadrupole(
        torch.tensor(0.3), k1=torch.tensor(4.2), tracking_method="second_order"
    )
    out = quad.track(beam)
    ref_out = ref_quad.track(ref_particle_beam(beam))
    np.testing.assert_allclose(
        out.particles, to_numpy(ref_out.particles), rtol=1e-9, atol=1e-18
    )


def test_drift_kick_drift_tracking_parity(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=500, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    for element, ref_element in [
        (
            ct.Drift(jnp.array(1.0, jnp.float64), tracking_method="drift_kick_drift"),
            ref.Drift(torch.tensor(1.0), tracking_method="drift_kick_drift"),
        ),
        (
            ct.Quadrupole(
                jnp.array(0.3, jnp.float64),
                k1=jnp.array(4.2, jnp.float64),
                misalignment=jnp.array([1e-4, -2e-4], jnp.float64),
                tilt=jnp.array(0.1, jnp.float64),
                num_steps=5,
                tracking_method="drift_kick_drift",
            ),
            ref.Quadrupole(
                torch.tensor(0.3),
                k1=torch.tensor(4.2),
                misalignment=torch.tensor([1e-4, -2e-4]),
                tilt=torch.tensor(0.1),
                num_steps=5,
                tracking_method="drift_kick_drift",
            ),
        ),
    ]:
        out = element.track(beam)
        ref_out = ref_element.track(ref_particle_beam(beam))
        np.testing.assert_allclose(
            out.particles,
            to_numpy(ref_out.particles),
            rtol=1e-9,
            atol=1e-18,
            err_msg=type(element).__name__,
        )
        np.testing.assert_allclose(out.energy, to_numpy(ref_out.energy), rtol=1e-12)


def test_fusion_equivalence(key):
    """Fused skippable-run tracking gives the same result as element-by-element
    tracking (analogue of ``tests/test_speed_optimizations.py``)."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()
    fused = segment.track(beam)

    unfused = beam
    for element in segment.elements:
        unfused = element.track(unfused)
    # Fused and sequential application differ by float reassociation only.
    np.testing.assert_allclose(
        fused.particles, unfused.particles, rtol=1e-9, atol=1e-14
    )


def test_transfer_maps_merged(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()
    merged = segment.transfer_maps_merged(incoming_beam=beam)
    out = segment.track(beam)
    out_merged = merged.track(beam)
    np.testing.assert_allclose(
        out.particles, out_merged.particles, rtol=1e-12, atol=1e-20
    )
    assert len(merged.elements) < len(segment.elements)


def test_jit_tracking(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()

    @jax.jit
    def step(segment, beam):
        return segment.track(beam).particles

    eager = segment.track(beam).particles
    jitted = step(segment, beam)
    np.testing.assert_allclose(jitted, eager, rtol=1e-12)

    # Changing array parameters must NOT retrigger compilation. Assert on
    # the cache-size DELTA around the second call: the absolute size can be
    # 0 under full-suite memory pressure (the global executable cache
    # evicts), which is eviction, not a retrace.
    size_before = step._cache_size()
    segment.q1.k1 = jnp.array(2.0, jnp.float64)
    step(segment, beam)
    assert step._cache_size() <= max(size_before, 1)


def test_gradient_through_tracking(key):
    """Gradient-based magnet tuning works (analogue of
    ``tests/test_differentiable.py``)."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()

    def loss(k1, segment, beam):
        segment.q2.k1 = k1
        out = segment.track(beam)
        return out.sigma_x

    grad = jax.jit(jax.grad(loss))(jnp.array(-3.1, jnp.float64), segment, beam)
    assert np.isfinite(grad)

    eps = 1e-5
    fd = (
        loss(jnp.array(-3.1 + eps, jnp.float64), segment, beam)
        - loss(jnp.array(-3.1 - eps, jnp.float64), segment, beam)
    ) / (2 * eps)
    np.testing.assert_allclose(grad, fd, rtol=1e-4)


def test_vectorized_tracking_shapes(key):
    """Batched lattice settings broadcast elementwise through tracking
    (analogue of ``tests/test_vectorized.py``)."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()
    segment.q1.k1 = jnp.linspace(-5.0, 5.0, 4, dtype=jnp.float64)
    out = segment.track(beam)
    assert out.particles.shape == (4, 100, 7)
    assert out.sigma_x.shape == (4,)

    segment.q2.k1 = jnp.full((3, 1), 2.0, jnp.float64)
    out2 = segment.track(beam)
    assert out2.particles.shape == (3, 4, 100, 7)


def test_vmap_tracking(key):
    """Explicit jax.vmap over beams also works."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()

    def track_k1(k1, segment, beam):
        segment.q1.k1 = k1
        return segment.track(beam).mu_x

    mu_xs = jax.vmap(track_k1, in_axes=(0, None, None))(
        jnp.linspace(-5, 5, 8, dtype=jnp.float64), segment, beam
    )
    assert mu_xs.shape == (8,)


def test_segment_structure_ops():
    segment = make_segment()
    assert segment.element_names[0] == "d1"
    assert segment.element_index("q2") == 5

    sub = segment.subcell("q1", "q2")
    assert sub.element_names == ["q1", "d2", "hc", "vc", "q2"]

    nested = ct.Segment([segment, ct.Drift(jnp.array(1.0, jnp.float64), name="after")])
    flat = nested.flattened()
    assert flat.element_names == segment.element_names + ["after"]

    rev = segment.reversed()
    assert rev.element_names == segment.element_names[::-1]

    pre, q2, post = segment.partition_at("q2")
    assert pre.element_names == ["d1", "q1", "d2", "hc", "vc"]
    assert q2.name == "q2"
    assert post.element_names == ["m1", "d3"]

    np.testing.assert_allclose(segment.length, 2.8, rtol=1e-12)


def test_beam_attrs_along_segment(key):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.array(1.5e8, jnp.float64), key=key
    )
    segment = make_segment()
    ss, sigma_xs = segment.get_beam_attrs_along_segment(("s", "sigma_x"), beam)
    assert ss.shape == (len(segment.elements) + 1,)
    assert sigma_xs.shape == (len(segment.elements) + 1,)
    np.testing.assert_allclose(ss[-1], segment.length, rtol=1e-12)


def test_equality_and_clone():
    segment = make_segment()
    clone = segment.clone()
    assert segment == clone
    clone.q1.k1 = jnp.array(9.9, jnp.float64)
    assert segment != clone


def test_merge_consecutive_drifts():
    segment = ct.Segment(
        [
            ct.Drift(jnp.array(1.0, jnp.float64), name="a"),
            ct.Drift(jnp.array(0.5, jnp.float64), name="b"),
            ct.Quadrupole(jnp.array(0.3, jnp.float64), name="q"),
        ]
    )
    merged = segment.with_consecutive_elements_merged()
    assert len(merged.elements) == 2
    np.testing.assert_allclose(merged.elements[0].length, 1.5, rtol=1e-12)


def test_split_drift():
    drift = ct.Drift(jnp.array(1.0, jnp.float64), name="d")
    splits = drift.split(jnp.array(0.3, jnp.float64))
    assert len(splits) == 4
    np.testing.assert_allclose(sum(s.length for s in splits), 1.0, rtol=1e-12)


def test_cavity_zero_crossing_warns():
    """An active standing-wave cavity at phase +-90 deg hits the known-wrong
    r55 model (class docstring) and must emit a PhysicsWarning — at
    construction and on live reconfiguration."""
    import warnings as _warnings

    from cheetah_tpu.utils.warnings import PhysicsWarning

    with pytest.warns(PhysicsWarning, match="zero-crossing"):
        ct.Cavity(
            length=jnp.array(1.0),
            voltage=jnp.array(1e6),
            phase=jnp.array(90.0),
            frequency=jnp.array(1.3e9),
        )
    with pytest.warns(PhysicsWarning, match="zero-crossing"):
        ct.Cavity(
            length=jnp.array(1.0),
            voltage=jnp.array(1e6),
            phase=jnp.array(-90.0),
            frequency=jnp.array(1.3e9),
        )

    # Away from the crossing, or at zero voltage: silent.
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", PhysicsWarning)
        cavity = ct.Cavity(
            length=jnp.array(1.0),
            voltage=jnp.array(1e6),
            phase=jnp.array(30.0),
            frequency=jnp.array(1.3e9),
        )
        ct.Cavity(
            length=jnp.array(1.0),
            voltage=jnp.array(0.0),
            phase=jnp.array(90.0),
            frequency=jnp.array(1.3e9),
        )

    # Reconfiguring onto the crossing warns too.
    with pytest.warns(PhysicsWarning, match="zero-crossing"):
        cavity.phase = jnp.array(90.0)


def test_cavity_skippable_when_off(key):
    """A zero-voltage cavity fuses with its neighbours by default (the
    reference's cavity.py:86-92 runtime behaviour); with voltage applied, or
    under tracing, it stays non-skippable, and `skippable_when_off=False`
    opts out entirely."""
    drift = ct.Drift(jnp.array(0.5))
    cavity_off = ct.Cavity(
        length=jnp.array(1.0),
        voltage=jnp.array(0.0),
        phase=jnp.array(0.0),
        frequency=jnp.array(1.3e9),
    )
    assert cavity_off.is_skippable
    cavity_on = ct.Cavity(
        length=jnp.array(1.0),
        voltage=jnp.array(1e6),
        phase=jnp.array(0.0),
        frequency=jnp.array(1.3e9),
    )
    assert not cavity_on.is_skippable
    assert not ct.Cavity(
        length=jnp.array(1.0),
        voltage=jnp.array(0.0),
        skippable_when_off=False,
    ).is_skippable  # Opt-out keeps the bespoke element-wise track.

    segment = ct.Segment([drift, cavity_off, drift])
    beam = ct.ParticleBeam.from_parameters(
        num_particles=1_000,
        sigma_x=jnp.array(1e-4, jnp.float64),
        energy=jnp.array(1e8, jnp.float64),
        key=key,
    )
    # The whole segment fuses into a single skippable run...
    assert segment.is_skippable
    merged = segment.transfer_maps_merged(incoming_beam=beam)
    assert len(merged.elements) == 1
    # ...and fused tracking is bit-identical to the unfused track of the
    # same segment (both use the cavity's linear map once it is skippable).
    np.testing.assert_allclose(
        merged.track(beam).particles,
        segment.track(beam).particles,
        rtol=1e-14,
        atol=1e-18,
    )
    # Against a *default* (bespoke-track) off cavity the fused result shows
    # only the documented tiny model deviation (the bespoke track recomputes
    # the energy spread even at zero voltage; see tests/test_full_ares.py).
    bespoke = ct.Segment(
        [
            drift,
            ct.Cavity(
                length=jnp.array(1.0),
                voltage=jnp.array(0.0),
                phase=jnp.array(0.0),
                frequency=jnp.array(1.3e9),
            ),
            drift,
        ]
    ).track(beam)
    np.testing.assert_allclose(
        merged.track(beam).particles,
        bespoke.particles,
        rtol=2e-4,
        atol=5e-9,
    )

    # Under jit with the segment as a pytree argument (voltage traced), the
    # conservative non-skippable answer keeps tracing valid.
    out = jax.jit(lambda s, b: s.track(b).sigma_x)(segment, beam)
    assert jnp.isfinite(out)
