"""Randomised lattice fuzz for trace-time fusion (seeded, deterministic).

``Segment.track`` is a compiler: it re-plans the lattice into fused linear
runs and second-order brackets at trace time. The structured tests pin known
shapes; this fuzz sweeps randomly composed lattices (elements, tracking
methods, nesting, apertures, inactive diagnostics) and asserts the fused
plan always matches plain element-wise tracking — the invariant every
optimisation pass must preserve. 30 seeded lattices x (track, jit(track),
track_checkpointed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

f64 = jnp.float64


def _random_element(rng: np.random.Generator, index: int):
    kind = rng.choice(
        [
            "drift",
            "quad_linear",
            "quad_second",
            "quad_dkd",
            "sext",
            "dipole",
            "cavity_off",
            "hcor",
            "aperture",
            "marker",
            "bpm_off",
        ]
    )
    name = f"{kind}_{index}"
    L = jnp.asarray(rng.uniform(0.05, 0.8), f64)
    if kind == "drift":
        return ct.Drift(L, name=name)
    if kind == "quad_linear":
        return ct.Quadrupole(L, k1=jnp.asarray(rng.uniform(-30, 30), f64), name=name)
    if kind == "quad_second":
        return ct.Quadrupole(
            L,
            k1=jnp.asarray(rng.uniform(-30, 30), f64),
            tilt=jnp.asarray(rng.uniform(-0.3, 0.3), f64),
            tracking_method="second_order",
            name=name,
        )
    if kind == "quad_dkd":
        return ct.Quadrupole(
            L,
            k1=jnp.asarray(rng.uniform(-30, 30), f64),
            num_steps=int(rng.integers(1, 5)),
            tracking_method="drift_kick_drift",
            name=name,
        )
    if kind == "sext":
        return ct.Sextupole(
            L,
            k2=jnp.asarray(rng.uniform(-80, 80), f64),
            tracking_method=rng.choice(["linear", "second_order"]),
            name=name,
        )
    if kind == "dipole":
        return ct.Dipole(
            L,
            angle=jnp.asarray(rng.uniform(-0.1, 0.1), f64),
            name=name,
        )
    if kind == "cavity_off":
        return ct.Cavity(
            L,
            voltage=jnp.asarray(0.0, f64),
            frequency=jnp.asarray(1.3e9, f64),
            name=name,
        )
    if kind == "hcor":
        return ct.HorizontalCorrector(
            L, angle=jnp.asarray(rng.uniform(-1e-4, 1e-4), f64), name=name
        )
    if kind == "aperture":
        return ct.Aperture(
            x_max=jnp.asarray(rng.uniform(2e-4, 1e-3), f64),
            y_max=jnp.asarray(rng.uniform(2e-4, 1e-3), f64),
            shape=rng.choice(["rectangular", "elliptical"]),
            is_active=True,
            name=name,
        )
    if kind == "marker":
        return ct.Marker(name=name)
    return ct.BPM(is_active=False, name=name)


def _random_segment(seed: int) -> ct.Segment:
    rng = np.random.default_rng(seed)
    elements = []
    n = int(rng.integers(3, 9))
    for i in range(n):
        # Occasionally nest a small sub-segment.
        if rng.random() < 0.15:
            inner = [
                _random_element(rng, 100 * i + j)
                for j in range(int(rng.integers(1, 4)))
            ]
            elements.append(ct.Segment(inner, name=f"nest_{i}"))
        else:
            elements.append(_random_element(rng, i))
    return ct.Segment(elements, name=f"fuzz_{seed}")


def _track_elementwise(segment: ct.Segment, beam, idle_cavity_via_map=True):
    for element in segment.elements:
        if isinstance(element, ct.Segment):
            beam = _track_elementwise(element, beam, idle_cavity_via_map)
        elif (
            idle_cavity_via_map
            and isinstance(element, ct.Cavity)
            and element.is_skippable
        ):
            # The eager fused plan applies an idle cavity's linear map; its
            # bespoke element-wise track differs by ~4e-8 at zero voltage (a
            # model inconsistency shared with the reference, see cavity.py) —
            # so the eager element-wise baseline must use the map too. Under
            # tracing (segment passed as a jit argument) the cavity is
            # conservatively non-skippable, so the jit baseline keeps the
            # bespoke track (idle_cavity_via_map=False).
            beam = ct.Segment([element]).track(beam)
        else:
            beam = element.track(beam)
    return beam


@pytest.fixture(scope="module")
def fuzz_beam():
    return ct.ParticleBeam.from_parameters(
        num_particles=300,
        sigma_x=jnp.asarray(1.2e-4, f64),
        sigma_px=jnp.asarray(3e-5, f64),
        sigma_y=jnp.asarray(1.1e-4, f64),
        sigma_py=jnp.asarray(2e-5, f64),
        sigma_tau=jnp.asarray(1e-5, f64),
        sigma_p=jnp.asarray(2e-3, f64),
        energy=jnp.asarray(1.2e8, f64),
        key=jax.random.PRNGKey(99),
        dtype=f64,
    )


@pytest.mark.parametrize("seed", range(30))
def test_fused_track_matches_elementwise_on_random_lattices(seed, fuzz_beam):
    segment = _random_segment(seed)
    fused = segment.track(fuzz_beam)
    ref = _track_elementwise(segment.flattened(), fuzz_beam)
    np.testing.assert_allclose(
        fused.particles, ref.particles, rtol=1e-12, atol=1e-16,
        err_msg=f"seed {seed}: {[type(e).__name__ for e in segment.elements]}",
    )
    np.testing.assert_allclose(
        fused.survival_probabilities, ref.survival_probabilities, atol=1e-15
    )
    np.testing.assert_allclose(fused.s, ref.s, rtol=1e-13)
    np.testing.assert_allclose(fused.energy, ref.energy, rtol=1e-13)


@pytest.mark.parametrize("seed", [0, 7, 13, 21, 29])
def test_fused_track_matches_under_jit_and_checkpoint(seed, fuzz_beam):
    segment = _random_segment(seed)
    # Jit with the segment as an argument: leaves are tracers, so idle
    # cavities are conservatively non-skippable — compare against the bespoke
    # element-wise track.
    ref_traced = _track_elementwise(
        segment.flattened(), fuzz_beam, idle_cavity_via_map=False
    )
    jitted = jax.jit(lambda s, b: s.track(b))(segment, fuzz_beam)
    np.testing.assert_allclose(
        jitted.particles, ref_traced.particles, rtol=1e-12, atol=1e-16
    )
    # Eager checkpointed track sees concrete voltages: idle cavities fuse.
    ref_eager = _track_elementwise(segment.flattened(), fuzz_beam)
    ckpt = segment.track_checkpointed(fuzz_beam)
    np.testing.assert_allclose(
        ckpt.particles, ref_eager.particles, rtol=1e-12, atol=1e-16
    )


@pytest.mark.parametrize("seed", range(12))
def test_parameter_beam_fused_matches_elementwise_on_random_lattices(seed):
    """ParameterBeam through random lattices (linear + second_order pool):
    fused brackets + runs == element-wise moment transport."""
    rng = np.random.default_rng(1000 + seed)
    elements = []
    for i in range(int(rng.integers(3, 8))):
        kind = rng.choice(["drift", "quad_linear", "quad_second", "sext", "hcor"])
        L = jnp.asarray(rng.uniform(0.05, 0.8), f64)
        if kind == "drift":
            elements.append(ct.Drift(L, name=f"d{i}"))
        elif kind == "quad_linear":
            elements.append(
                ct.Quadrupole(L, k1=jnp.asarray(rng.uniform(-30, 30), f64), name=f"q{i}")
            )
        elif kind == "quad_second":
            elements.append(
                ct.Quadrupole(
                    L,
                    k1=jnp.asarray(rng.uniform(-30, 30), f64),
                    tracking_method="second_order",
                    name=f"qs{i}",
                )
            )
        elif kind == "sext":
            elements.append(
                ct.Sextupole(
                    L, k2=jnp.asarray(rng.uniform(-80, 80), f64), name=f"s{i}"
                )
            )
        else:
            elements.append(
                ct.HorizontalCorrector(
                    L, angle=jnp.asarray(rng.uniform(-1e-4, 1e-4), f64), name=f"h{i}"
                )
            )
    segment = ct.Segment(elements, name=f"pfuzz_{seed}")

    sigmas = jnp.asarray([1.2e-4, 3e-5, 1.1e-4, 2e-5, 1e-5, 2e-3, 0.0], f64)
    beam = ct.ParameterBeam(
        jnp.zeros(7, f64).at[6].set(1.0),
        jnp.diag(sigmas**2),
        energy=jnp.asarray(1.2e8, f64),
        species=ct.Species("electron"),
    )
    fused = segment.track(beam)
    ref = beam
    for element in segment.elements:
        ref = element.track(ref)
    np.testing.assert_allclose(fused.mu, ref.mu, rtol=1e-10, atol=1e-18)
    np.testing.assert_allclose(fused.cov, ref.cov, rtol=1e-8, atol=1e-22)
    np.testing.assert_allclose(fused.s, ref.s, rtol=1e-13)


@pytest.mark.parametrize("seed", [1, 5, 9, 17, 23])
def test_gradients_match_elementwise_on_random_lattices(seed, fuzz_beam):
    """d(readout)/d(EVERY lattice parameter) — the whole segment pytree at
    once — agrees between the fused plan and element-wise tracking. Fusion
    must preserve not just values but the full parameter sensitivity map
    (the flagship tuning workflow differentiates through the plan)."""
    segment = _random_segment(seed)

    def fused_loss(seg):
        out = seg.track(fuzz_beam)
        return out.sigma_x + 0.5 * out.sigma_y

    def elementwise_loss(seg):
        out = _track_elementwise(seg.flattened(), fuzz_beam)
        return out.sigma_x + 0.5 * out.sigma_y

    grad_fused = jax.grad(fused_loss)(segment)
    grad_ref = jax.grad(elementwise_loss)(segment)

    leaves_fused, tree_fused = jax.tree_util.tree_flatten(grad_fused)
    leaves_ref, tree_ref = jax.tree_util.tree_flatten(grad_ref)
    assert tree_fused == tree_ref
    assert any(bool(jnp.any(leaf != 0)) for leaf in leaves_fused)
    for leaf_fused, leaf_ref in zip(leaves_fused, leaves_ref):
        np.testing.assert_allclose(
            np.asarray(leaf_fused),
            np.asarray(leaf_ref),
            rtol=1e-9,
            atol=1e-14,
            err_msg=f"seed {seed}",
        )
