"""Singularity-free primitives: values and derivatives, including at the
singular points (the analogue of the reference's ``tests/test_autograd.py``)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheetah_tpu.utils import maths

UNARY = {
    "log1pdiv": (maths.log1pdiv, lambda x: np.log1p(x) / x, 1.0),
    "si1mdiv": (
        maths.si1mdiv,
        lambda x: (1 - np.sin(np.sqrt(x)) / np.sqrt(x)) / x,
        1 / 6,
    ),
    "sicos1mdiv": (
        maths.sicos1mdiv,
        lambda x: (1 - np.sin(np.sqrt(x)) / np.sqrt(x) * np.cos(np.sqrt(x))) / x,
        1 / 6,
    ),
    "sipsicos3mdiv": (
        maths.sipsicos3mdiv,
        lambda x: (
            3
            - 4 * np.sin(np.sqrt(x)) / np.sqrt(x)
            + np.sin(np.sqrt(x)) / np.sqrt(x) * np.cos(np.sqrt(x))
        )
        / (2 * x),
        0.0,
    ),
}


@pytest.mark.parametrize("name", UNARY.keys())
def test_unary_values(name):
    """Value matches the plain formula away from 0 and the limit at 0."""
    fn, formula, limit = UNARY[name]
    x = jnp.array([0.5, 1.3, 2.9, 1e-3], dtype=jnp.float64)
    np.testing.assert_allclose(fn(x), formula(np.asarray(x)), rtol=1e-12)
    np.testing.assert_allclose(fn(jnp.zeros((), jnp.float64)), limit, rtol=1e-12)


@pytest.mark.parametrize("name", UNARY.keys())
def test_unary_gradients_match_finite_differences(name):
    fn, _, _ = UNARY[name]
    for x0 in [0.7, 2.1, -0.4, 1e-4]:
        x0 = jnp.array(x0, dtype=jnp.float64)
        grad = jax.grad(fn)(x0)
        eps = 1e-6
        fd = (fn(x0 + eps) - fn(x0 - eps)) / (2 * eps)
        np.testing.assert_allclose(grad, fd, rtol=1e-4, atol=1e-8)


@pytest.mark.parametrize("name", UNARY.keys())
def test_unary_gradient_finite_at_zero(name):
    fn, _, _ = UNARY[name]
    grad = jax.grad(fn)(jnp.zeros((), jnp.float64))
    assert np.isfinite(grad)
    # Gradient at 0 must be the two-sided limit of the gradient.
    eps = 1e-5
    fd = (fn(jnp.array(eps, jnp.float64)) - fn(jnp.array(-eps, jnp.float64))) / (
        2 * eps
    )
    np.testing.assert_allclose(grad, fd, rtol=1e-3, atol=1e-7)


def test_negative_arguments_hyperbolic_branch():
    """For x < 0 the expressions continue via sinh/cosh (complex sqrt in the
    reference, ``autograd.py:127``)."""
    x = jnp.array(-1.7, dtype=jnp.float64)
    sq = np.sqrt(1.7)
    np.testing.assert_allclose(maths.cos_sqrt(x), np.cosh(sq), rtol=1e-12)
    np.testing.assert_allclose(maths.sinc_sqrt(x), np.sinh(sq) / sq, rtol=1e-12)
    np.testing.assert_allclose(
        maths.si1mdiv(x), (1 - np.sinh(sq) / sq) / (-1.7), rtol=1e-12
    )


BINARY_POINTS = [
    (0.8, 0.3),
    (1.5, 1.5),  # a == b
    (0.0, 0.9),
    (0.7, 0.0),
    (0.0, 0.0),
    (-1.1, 0.4),
    (-0.6, -0.6),
]


@pytest.mark.parametrize("a,b", BINARY_POINTS)
def test_cossqrtmcosdivdiff(a, b):
    a = jnp.array(a, jnp.float64)
    b = jnp.array(b, jnp.float64)
    value = maths.cossqrtmcosdivdiff(a, b)
    if a != b:
        expected = (maths.cos_sqrt(b) - maths.cos_sqrt(a)) / (a - b)
        np.testing.assert_allclose(value, expected, rtol=1e-12)
    else:
        np.testing.assert_allclose(value, 0.5 * maths.sinc_sqrt(a), rtol=1e-12)
    grads = jax.grad(maths.cossqrtmcosdivdiff, argnums=(0, 1))(a, b)
    assert all(np.isfinite(g) for g in grads)


@pytest.mark.parametrize("a,b", BINARY_POINTS)
def test_simsidivdiff(a, b):
    a = jnp.array(a, jnp.float64)
    b = jnp.array(b, jnp.float64)
    value = maths.simsidivdiff(a, b)
    if a != b:
        expected = (maths.sinc_sqrt(a) - maths.sinc_sqrt(b)) / (b - a)
        np.testing.assert_allclose(value, expected, rtol=1e-12)
    grads = jax.grad(maths.simsidivdiff, argnums=(0, 1))(a, b)
    assert all(np.isfinite(g) for g in grads)


@pytest.mark.parametrize("a,b", BINARY_POINTS)
def test_si2msi2divdiff(a, b):
    a = jnp.array(a, jnp.float64)
    b = jnp.array(b, jnp.float64)
    value = maths.si2msi2divdiff(a, b)
    if a != b:
        expected = (maths.sinc_sqrt(b) ** 2 - maths.sinc_sqrt(a) ** 2) / (a - b)
        np.testing.assert_allclose(value, expected, rtol=1e-12)
    grads = jax.grad(maths.si2msi2divdiff, argnums=(0, 1))(a, b)
    assert all(np.isfinite(g) for g in grads)


@pytest.mark.parametrize("a,b", [(1.2, 0.5), (2.0, 0.0), (0.8, -0.3)])
def test_sqrta2minusbdiva(a, b):
    a = jnp.array(a, jnp.float64)
    b = jnp.array(b, jnp.float64)
    value = maths.sqrta2minusbdiva(a, b)
    if b != 0:
        np.testing.assert_allclose(
            value, (np.sqrt(a**2 + b) - a) / b, rtol=1e-12
        )
    else:
        np.testing.assert_allclose(value, 1 / (2 * a), rtol=1e-12)
    grads = jax.grad(maths.sqrta2minusbdiva, argnums=(0, 1))(a, b)
    assert all(np.isfinite(g) for g in grads)


def test_gradients_against_reference_autograd():
    """Derivatives agree with the reference's custom autograd functions at
    regular and singular points."""
    from reference_oracle import torch
    from cheetah.utils import autograd as ref_autograd

    pairs = [
        (maths.log1pdiv, ref_autograd.log1pdiv),
        (maths.si1mdiv, ref_autograd.si1mdiv),
        (maths.sicos1mdiv, ref_autograd.sicos1mdiv),
        (maths.sipsicos3mdiv, ref_autograd.sipsicos3mdiv),
    ]
    xs = [0.9, -0.5, 0.0, 2.7, 1e-5]
    for jax_fn, ref_fn in pairs:
        for x0 in xs:
            g_jax = jax.grad(jax_fn)(jnp.array(x0, jnp.float64))
            xt = torch.tensor(x0, dtype=torch.float64, requires_grad=True)
            ref_fn(xt).backward()
            # Near (but not at) 0, the guarded expressions suffer inherent
            # catastrophic cancellation in BOTH implementations (~1e-4
            # relative); only demand agreement to that level there.
            rtol = 1e-10 if (x0 == 0.0 or abs(x0) > 1e-3) else 1e-3
            np.testing.assert_allclose(
                g_jax, xt.grad.item(), rtol=rtol, atol=1e-12, err_msg=str(jax_fn)
            )

    binary_pairs = [
        (maths.cossqrtmcosdivdiff, ref_autograd.cossqrtmcosdivdiff),
        (maths.simsidivdiff, ref_autograd.simsidivdiff),
        (maths.si2msi2divdiff, ref_autograd.si2msi2divdiff),
        (maths.sqrta2minusbdiva, ref_autograd.sqrta2minusbdiva),
    ]
    points = [(0.8, 0.3), (1.5, 1.5), (1.2, 0.0), (2.0, 1.0)]
    for jax_fn, ref_fn in binary_pairs:
        for a0, b0 in points:
            if jax_fn is maths.sqrta2minusbdiva and a0 == b0:
                continue
            g_jax = jax.grad(jax_fn, argnums=(0, 1))(
                jnp.array(a0, jnp.float64), jnp.array(b0, jnp.float64)
            )
            at = torch.tensor(a0, dtype=torch.float64, requires_grad=True)
            bt = torch.tensor(b0, dtype=torch.float64, requires_grad=True)
            ref_fn(at, bt).backward()
            np.testing.assert_allclose(
                g_jax[0], at.grad.item(), rtol=1e-9, atol=1e-12, err_msg=str(jax_fn)
            )
            np.testing.assert_allclose(
                g_jax[1], bt.grad.item(), rtol=1e-9, atol=1e-12, err_msg=str(jax_fn)
            )


def test_cos_sinc_sqrt_pm_matches_separate_calls():
    """The fused both-signs primitive equals the four separate calls, in value
    and in every derivative order used by tracking (grad, jacfwd, no-NaN
    hessian), including at the removable singularity."""
    xs = jnp.array([-30.0, -2.0, -1e-6, 0.0, 1e-6, 2.0, 30.0], jnp.float64)

    fused = maths.cos_sinc_sqrt_pm(xs)
    separate = (
        maths.cos_sqrt(xs),
        maths.sinc_sqrt(xs),
        maths.cos_sqrt(-xs),
        maths.sinc_sqrt(-xs),
    )
    for got, want in zip(fused, separate):
        np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)

    for idx in range(4):
        fused_i = lambda x: maths.cos_sinc_sqrt_pm(x)[idx]  # noqa: B023
        sep_i = [
            maths.cos_sqrt,
            maths.sinc_sqrt,
            lambda x: maths.cos_sqrt(-x),
            lambda x: maths.sinc_sqrt(-x),
        ][idx]
        g_fused = jax.vmap(jax.grad(fused_i))(xs)
        g_sep = jax.vmap(jax.grad(sep_i))(xs)
        # Near 0 both sides evaluate (cos - sinc)/(2x), whose cancellation
        # costs ~eps/|x| relative accuracy — tolerate that, don't mask it.
        np.testing.assert_allclose(g_fused, g_sep, rtol=1e-8, atol=1e-12)
        h_fused = jax.vmap(jax.grad(jax.grad(fused_i)))(xs)
        assert not np.any(np.isnan(h_fused))
        # Away from the cancellation-prone neighbourhood of 0, second
        # derivatives agree too.
        far = np.abs(np.asarray(xs)) > 1e-3
        h_sep = jax.vmap(jax.grad(jax.grad(sep_i)))(xs)
        np.testing.assert_allclose(h_fused[far], h_sep[far], rtol=1e-8)


def test_calculate_quadrupole_coefficients_both_matches_two_calls():
    """bmadx.calculate_quadrupole_coefficients_both == the two separate calls
    of the reference signature (ref ``cheetah/utils/bmadx.py:218-253``)."""
    from cheetah_tpu.utils import bmadx

    k1 = jnp.array([-30.0, -1.0, 0.0, 1e-7, 1.0, 30.0], jnp.float64)
    length = jnp.asarray(0.122, jnp.float64)
    rel_p = 1.0 + jnp.linspace(-0.1, 0.1, 6, dtype=jnp.float64)[None, :]

    def flatten(pair):
        a, c = pair
        return jnp.stack([a[0][0], a[0][1], a[1][0], a[1][1], c[0], c[1], c[2]])

    def two_calls(k1):
        k = k1[..., None] / rel_p
        return jnp.stack(
            [
                flatten(bmadx.calculate_quadrupole_coefficients(-k, length, rel_p)),
                flatten(bmadx.calculate_quadrupole_coefficients(k, length, rel_p)),
            ]
        )

    def fused(k1):
        k = k1[..., None] / rel_p
        tx, ty = bmadx.calculate_quadrupole_coefficients_both(k, length, rel_p)
        return jnp.stack([flatten(tx), flatten(ty)])

    np.testing.assert_allclose(fused(k1), two_calls(k1), rtol=1e-12, atol=1e-13)
    np.testing.assert_allclose(
        jax.jacfwd(fused)(k1), jax.jacfwd(two_calls)(k1), rtol=1e-5, atol=1e-9
    )
    g_fused = jax.grad(lambda k: fused(k).sum())(k1)
    g_two = jax.grad(lambda k: two_calls(k).sum())(k1)
    np.testing.assert_allclose(g_fused, g_two, rtol=1e-5, atol=1e-9)
    assert not np.any(np.isnan(jax.hessian(lambda k: fused(k).sum())(k1)))


def test_cos_sinc_sqrt_pm_large_arguments_match_cosh_range():
    """The fused form must stay finite over jnp.cosh's own range (deriving
    cosh via expm1^2 halves it; the bounded-ratio factoring does not)."""
    import numpy as np

    from cheetah_tpu.utils.maths import cos_sinc_sqrt_pm

    x32 = jnp.asarray(4000.0, jnp.float32)  # sqrt = 63.2; expm1^2 overflows
    _, _, cm32, sm32 = cos_sinc_sqrt_pm(x32)
    assert np.isfinite(float(cm32)) and np.isfinite(float(sm32))
    np.testing.assert_allclose(
        float(cm32), np.cosh(np.sqrt(4000.0)), rtol=1e-5
    )

    x64 = jnp.asarray(3.0e5, jnp.float64)
    _, _, cm64, sm64 = cos_sinc_sqrt_pm(x64)
    np.testing.assert_allclose(
        float(cm64), np.cosh(np.sqrt(3.0e5)), rtol=1e-12
    )
    np.testing.assert_allclose(
        float(sm64), np.sinh(np.sqrt(3.0e5)) / np.sqrt(3.0e5), rtol=1e-12
    )


def test_cos_sinc_sqrt_series_pm_matches_exact():
    """The series + double-angle form agrees with the exact quartet to
    machine precision over its documented validity range |t| <= 4^doublings
    (256 at the default), in both dtypes, including derivatives (it feeds
    the chromatic dkd factorisation)."""
    from cheetah_tpu.utils.maths import cos_sinc_sqrt_pm, cos_sinc_sqrt_series_pm

    t64 = jnp.concatenate(
        [
            jnp.linspace(-1.0, 1.0, 201, dtype=jnp.float64),
            jnp.linspace(-250.0, 250.0, 201, dtype=jnp.float64),
            jnp.asarray([0.0, 1e-30, -1e-30, 1e-8, -1e-8], jnp.float64),
        ]
    )
    exact = cos_sinc_sqrt_pm(t64)
    series = cos_sinc_sqrt_series_pm(t64)
    for e, s in zip(exact, series):
        # scaled-absolute: relative accuracy at the zero crossings of cos
        # is not achievable by ANY formulation (both sides have ~eps
        # absolute error there).
        scale = np.maximum(np.abs(np.asarray(e)), 1.0)
        np.testing.assert_allclose(
            np.asarray(s) / scale, np.asarray(e) / scale, rtol=0.0, atol=2e-14
        )

    t32 = t64.astype(jnp.float32)
    for e, s in zip(cos_sinc_sqrt_pm(t32), cos_sinc_sqrt_series_pm(t32)):
        scale = np.maximum(np.abs(np.asarray(e)), 1.0)
        np.testing.assert_allclose(
            np.asarray(s) / scale, np.asarray(e) / scale, rtol=0.0, atol=1e-5
        )

    # Derivatives: AD of the polynomial equals the analytic derivative of
    # the exact function (the series is term-by-term differentiable). Keep
    # |t| > 1e-6: below that the EXACT quartet's guarded sinc derivative
    # (cos_sqrt - sinc_sqrt) / (2t) cancels catastrophically while the
    # polynomial's AD is exact — the series is the more accurate side there.
    t_far = t64[jnp.abs(t64) > 1e-6]
    for idx in range(4):
        g_series = jax.vmap(jax.grad(lambda t: cos_sinc_sqrt_series_pm(t)[idx]))(
            t_far
        )
        g_exact = jax.vmap(jax.grad(lambda t: cos_sinc_sqrt_pm(t)[idx]))(t_far)
        np.testing.assert_allclose(g_series, g_exact, rtol=1e-9, atol=1e-13)
    # At t = 0 the polynomial's AD hits the analytic limits exactly.
    g0 = [
        float(jax.grad(lambda t: cos_sinc_sqrt_series_pm(t)[idx])(jnp.asarray(0.0)))
        for idx in range(4)
    ]
    np.testing.assert_allclose(g0, [-0.5, -1 / 6, 0.5, 1 / 6], rtol=1e-15)


def test_calculate_quadrupole_coefficients_chromatic_matches_direct():
    """The chromatic (rank-1 factored) quadrupole coefficients equal the
    direct per-particle evaluation to machine precision across strengths and
    momentum spreads. Tolerances are absolute against each coefficient's
    natural scale: where cos crosses zero NO formulation achieves relative
    accuracy (both have ~eps absolute error), so a pure-rtol comparison
    would test the comparison, not the math."""
    from cheetah_tpu.utils import bmadx

    rng = np.random.default_rng(7)

    def flatten(both):
        (tx, dzx), (ty, dzy) = both
        return jnp.stack(
            [
                tx[0][0], tx[0][1], tx[1][0], tx[1][1], *dzx,
                ty[0][0], ty[0][1], ty[1][0], ty[1][1], *dzy,
            ]
        )

    for dtype, tol in ((jnp.float64, 5e-13), (jnp.float32, 3e-4)):
        for k1v, pzmax in [
            (20.0, 0.01), (-20.0, 0.05), (3.0, 0.3), (-0.5, 0.3),
            (0.0, 0.1), (120.0, 0.02), (1e-7, 0.1),
            # halo-grade momentum spread through a strong quad: |t| up to
            # ~69, exercising the double-angle extension of the series
            (120.0, 0.9), (-120.0, 0.9),
        ]:
            k1 = jnp.asarray([[k1v]], dtype)
            length = jnp.asarray(0.35, dtype)
            pz = jnp.asarray(rng.uniform(-pzmax, pzmax, size=(1, 500)), dtype)
            rel_p = 1.0 + pz
            direct = flatten(
                bmadx.calculate_quadrupole_coefficients_both(
                    k1 / rel_p, length, rel_p
                )
            )
            chromatic = flatten(
                bmadx.calculate_quadrupole_coefficients_chromatic(k1, length, pz)
            )
            scale = np.maximum(
                np.max(np.abs(np.asarray(direct)), axis=-1, keepdims=True), 1.0
            )
            np.testing.assert_allclose(
                np.asarray(chromatic) / scale,
                np.asarray(direct) / scale,
                rtol=0.0,
                atol=tol,
                err_msg=f"dtype={dtype} k1={k1v} pzmax={pzmax}",
            )

    # Gradients w.r.t. k1 agree too (the tuning workflow differentiates
    # through the dkd map).
    k1 = jnp.asarray([3.0, -3.0, 0.0], jnp.float64)[:, None]
    pz = jnp.asarray(rng.uniform(-0.05, 0.05, size=(1, 64)), jnp.float64)
    rel_p = 1.0 + pz
    length = jnp.asarray(0.35, jnp.float64)
    g_direct = jax.grad(
        lambda k: flatten(
            bmadx.calculate_quadrupole_coefficients_both(k / rel_p, length, rel_p)
        ).sum()
    )(k1)
    g_chromatic = jax.grad(
        lambda k: flatten(
            bmadx.calculate_quadrupole_coefficients_chromatic(k, length, pz)
        ).sum()
    )(k1)
    np.testing.assert_allclose(g_chromatic, g_direct, rtol=1e-9, atol=1e-10)
