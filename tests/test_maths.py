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
