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
