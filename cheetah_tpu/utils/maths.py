"""Singularity-free compound expressions with custom derivatives.

TPU-native counterpart of the reference's custom autograd functions
(``cheetah/utils/autograd.py:4-74``): each compound expression that appears in
transfer-map physics has a removable singularity whose value *and* derivative
are replaced by their analytic limits, implemented with ``jax.custom_jvp`` and
``jnp.where`` guards (safe denominators keep NaNs out of both branches).

Unlike the reference, which routes ``cos(sqrt(x))``-style terms through complex
arithmetic for negative ``x`` (``autograd.py:127``), we use the real-valued
even/odd extensions ``cos``/``cosh`` and ``sinc``/``sinch`` — branch-free
elementwise VPU code with no complex support required.

Coverage: 8 of the reference's 9 primitives. The ninth,
``sicoskuddelmuddel15mdiv`` (``autograd.py:330-404``), is unused by the
reference's own physics (nothing calls it) and is deliberately not
implemented here.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax import Array


def _safe(x: Array, where_bad: Array) -> Array:
    """Replace entries where ``where_bad`` with 1 so they can be divided by."""
    return jnp.where(where_bad, jnp.ones_like(x), x)


@jax.custom_jvp
def cos_sqrt(x: Array) -> Array:
    r"""``cos(sqrt(x))`` extended evenly to negative ``x`` via ``cosh(sqrt(-x))``.

    Equivalent of ``torch.complex(x, 0).sqrt().cos().real`` in the reference
    (``cheetah/track_methods.py:44-47``) without complex arithmetic.
    """
    xp = jnp.sqrt(jnp.clip(x, min=0.0))
    xn = jnp.sqrt(jnp.clip(-x, min=0.0))
    return jnp.where(x >= 0, jnp.cos(xp), jnp.cosh(xn))


@jax.custom_jvp
def sinc_sqrt(x: Array) -> Array:
    r"""``si(sqrt(x)) = sin(sqrt(x))/sqrt(x)``, evenly extended; 1 at ``x = 0``.

    Equivalent of ``(sqrt(complex(x))/pi).sinc().real`` in the reference
    (``cheetah/track_methods.py:48-49``).
    """
    xp = jnp.sqrt(jnp.clip(x, min=0.0))
    xn = jnp.sqrt(jnp.clip(-x, min=0.0))
    pos = jnp.sin(xp) / _safe(xp, xp == 0)
    neg = jnp.sinh(xn) / _safe(xn, xn == 0)
    return jnp.where(x == 0, jnp.ones_like(x), jnp.where(x >= 0, pos, neg))


@jax.custom_jvp
def cos_sinc_sqrt_pm(x: Array) -> tuple[Array, Array, Array, Array]:
    r"""``(cos_sqrt(x), sinc_sqrt(x), cos_sqrt(-x), sinc_sqrt(-x))`` from ONE
    shared set of transcendentals.

    The quadrupole drift-kick-drift map needs the focusing functions of both
    transverse planes, whose arguments are ``+x`` and ``-x`` — i.e. the trig
    and hyperbolic branches of the *same* ``s = sqrt(|x|)``. Evaluating
    :func:`cos_sqrt` / :func:`sinc_sqrt` four times costs ~22 transcendental
    ops per element (each call computes two sqrts plus both branches); this
    fused form costs 4 (``sqrt``, ``cos``, ``sin``, ``expm1``), which is what
    makes the closed-form dkd step VPU-affordable on TPU.

    ``cosh``/``sinh`` are derived from ``expm1`` without cancellation:
    ``cosh(s) - 1 = em^2 / (2 (1 + em))`` and
    ``sinh(s) = em (2 + em) / (2 (1 + em))`` with ``em = expm1(s)``,
    factored through the bounded ratio ``em / (1 + em)`` so no intermediate
    squares ``em`` — the finite range matches ``jnp.cosh``'s own overflow
    threshold instead of halving it.
    """
    s = jnp.sqrt(jnp.abs(x))
    c = jnp.cos(s)
    sn = jnp.sin(s)
    em = jnp.expm1(s)
    ratio = em / (1.0 + em)  # in [0, 1) for s >= 0
    ch = 1.0 + 0.5 * em * ratio
    sh = 0.5 * ratio * (2.0 + em)
    s_safe = _safe(s, s == 0)
    one = jnp.ones_like(s)
    sinc_trig = jnp.where(s == 0, one, sn / s_safe)
    sinc_hyp = jnp.where(s == 0, one, sh / s_safe)
    pos = x >= 0
    c_pos = jnp.where(pos, c, ch)
    si_pos = jnp.where(pos, sinc_trig, sinc_hyp)
    c_neg = jnp.where(pos, ch, c)
    si_neg = jnp.where(pos, sinc_hyp, sinc_trig)
    return c_pos, si_pos, c_neg, si_neg


@cos_sinc_sqrt_pm.defjvp
def _cos_sinc_sqrt_pm_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    cp, sp, cm, sm = cos_sinc_sqrt_pm(x)
    # d/dx cos_sqrt(x) = -si(sqrt(x))/2 holds for all x (entire even function);
    # d/dx si(sqrt(x)) = (cos_sqrt(x) - si(sqrt(x))) / (2x), limit -1/6.
    two_x = _safe(2.0 * x, x == 0)
    dsp = jnp.where(x == 0, jnp.full_like(x, -1.0 / 6.0), (cp - sp) / two_x)
    dsm = jnp.where(x == 0, jnp.full_like(x, 1.0 / 6.0), (cm - sm) / two_x)
    return (cp, sp, cm, sm), (
        -0.5 * sp * dx,
        dsp * dx,
        0.5 * sm * dx,
        dsm * dx,
    )


def cos_sinc_sqrt_series_pm(
    t: Array, doublings: int = 4
) -> tuple[Array, Array, Array, Array]:
    r"""``(cos_sqrt(t), sinc_sqrt(t), cos_sqrt(-t), sinc_sqrt(-t))`` by
    truncated Taylor series plus double-angle reduction — pure FMA chains,
    zero transcendentals.

    ``cos_sqrt`` and ``sinc_sqrt`` are entire functions of their argument,

    .. math::
        F(t) = \sum_k \frac{(-t)^k}{(2k)!}, \qquad
        G(t) = \sum_k \frac{(-t)^k}{(2k+1)!},

    so for bounded argument a fixed-length Horner evaluation is exact to
    machine precision: with the dtype-dependent term counts used here the
    series truncation error at reduced argument 1 is ``1/14!`` (float32)
    resp. ``1/22!`` (float64) — below the dtype epsilon. The series is
    evaluated at ``t / 4^doublings`` and walked back up with the
    double-angle identities ``F(4s) = 2 F(s)^2 - 1`` and
    ``G(4s) = G(s) F(s)`` (valid on BOTH the trigonometric and hyperbolic
    branches), which extends the machine-precision validity range to
    ``|t| <= 4^doublings`` (256 at the default) at ~6 extra FMAs per step.
    Each of the two symmetric chain pairs shares its even/odd Horner parts:
    ``hF(v) = E_F(v^2) + v O_F(v^2)`` serves ``+-t`` from one power set.

    Beyond ``|t| = 4^doublings`` the truncation error grows polynomially
    (callers document their argument bound); the result is garbage there
    but stays finite until the leading Horner term itself overflows
    (``|t| ~ 4^doublings * 10^5`` in float32).

    This is the per-particle half of the chromatic factorisation used by
    :func:`cheetah_tpu.utils.bmadx.calculate_quadrupole_coefficients_chromatic`:
    it moves every per-particle transcendental of the quadrupole
    drift-kick-drift map into this polynomial, which on TPU turns the map
    from VPU-transcendental-bound into plain FMA throughput.
    """
    num_terms = 11 if t.dtype == jnp.float64 else 7
    # Work with P = F - 1 (the versine) so the double-angle walk
    # P_new = 2 P (P + 2) is a pure product — no cancellation, so relative
    # precision is PRESERVED for small total phase (the physical case)
    # instead of losing the worst-case factor 4^doublings in ulps that the
    # naive F_new = 2 F^2 - 1 recurrence costs.
    #   hF(v) - 1 = sum_{k>=1} v^k/(2k)!       = v (E_P(v^2) + v O_P(v^2))
    #   hG(v)     = sum_{k>=0} v^k/(2k+1)!     = E_G(v^2) + v O_G(v^2)
    # with F(t) = hF(-t), G(t) = hG(-t); the -t outputs flip the odd parts.
    even_p = [1.0 / math.factorial(4 * j + 2) for j in range((num_terms + 1) // 2)]
    odd_p = [1.0 / math.factorial(4 * j + 4) for j in range(num_terms // 2)]
    even_g = [1.0 / math.factorial(4 * j + 1) for j in range((num_terms + 1) // 2)]
    odd_g = [1.0 / math.factorial(4 * j + 3) for j in range(num_terms // 2)]

    def horner(coeffs, v):
        acc = jnp.full_like(v, coeffs[-1])
        for c in reversed(coeffs[:-1]):
            acc = acc * v + c
        return acc

    s = -t * (0.25**doublings)  # exact power-of-two scaling
    w = jnp.square(s)
    ep, op = horner(even_p, w), s * horner(odd_p, w)
    eg, og = horner(even_g, w), s * horner(odd_g, w)
    pt, gt = s * (ep + op), eg + og  # F-1, G at the reduced +t
    pmt, gmt = -s * (ep - op), eg - og  # F-1, G at the reduced -t
    for _ in range(doublings):
        gt = gt * (1.0 + pt)
        pt = 2.0 * pt * (2.0 + pt)
        gmt = gmt * (1.0 + pmt)
        pmt = 2.0 * pmt * (2.0 + pmt)
    return 1.0 + pt, gt, 1.0 + pmt, gmt


def _dsinc_sqrt(x: Array) -> Array:
    """d/dx si(sqrt(x)) = (cos(sqrt(x)) - si(sqrt(x))) / (2x); limit -1/6."""
    return jnp.where(
        x == 0,
        jnp.full_like(x, -1.0 / 6.0),
        (cos_sqrt(x) - sinc_sqrt(x)) / (2.0 * _safe(x, x == 0)),
    )


@cos_sqrt.defjvp
def _cos_sqrt_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    # d/dx cos(sqrt(x)) = -si(sqrt(x)) / 2 (entire function, no singularity).
    return cos_sqrt(x), -0.5 * sinc_sqrt(x) * dx


@sinc_sqrt.defjvp
def _sinc_sqrt_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    return sinc_sqrt(x), _dsinc_sqrt(x) * dx


@jax.custom_jvp
def log1pdiv(x: Array) -> Array:
    """``log(1 + x) / x`` with its singularity at 0 removed (ref ``autograd.py:77``)."""
    return jnp.where(x == 0, jnp.ones_like(x), jnp.log1p(x) / _safe(x, x == 0))


@log1pdiv.defjvp
def _log1pdiv_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    fx = log1pdiv(x)
    grad = jnp.where(
        x == 0,
        jnp.full_like(x, -0.5),
        (1.0 / (1.0 + x) - fx) / _safe(x, x == 0),
    )
    return fx, grad * dx


@jax.custom_jvp
def si1mdiv(x: Array) -> Array:
    """``(1 - si(sqrt(x))) / x`` with limit 1/6 at 0 (ref ``autograd.py:108``)."""
    return jnp.where(
        x == 0,
        jnp.full_like(x, 1.0 / 6.0),
        (1.0 - sinc_sqrt(x)) / _safe(x, x == 0),
    )


@si1mdiv.defjvp
def _si1mdiv_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    fx = si1mdiv(x)
    # f'(x) = (-si'(sqrt(x)) - f) / x with -si' = (si - cos)/(2x); limit -1/120.
    sx = (sinc_sqrt(x) - cos_sqrt(x)) / (2.0 * _safe(x, x == 0))
    grad = jnp.where(
        x == 0, jnp.full_like(x, -1.0 / 120.0), (sx - fx) / _safe(x, x == 0)
    )
    return fx, grad * dx


@jax.custom_jvp
def sicos1mdiv(x: Array) -> Array:
    """``(1 - si(sqrt(x)) cos(sqrt(x))) / x`` with limit 1/6 (ref ``autograd.py:149``)."""
    return jnp.where(
        x == 0,
        jnp.full_like(x, 1.0 / 6.0),
        (1.0 - sinc_sqrt(x) * cos_sqrt(x)) / _safe(x, x == 0),
    )


@sicos1mdiv.defjvp
def _sicos1mdiv_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    cx = cos_sqrt(x)
    sx = sinc_sqrt(x)
    x2 = _safe(x * x, x == 0)
    grad = jnp.where(
        x == 0,
        jnp.full_like(x, -2.0 / 15.0),
        (sx * (x * sx + 2.0 * cx) - 2.0 - cx * cx + sx * cx) / (2.0 * x2),
    )
    return sicos1mdiv(x), grad * dx


@jax.custom_jvp
def sipsicos3mdiv(x: Array) -> Array:
    """``(3 - 4 si(sqrt(x)) + si(sqrt(x)) cos(sqrt(x))) / (2x)``, limit 0
    (ref ``autograd.py:209``)."""
    return jnp.where(
        x == 0,
        jnp.zeros_like(x),
        (3.0 - 4.0 * sinc_sqrt(x) + sinc_sqrt(x) * cos_sqrt(x))
        / (2.0 * _safe(x, x == 0)),
    )


@sipsicos3mdiv.defjvp
def _sipsicos3mdiv_jvp(primals, tangents):
    (x,) = primals
    (dx,) = tangents
    cx = cos_sqrt(x)
    sx = sinc_sqrt(x)
    x2 = _safe(x * x, x == 0)
    grad = jnp.where(
        x == 0,
        jnp.full_like(x, 0.05),
        (
            -sx * (x * sx + 2.0 * cx - 8.0)
            - 6.0
            + 4.0 * sx
            + cx * cx
            - (4.0 + sx) * cx
        )
        / (4.0 * x2),
    )
    return sipsicos3mdiv(x), grad * dx


@jax.custom_jvp
def cossqrtmcosdivdiff(a: Array, b: Array) -> Array:
    """``(cos(sqrt(b)) - cos(sqrt(a))) / (a - b)``, limit ``si(sqrt(a))/2`` at
    ``a == b`` (ref ``autograd.py:361``)."""
    a, b = jnp.broadcast_arrays(a, b)
    diff = _safe(a - b, a == b)
    return jnp.where(a == b, 0.5 * sinc_sqrt(a), (cos_sqrt(b) - cos_sqrt(a)) / diff)


@cossqrtmcosdivdiff.defjvp
def _cossqrtmcosdivdiff_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    a, b = jnp.broadcast_arrays(a, b)
    da, db = jnp.broadcast_arrays(
        jnp.broadcast_to(da, a.shape), jnp.broadcast_to(db, b.shape)
    )
    sa = sinc_sqrt(a)
    sb = sinc_sqrt(b)
    ca = cos_sqrt(a)
    cb = cos_sqrt(b)
    ab = a - b
    cbca = cb - ca
    denom = _safe(ab * ab, a == b)
    limit = jnp.where(
        a == 0,
        jnp.full_like(a, -1.0 / 24.0),
        (ca - sa) / (8.0 * _safe(a, a == 0)),
    )
    grad_a = jnp.where(a == b, limit, (0.5 * sa * ab - cbca) / denom)
    grad_b = jnp.where(a == b, limit, -(0.5 * sb * ab - cbca) / denom)
    return cossqrtmcosdivdiff(a, b), grad_a * da + grad_b * db


@jax.custom_jvp
def simsidivdiff(a: Array, b: Array) -> Array:
    """``(si(sqrt(a)) - si(sqrt(b))) / (b - a)`` with nested limits at ``a == b``
    and ``b == 0`` (ref ``autograd.py:433``)."""
    a, b = jnp.broadcast_arrays(a, b)
    diff = _safe(b - a, a == b)
    aeqb_limit = jnp.where(
        b == 0,
        jnp.full_like(b, 1.0 / 6.0),
        0.5 * (sinc_sqrt(b) - cos_sqrt(b)) / _safe(b, b == 0),
    )
    return jnp.where(a == b, aeqb_limit, (sinc_sqrt(a) - sinc_sqrt(b)) / diff)


@simsidivdiff.defjvp
def _simsidivdiff_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    a, b = jnp.broadcast_arrays(a, b)
    da = jnp.broadcast_to(da, a.shape)
    db = jnp.broadcast_to(db, b.shape)
    sa = sinc_sqrt(a)
    sb = sinc_sqrt(b)
    ca = cos_sqrt(a)
    cb = cos_sqrt(b)
    ba = _safe(b - a, a == b)
    a_safe = _safe(a, a == 0)
    b_safe = _safe(b, b == 0)

    a0_b0_limit = jnp.full_like(a, -1.0 / 120.0)
    aeqb_limit = jnp.where(
        b == 0, a0_b0_limit, (3.0 * cb + (b - 3.0) * sb) / (8.0 * b_safe * b_safe)
    )
    aneqb_a0_limit = (1.0 - b / 6.0 - sb) / (b_safe * b_safe)
    aneqb_b0_limit = (1.0 - a / 6.0 - sa) / (a_safe * a_safe)

    grad_a = jnp.where(
        (a != b) & (a != 0),
        (ca - sa) / (2.0 * a_safe * ba) + (sa - sb) / (ba * ba),
        jnp.where(a != b, aneqb_a0_limit, aeqb_limit),
    )
    grad_b = jnp.where(
        (a != b) & (b != 0),
        -(cb - sb) / (2.0 * b_safe * ba) + (sb - sa) / (ba * ba),
        jnp.where(a != b, aneqb_b0_limit, aeqb_limit),
    )
    return simsidivdiff(a, b), grad_a * da + grad_b * db


@jax.custom_jvp
def si2msi2divdiff(a: Array, b: Array) -> Array:
    """``(si^2(sqrt(b)) - si^2(sqrt(a))) / (a - b)`` with nested limits
    (ref ``autograd.py:546``)."""
    a, b = jnp.broadcast_arrays(a, b)
    diff = _safe(a - b, a == b)
    sb = sinc_sqrt(b)
    cb = cos_sqrt(b)
    aeqb_limit = jnp.where(
        b == 0,
        jnp.full_like(b, 1.0 / 3.0),
        (1.0 - cb * cb - b * sb * cb) / _safe(b * b, b == 0),
    )
    sa = sinc_sqrt(a)
    return jnp.where(a == b, aeqb_limit, (sb * sb - sa * sa) / diff)


@si2msi2divdiff.defjvp
def _si2msi2divdiff_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    a, b = jnp.broadcast_arrays(a, b)
    da = jnp.broadcast_to(da, a.shape)
    db = jnp.broadcast_to(db, b.shape)
    sa = sinc_sqrt(a)
    sb = sinc_sqrt(b)
    ca = cos_sqrt(a)
    cb = cos_sqrt(b)
    ab = _safe(a - b, a == b)
    a_safe = _safe(a, a == 0)
    b_safe = _safe(b, b == 0)

    a0_limit = (b - b * b / 3.0 + cb * cb - 1.0) / (b_safe**3)
    b0_limit = (a - a * a / 3.0 + ca * ca - 1.0) / (a_safe**3)
    aeqbeq0_limit = jnp.full_like(a, -2.0 / 45.0)
    aeqb_limit = jnp.where(
        b == 0,
        aeqbeq0_limit,
        (5.0 * b * sb * cb - (b - 2.0) * (2.0 * cb * cb - 1.0) - 2.0)
        / (4.0 * b_safe**3),
    )
    grad_a = jnp.where(
        (a != b) & (a != 0),
        (-ab * sa * (ca - sa) / a_safe + sa * sa - sb * sb) / (ab * ab),
        jnp.where(a == b, aeqb_limit, a0_limit),
    )
    grad_b = jnp.where(
        (a != b) & (b != 0),
        (ab * sb * (cb - sb) / b_safe + sb * sb - sa * sa) / (ab * ab),
        jnp.where(a == b, aeqb_limit, b0_limit),
    )
    return si2msi2divdiff(a, b), grad_a * da + grad_b * db


@jax.custom_jvp
def sqrta2minusbdiva(a: Array, b: Array) -> Array:
    """``(sqrt(a^2 + b) - a) / b`` with limit ``1 / (2a)`` at ``b == 0``
    (ref ``autograd.py:652``)."""
    a, b = jnp.broadcast_arrays(a, b)
    b_safe = _safe(b, b == 0)
    return jnp.where(
        b == 0,
        1.0 / (2.0 * a),
        (jnp.sqrt(a * a + b) - a) / b_safe,
    )


@sqrta2minusbdiva.defjvp
def _sqrta2minusbdiva_jvp(primals, tangents):
    a, b = primals
    da, db = tangents
    a, b = jnp.broadcast_arrays(a, b)
    da = jnp.broadcast_to(da, a.shape)
    db = jnp.broadcast_to(db, b.shape)
    b_safe = _safe(b, b == 0)
    root = jnp.sqrt(a * a + b)
    grad_a = jnp.where(
        b == 0, -1.0 / (2.0 * a * a), (a / root - 1.0) / b_safe
    )
    grad_b = jnp.where(
        b == 0,
        -1.0 / (8.0 * a**3),
        ((-2.0 * a * a - b) / root + 2.0 * a) / (2.0 * b_safe * b_safe),
    )
    return sqrta2minusbdiva(a, b), grad_a * da + grad_b * db
