"""Bmad-X coordinate system and nonlinear tracking kernels.

TPU-native counterpart of ``cheetah/utils/bmadx.py:7-318``. Conventions:
reference quantities (``ref_energy``, ``p0c``, ``mc2``) have the beam's vector
shape ``(...)``; per-particle quantities have shape ``(..., num_particles)``;
``[..., None]`` aligns the two.

Negative focusing strengths route through the even extensions
:func:`~cheetah_tpu.utils.maths.cos_sqrt` / :func:`~cheetah_tpu.utils.maths.sinc_sqrt`
instead of complex arithmetic.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.constants import speed_of_light
from cheetah_tpu.utils.maths import (
    cos_sinc_sqrt_pm,
    cos_sinc_sqrt_series_pm,
    cos_sqrt,
    sinc_sqrt,
)


def cheetah_to_bmad_z_pz(
    tau: Array, delta: Array, ref_energy: Array, mc2: Array
) -> tuple[Array, Array, Array]:
    """Cheetah longitudinal coordinates ``(tau, delta)`` to Bmad ``(z, pz)``
    plus the reference momentum ``p0c`` (ref ``bmadx.py:7-29``)."""
    p0c = jnp.sqrt(jnp.square(ref_energy) - jnp.square(mc2))
    energy = ref_energy[..., None] + delta * p0c[..., None]
    p = jnp.sqrt(jnp.square(energy) - jnp.square(mc2))
    beta = p / energy
    z = -beta * tau
    pz = (p - p0c[..., None]) / p0c[..., None]
    return z, pz, p0c


def bmad_to_cheetah_z_pz(
    z: Array, pz: Array, p0c: Array, mc2: Array
) -> tuple[Array, Array, Array]:
    """Bmad longitudinal coordinates ``(z, pz)`` to Cheetah ``(tau, delta)``
    plus the reference energy (ref ``bmadx.py:32-54``)."""
    ref_energy = jnp.sqrt(jnp.square(p0c) + jnp.square(mc2))
    p = (1.0 + pz) * p0c[..., None]
    energy = jnp.sqrt(jnp.square(p) + jnp.square(mc2))
    beta = p / energy
    tau = -z / beta
    delta = (energy - ref_energy[..., None]) / p0c[..., None]
    return tau, delta, ref_energy


def cheetah_to_bmad_coords(
    cheetah_coords: Array, ref_energy: Array, mc2: Array
) -> tuple[Array, Array]:
    """Full 7D cheetah coordinates to 6D Bmad coordinates plus ``p0c``
    (ref ``bmadx.py:57-82``)."""
    z, pz, p0c = cheetah_to_bmad_z_pz(
        cheetah_coords[..., 4], cheetah_coords[..., 5], ref_energy, mc2
    )
    bmad_coords = jnp.concatenate(
        [cheetah_coords[..., :4], z[..., None], pz[..., None]], axis=-1
    )
    return bmad_coords, p0c


def bmad_to_cheetah_coords(
    bmad_coords: Array, p0c: Array, mc2: Array
) -> tuple[Array, Array]:
    """6D Bmad coordinates to 7D cheetah coordinates plus the reference
    energy (ref ``bmadx.py:85-111``)."""
    tau, delta, ref_energy = bmad_to_cheetah_z_pz(
        bmad_coords[..., 4], bmad_coords[..., 5], p0c, mc2
    )
    cheetah_coords = jnp.concatenate(
        [
            bmad_coords[..., :4],
            tau[..., None],
            delta[..., None],
            jnp.ones_like(tau[..., None]),
        ],
        axis=-1,
    )
    return cheetah_coords, ref_energy


def offset_particle_set(
    x_offset: Array,
    y_offset: Array,
    tilt: Array,
    x_lab: Array,
    px_lab: Array,
    y_lab: Array,
    py_lab: Array,
) -> tuple[Array, Array, Array, Array]:
    """Lab frame to (tilted, offset) element frame (ref ``bmadx.py:114-144``)."""
    s = jnp.sin(tilt)[..., None]
    c = jnp.cos(tilt)[..., None]
    x_int = x_lab - jnp.asarray(x_offset)[..., None]
    y_int = y_lab - jnp.asarray(y_offset)[..., None]
    x_ele = x_int * c + y_int * s
    y_ele = -x_int * s + y_int * c
    px_ele = px_lab * c + py_lab * s
    py_ele = -px_lab * s + py_lab * c
    return x_ele, px_ele, y_ele, py_ele


def offset_particle_unset(
    x_offset: Array,
    y_offset: Array,
    tilt: Array,
    x_ele: Array,
    px_ele: Array,
    y_ele: Array,
    py_ele: Array,
) -> tuple[Array, Array, Array, Array]:
    """Element frame back to lab frame (ref ``bmadx.py:147-177``)."""
    s = jnp.sin(tilt)[..., None]
    c = jnp.cos(tilt)[..., None]
    x_int = x_ele * c - y_ele * s
    y_int = x_ele * s + y_ele * c
    x_lab = x_int + jnp.asarray(x_offset)[..., None]
    y_lab = y_int + jnp.asarray(y_offset)[..., None]
    px_lab = px_ele * c - py_ele * s
    py_lab = px_ele * s + py_ele * c
    return x_lab, px_lab, y_lab, py_lab


def low_energy_z_correction(pz: Array, p0c: Array, mc2: Array, ds: Array) -> Array:
    """Correction of the z-coordinate change for particle speed < c
    (ref ``bmadx.py:180-215``). Returns
    ``dz = (ds - d_particle) + ds (beta - beta_ref) / beta_ref``."""
    p0c_ = p0c[..., None]
    beta = (1 + pz) * p0c_ / jnp.sqrt(jnp.square((1 + pz) * p0c_) + jnp.square(mc2))
    beta0 = p0c / jnp.sqrt(jnp.square(p0c) + jnp.square(mc2))
    e_tot = jnp.sqrt(jnp.square(p0c) + jnp.square(mc2))

    beta0_ = beta0[..., None]
    e_tot_ = e_tot[..., None]
    beta02 = jnp.square(beta0_)
    mc2_over_e2 = jnp.square(mc2 / e_tot_)

    evaluation = mc2 * jnp.square(beta0_ * pz)
    taylor = (
        jnp.asarray(ds)[..., None]
        * pz
        * (
            1
            - 3 * (pz * beta02) / 2
            + jnp.square(pz) * beta02 * (2 * beta02 - mc2_over_e2 / 2)
        )
        * mc2_over_e2
    )
    exact = jnp.asarray(ds)[..., None] * (beta - beta0_) / beta0_
    return jnp.where(evaluation < 3e-7 * e_tot_, taylor, exact)


def calculate_quadrupole_coefficients(
    k1: Array, length: Array, rel_p: Array
) -> tuple[list[list[Array]], list[Array]]:
    """2x2 quadrupole transfer-matrix entries and z-change coefficients for one
    drift-kick-drift step (ref ``bmadx.py:218-253``).

    :param k1: Quadrupole strength (``k1 > 0`` means defocusing), per particle.
    :param length: Step length.
    :param rel_p: Relative momentum ``P/P0`` per particle.
    :return: ``[[a11, a12], [a21, a22]]`` and ``[c1, c2, c3]`` with
        ``z += c1 x0^2 + c2 x0 px0 + c3 px0^2``.
    """
    length_ = jnp.asarray(length)[..., None]
    arg = -k1 * jnp.square(length_)
    cx = cos_sqrt(arg)
    sx = sinc_sqrt(arg) * length_

    a11 = cx
    a12 = sx / rel_p
    a21 = k1 * sx * rel_p
    a22 = cx

    c1 = k1 * (-cx * sx + length_) / 4
    c2 = -k1 * jnp.square(sx) / (2 * rel_p)
    c3 = -(cx * sx + length_) / (4 * jnp.square(rel_p))

    return [[a11, a12], [a21, a22]], [c1, c2, c3]


def _quad_plane(
    k1: Array, cx: Array, si: Array, length_: Array, rel_p: Array
) -> tuple[list[list[Array]], list[Array]]:
    """Assemble one plane's 2x2 matrix and z-change coefficients from the
    focusing functions ``cx = cos_sqrt(-k1 L^2)`` and ``si = sinc_sqrt(-k1 L^2)``."""
    sx = si * length_
    a = [[cx, sx / rel_p], [k1 * sx * rel_p, cx]]
    c = [
        k1 * (-cx * sx + length_) / 4,
        -k1 * jnp.square(sx) / (2 * rel_p),
        -(cx * sx + length_) / (4 * jnp.square(rel_p)),
    ]
    return a, c


def calculate_quadrupole_coefficients_both(
    k1: Array, length: Array, rel_p: Array
) -> tuple[
    tuple[list[list[Array]], list[Array]], tuple[list[list[Array]], list[Array]]
]:
    """Coefficients of BOTH transverse planes of a quadrupole — the
    ``(-k1, +k1)`` pair the drift-kick-drift step needs — from one shared
    transcendental evaluation (ref ``bmadx.py:218-253`` called twice).

    Returns ``((tx, dzx), (ty, dzy))``, exactly equal to
    ``(calculate_quadrupole_coefficients(-k1, length, rel_p),
    calculate_quadrupole_coefficients(k1, length, rel_p))`` but ~5x cheaper
    in transcendental count: the two planes' arguments are ``+-k1 L^2``, so
    :func:`~cheetah_tpu.utils.maths.cos_sinc_sqrt_pm` serves both from a
    single ``sqrt``/``cos``/``sin``/``expm1``.
    """
    length_ = jnp.asarray(length)[..., None]
    u = k1 * jnp.square(length_)  # arg of the x plane (strength -k1)
    cx, six, cy, siy = cos_sinc_sqrt_pm(u)
    return (
        _quad_plane(-k1, cx, six, length_, rel_p),
        _quad_plane(k1, cy, siy, length_, rel_p),
    )


def calculate_quadrupole_coefficients_chromatic(
    k1_design: Array, length: Array, pz: Array
) -> tuple[
    tuple[list[list[Array]], list[Array]], tuple[list[list[Array]], list[Array]]
]:
    """Both planes' quadrupole dkd coefficients with the chromatic
    (momentum) dependence factored out of the transcendentals.

    Numerically equal (to machine precision) to
    :func:`calculate_quadrupole_coefficients_both` called with
    ``k1 = k1_design / rel_p``, but the focusing-function argument
    ``u / rel_p`` (``u = k1_design L^2``) is *rank-1* — an outer product of a
    per-lattice-instance factor and a per-particle factor — so the addition
    formulas split each evaluation exactly into

    - the design-momentum quartet ``F(+-u), G(+-u)``
      (:func:`~cheetah_tpu.utils.maths.cos_sinc_sqrt_pm` at the *instance*
      shape — 4 transcendentals per lattice instance),
    - one ``sqrt`` per *particle* (``eta = 1/sqrt(1+pz) - 1``, via the
      cancellation-free :func:`sqrt_one`), and
    - a pure-FMA Taylor polynomial
      (:func:`~cheetah_tpu.utils.maths.cos_sinc_sqrt_series_pm`) at the
      small argument ``t = u eta^2`` on the full instance x particle shape.

    With ``F = cos_sqrt``, ``G = sinc_sqrt``, ``w = 1/rel_p = (1 + eta)^2``::

        F(a w) = F(a) F(a eta^2) - a eta G(a) G(a eta^2)
        G(a w) = (G(a) F(a eta^2) + F(a) eta G(a eta^2)) / (1 + eta)

    (exact for both signs of ``a`` — the identities continue analytically
    through the trigonometric/hyperbolic branches).

    Zero per-(instance x particle) transcendentals remain: on TPU this turns
    the dkd quadrupole from VPU-transcendental-bound into FMA-bound
    (measured ~2x on the 4096x10k vectorised env step, PERF_NOTES.md).

    Validity: machine-precision agreement requires
    ``|t| = |u| eta^2 <= 256`` (the polynomial's double-angle reduction
    range), i.e. ``sqrt(|k1|) L |eta| <= 16`` — e.g. ``pz = -0.97`` through
    a ``k1 = 120 / m^2``, ``L = 0.35 m`` quad still agrees to 10 digits;
    physical beams (``|pz| ~ 1e-2``) sit at ``|t| ~ 1e-4 |u|``, orders of
    magnitude inside. The truncation error grows polynomially beyond. See
    ``tests/test_maths.py``/``tests/test_compare_bmadx_dkd.py`` for sweeps.

    :param k1_design: Design quadrupole strength (NOT divided by ``rel_p``),
        broadcastable against the particle axis (e.g. shape ``(..., 1)``).
    :param length: Step length.
    :param pz: Bmad momentum deviation per particle; ``rel_p = 1 + pz``.
    :return: Same structure as
        :func:`calculate_quadrupole_coefficients_both`.
    """
    rel_p = 1.0 + pz
    length_ = jnp.asarray(length)[..., None]
    u = k1_design * jnp.square(length_)  # x-plane design arg (strength -k1)

    fu, gu, fmu, gmu = cos_sinc_sqrt_pm(u)

    s1 = sqrt_one(pz)  # sqrt(rel_p) - 1, exact relative precision
    inv_1p_eta = 1.0 + s1  # 1/(1 + eta) = sqrt(rel_p)
    eta = -s1 / inv_1p_eta  # 1/sqrt(rel_p) - 1, exact relative precision

    t = u * jnp.square(eta)
    ft, gt, fmt, gmt = cos_sinc_sqrt_series_pm(t)

    u_eta = u * eta
    cx = fu * ft - u_eta * (gu * gt)
    six = (gu * ft + fu * (eta * gt)) * inv_1p_eta
    cy = fmu * fmt + u_eta * (gmu * gmt)
    siy = (gmu * fmt + fmu * (eta * gmt)) * inv_1p_eta

    k1 = k1_design / rel_p
    return (
        _quad_plane(-k1, cx, six, length_, rel_p),
        _quad_plane(k1, cy, siy, length_, rel_p),
    )


def sqrt_one(x: Array) -> Array:
    """``sqrt(1 + x) - 1`` to machine precision (ref ``bmadx.py:256-261``)."""
    sq = jnp.sqrt(1 + x)
    return x / (sq + 1)


def track_a_drift(
    length: Array,
    x_in: Array,
    px_in: Array,
    y_in: Array,
    py_in: Array,
    z_in: Array,
    pz_in: Array,
    p0c: Array,
    mc2: Array,
) -> tuple[Array, Array, Array]:
    """Exact (nonlinear) drift tracking (ref ``bmadx.py:264-296``)."""
    P = 1.0 + pz_in
    Px = px_in / P
    Py = py_in / P
    Pxy2 = jnp.square(Px) + jnp.square(Py)
    Pl = jnp.sqrt(1.0 - Pxy2)

    length_ = jnp.asarray(length)[..., None]
    dz = length_ * (
        sqrt_one(
            (jnp.square(mc2) * (2 * pz_in + jnp.square(pz_in)))
            / (jnp.square(p0c[..., None] * P) + jnp.square(mc2))
        )
        + sqrt_one(-Pxy2) / Pl
    )

    x_out = x_in + length_ * Px / Pl
    y_out = y_in + length_ * Py / Pl
    z_out = z_in + dz
    return x_out, y_out, z_out


def particle_rf_time(z: Array, pz: Array, p0c: Array, mc2: Array) -> Array:
    """RF arrival time of each particle (ref ``bmadx.py:299-308``)."""
    p0c_ = p0c[..., None]
    beta = (1 + pz) * p0c_ / jnp.sqrt(jnp.square((1 + pz) * p0c_) + jnp.square(mc2))
    return -z / (beta * speed_of_light)


def sinc(x: Array) -> Array:
    """``sin(x) / x`` with value 1 at 0."""
    return jnp.sinc(x / jnp.pi)


def cosc(x: Array) -> Array:
    """``(cos(x) - 1) / x^2 = -0.5 sinc(x/2)^2``."""
    return -0.5 * jnp.square(sinc(x / 2))
