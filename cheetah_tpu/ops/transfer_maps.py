"""First- and second-order universal transfer maps.

TPU-native counterpart of ``cheetah/track_methods.py:17-382``. The augmented
7th phase-space coordinate (constant 1) makes thin kicks and misalignments
expressible as matrix multiplication. All functions broadcast over arbitrary
leading vector dimensions and are fully differentiable (the near-singular
compound expressions route through :mod:`cheetah_tpu.utils.maths`).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.maths import (
    cos_sqrt,
    cossqrtmcosdivdiff,
    si1mdiv,
    si2msi2divdiff,
    sicos1mdiv,
    simsidivdiff,
    sinc_sqrt,
    sipsicos3mdiv,
)
from cheetah_tpu.utils.physics import compute_relativistic_factors


def _eye7(vector_shape: tuple[int, ...], dtype) -> Array:
    return jnp.broadcast_to(jnp.eye(7, dtype=dtype), (*vector_shape, 7, 7))


def base_rmatrix(
    length: Array,
    k1: Array,
    hx: Array,
    species: Species,
    energy: Array | None = None,
) -> Array:
    """First-order universal 7x7 map for combined-function magnets
    (ref ``track_methods.py:17-77``).

    :param length: Length of the element in m.
    :param k1: Quadrupole strength in 1/m^2.
    :param hx: Curvature (1/radius) of the element in 1/m.
    :param species: Particle species of the beam.
    :param energy: Beam energy in eV.
    """
    length = jnp.asarray(length)
    k1 = jnp.asarray(k1)
    hx = jnp.asarray(hx)
    energy = jnp.asarray(energy if energy is not None else 0.0)

    _, igamma2, beta = compute_relativistic_factors(energy, species.mass_eV)

    length, k1, hx, igamma2, beta = jnp.broadcast_arrays(
        length, k1, hx, igamma2, beta
    )
    dtype = length.dtype

    kx2 = k1 + jnp.square(hx)
    ky2 = -k1
    L2 = jnp.square(length)
    cx = cos_sqrt(kx2 * L2)
    cy = cos_sqrt(ky2 * L2)
    sx = sinc_sqrt(kx2 * L2) * length
    sy = sinc_sqrt(ky2 * L2) * length

    r2 = jnp.square(sinc_sqrt(0.25 * kx2 * L2))
    dx = hx * 0.5 * L2 * r2

    r56 = (
        jnp.square(hx) * length**3 * si1mdiv(kx2 * L2) / jnp.square(beta)
        - length / jnp.square(beta) * igamma2
    )

    R = _eye7(length.shape, dtype)
    R = R.at[..., 0, 0].set(cx)
    R = R.at[..., 0, 1].set(sx)
    R = R.at[..., 0, 5].set(dx / beta)
    R = R.at[..., 1, 0].set(-kx2 * sx)
    R = R.at[..., 1, 1].set(cx)
    R = R.at[..., 1, 5].set(sx * hx / beta)
    R = R.at[..., 2, 2].set(cy)
    R = R.at[..., 2, 3].set(sy)
    R = R.at[..., 3, 2].set(-ky2 * sy)
    R = R.at[..., 3, 3].set(cy)
    R = R.at[..., 4, 0].set(sx * hx / beta)
    R = R.at[..., 4, 1].set(dx / beta)
    R = R.at[..., 4, 5].set(r56)
    return R


def drift_matrix(length: Array, energy: Array, species: Species) -> Array:
    """First-order map of a drift space (ref ``track_methods.py:284-299``)."""
    length = jnp.asarray(length)
    _, igamma2, beta = compute_relativistic_factors(energy, species.mass_eV)
    length, igamma2, beta = jnp.broadcast_arrays(length, igamma2, beta)

    R = _eye7(length.shape, length.dtype)
    R = R.at[..., 0, 1].set(length)
    R = R.at[..., 2, 3].set(length)
    R = R.at[..., 4, 5].set(-length / jnp.square(beta) * igamma2)
    return R


def rotation_matrix(angle: Array) -> Array:
    """Coordinate rotation in the x-y plane (ref ``track_methods.py:302-323``)."""
    angle = jnp.asarray(angle)
    cs = jnp.cos(angle)
    sn = jnp.sin(angle)

    R = _eye7(angle.shape, angle.dtype)
    R = R.at[..., 0, 0].set(cs)
    R = R.at[..., 0, 2].set(sn)
    R = R.at[..., 1, 1].set(cs)
    R = R.at[..., 1, 3].set(sn)
    R = R.at[..., 2, 0].set(-sn)
    R = R.at[..., 2, 2].set(cs)
    R = R.at[..., 3, 1].set(-sn)
    R = R.at[..., 3, 3].set(cs)
    return R


def misalignment_matrix(misalignment: Array) -> tuple[Array, Array]:
    """Entry/exit affine shifts for a transversely misaligned element
    (ref ``track_methods.py:326-342``)."""
    misalignment = jnp.asarray(misalignment)
    vector_shape = misalignment.shape[:-1]

    R_exit = _eye7(vector_shape, misalignment.dtype)
    R_exit = R_exit.at[..., 0, 6].set(misalignment[..., 0])
    R_exit = R_exit.at[..., 2, 6].set(misalignment[..., 1])

    R_entry = _eye7(vector_shape, misalignment.dtype)
    R_entry = R_entry.at[..., 0, 6].set(-misalignment[..., 0])
    R_entry = R_entry.at[..., 2, 6].set(-misalignment[..., 1])
    return R_entry, R_exit


def combined_rotation_misalignment_matrix(
    angle: Array, misalignment: Array
) -> tuple[Array, Array]:
    """Fused misalignment-then-rotation entry/exit pair
    (ref ``track_methods.py:345-382``)."""
    angle = jnp.asarray(angle)
    misalignment = jnp.asarray(misalignment)
    cs = jnp.cos(angle)
    sn = jnp.sin(angle)

    vector_shape = jnp.broadcast_shapes(angle.shape, misalignment.shape[:-1])
    cs = jnp.broadcast_to(cs, vector_shape)
    sn = jnp.broadcast_to(sn, vector_shape)
    mis_x = jnp.broadcast_to(misalignment[..., 0], vector_shape)
    mis_y = jnp.broadcast_to(misalignment[..., 1], vector_shape)

    rot = _eye7(vector_shape, angle.dtype)
    rot = rot.at[..., 0, 0].set(cs)
    rot = rot.at[..., 0, 2].set(sn)
    rot = rot.at[..., 1, 1].set(cs)
    rot = rot.at[..., 1, 3].set(sn)
    rot = rot.at[..., 2, 0].set(-sn)
    rot = rot.at[..., 2, 2].set(cs)
    rot = rot.at[..., 3, 1].set(-sn)
    rot = rot.at[..., 3, 3].set(cs)

    tm_exit = jnp.swapaxes(rot, -1, -2)
    tm_exit = tm_exit.at[..., 0, 6].set(mis_x)
    tm_exit = tm_exit.at[..., 2, 6].set(mis_y)

    tm_entry = rot
    tm_entry = tm_entry.at[..., 0, 6].set(-mis_x * cs - mis_y * sn)
    tm_entry = tm_entry.at[..., 2, 6].set(mis_x * sn - mis_y * cs)

    return tm_entry, tm_exit


def base_ttensor(
    length: Array,
    k1: Array,
    k2: Array,
    hx: Array,
    species: Species,
    energy: Array | None = None,
) -> Array:
    """Second-order universal 7x7x7 T-tensor (MAD convention) for
    dipole/quadrupole/sextupole fields (ref ``track_methods.py:80-281``).

    :param length: Length of the element in m.
    :param k1: Quadrupole strength in 1/m^2.
    :param k2: Sextupole strength in 1/m^3.
    :param hx: Curvature (1/radius) of the element in 1/m.
    :param species: Particle species of the beam.
    :param energy: Beam energy in eV.
    """
    length = jnp.asarray(length)
    k1 = jnp.asarray(k1)
    k2 = jnp.asarray(k2)
    hx = jnp.asarray(hx)
    energy = jnp.asarray(energy if energy is not None else 0.0)

    _, igamma2, beta = compute_relativistic_factors(energy, species.mass_eV)
    length, k1, k2, hx, igamma2, beta = jnp.broadcast_arrays(
        length, k1, k2, hx, igamma2, beta
    )
    dtype = length.dtype

    kx2 = k1 + jnp.square(hx)
    ky2 = -k1
    L2 = jnp.square(length)
    cx = cos_sqrt(kx2 * L2)
    cy = cos_sqrt(ky2 * L2)
    sx = sinc_sqrt(kx2 * L2) * length
    sy = sinc_sqrt(ky2 * L2) * length

    dx = 0.5 * L2 * jnp.square(sinc_sqrt(0.25 * kx2 * L2))

    fx = length**3 * si1mdiv(kx2 * L2)
    f2y = length**3 * sicos1mdiv(ky2 * L2)

    j1 = fx
    j2 = length**3 * sipsicos3mdiv(kx2 * L2)
    # No proper singularity-free limit model exists for j3 (see reference
    # ``track_methods.py:128-141``); a plain where-guard matches the reference.
    kx2_safe = jnp.where(kx2 == 0, jnp.ones_like(kx2), kx2)
    j3 = jnp.where(
        kx2 == 0,
        length**7 / 56.0,
        (
            15.0 * length
            - 22.5 * sx
            + 9.0 * sx * cx
            - 1.5 * sx * jnp.square(cx)
            + kx2 * sx**3
        )
        / (6.0 * kx2_safe**3),
    )
    j_denominator = kx2 - 4.0 * ky2
    jc = L2 * cossqrtmcosdivdiff(kx2 * L2, ky2 * L2)
    js = length**3 * simsidivdiff(kx2 * L2, ky2 * L2)
    jd = length**4 * si2msi2divdiff(kx2 * L2, ky2 * L2)
    j_denominator_safe = jnp.where(
        j_denominator == 0, jnp.ones_like(j_denominator), j_denominator
    )
    jf = jnp.where(
        j_denominator == 0, length**5 / 120.0, (f2y - fx) / j_denominator_safe
    )

    khk = k2 + 2.0 * hx * k1
    beta2 = jnp.square(beta)
    beta3 = beta2 * beta
    hx2 = jnp.square(hx)
    dx2 = jnp.square(dx)
    sx2 = jnp.square(sx)

    T = jnp.zeros((*length.shape, 7, 7, 7), dtype=dtype)
    T = T.at[..., 0, 0, 0].set(-khk * (sx2 + dx) / 6.0 - 0.5 * hx * kx2 * sx2)
    T = T.at[..., 0, 0, 1].set(2.0 * (-khk * sx * dx / 6.0 + 0.5 * hx * sx * cx))
    T = T.at[..., 0, 1, 1].set(-khk * dx2 / 6.0 + 0.5 * hx * dx * cx)
    T = T.at[..., 0, 0, 5].set(
        2.0
        * (
            -hx / 12.0 / beta * khk * (3.0 * sx * j1 - dx2)
            + 0.5 * hx2 / beta * sx2
            + 0.25 / beta * k1 * length * sx
        )
    )
    T = T.at[..., 0, 1, 5].set(
        2.0
        * (
            -hx / 12.0 / beta * khk * (sx * dx2 - 2.0 * cx * j2)
            + 0.25 * hx2 / beta * (sx * dx + cx * j1)
            - 0.25 / beta * (sx + length * cx)
        )
    )
    T = T.at[..., 0, 5, 5].set(
        -hx2 / 6.0 / beta2 * khk * (dx2 * dx - 2.0 * sx * j2)
        + 0.5 * hx**3 / beta2 * sx * j1
        - 0.5 * hx / beta2 * length * sx
        - 0.5 * hx / beta2 * igamma2 * dx
    )
    T = T.at[..., 0, 2, 2].set(k1 * k2 * jd + 0.5 * (k2 + hx * k1) * dx)
    T = T.at[..., 0, 2, 3].set(2.0 * (0.5 * k2 * js))
    T = T.at[..., 0, 3, 3].set(k2 * jd - 0.5 * hx * dx)
    T = T.at[..., 1, 0, 0].set(-khk * sx * (1.0 + 2.0 * cx) / 6.0)
    T = T.at[..., 1, 0, 1].set(-2.0 * khk * dx * (1.0 + 2.0 * cx) / 6.0)
    T = T.at[..., 1, 1, 1].set(-khk * sx * dx / 3.0 - 0.5 * hx * sx)
    T = T.at[..., 1, 0, 5].set(
        2.0
        * (
            -hx / 12.0 / beta * khk * (3.0 * cx * j1 + sx * dx)
            - 0.25 / beta * k1 * (sx - length * cx)
        )
    )
    T = T.at[..., 1, 1, 5].set(
        2.0
        * (
            -hx / 12.0 / beta * khk * (3.0 * sx * j1 + dx2)
            + 0.25 / beta * k1 * length * sx
        )
    )
    T = T.at[..., 1, 5, 5].set(
        -hx2 / 6.0 / beta2 * khk * (sx * dx2 - 2.0 * cx * j2)
        - 0.5 * hx / beta2 * k1 * (cx * j1 - sx * dx)
        - 0.5 * hx / beta2 * igamma2 * sx
    )
    T = T.at[..., 1, 2, 2].set(k1 * k2 * js + 0.5 * (k2 + hx * k1) * sx)
    T = T.at[..., 1, 2, 3].set(2.0 * (0.5 * k2 * jc))
    T = T.at[..., 1, 3, 3].set(k2 * js - 0.5 * hx * sx)
    T = T.at[..., 2, 0, 2].set(
        2.0 * (0.5 * k2 * (cy * jc - 2.0 * k1 * sy * js) + 0.5 * hx * k1 * sx * sy)
    )
    T = T.at[..., 2, 0, 3].set(
        2.0 * (0.5 * k2 * (sy * jc - 2.0 * cy * js) + 0.5 * hx * sx * cy)
    )
    T = T.at[..., 2, 1, 2].set(
        2.0 * (0.5 * k2 * (cy * js - 2.0 * k1 * sy * jd) + 0.5 * hx * k1 * dx * sy)
    )
    T = T.at[..., 2, 1, 3].set(
        2.0 * (0.5 * k2 * (sy * js - 2.0 * cy * jd) + 0.5 * hx * dx * cy)
    )
    T = T.at[..., 2, 2, 5].set(
        2.0
        * (
            0.5 * hx / beta * k2 * (cy * jd - 2.0 * k1 * sy * jf)
            + 0.5 * hx2 / beta * k1 * j1 * sy
            - 0.25 / beta * k1 * length * sy
        )
    )
    T = T.at[..., 2, 3, 5].set(
        2.0
        * (
            0.5 * hx / beta * k2 * (sy * jd - 2.0 * cy * jf)
            + 0.5 * hx2 / beta * j1 * cy
            - 0.25 / beta * (sy + length * cy)
        )
    )
    T = T.at[..., 3, 0, 2].set(
        2.0
        * (
            0.5 * k1 * k2 * (2.0 * cy * js - sy * jc)
            + 0.5 * (k2 + hx * k1) * sx * cy
        )
    )
    T = T.at[..., 3, 0, 3].set(
        2.0
        * (
            0.5 * k2 * (2.0 * k1 * sy * js - cy * jc)
            + 0.5 * (k2 + hx * k1) * sx * sy
        )
    )
    T = T.at[..., 3, 1, 2].set(
        2.0
        * (
            0.5 * k1 * k2 * (2.0 * cy * jd - sy * js)
            + 0.5 * (k2 + hx * k1) * dx * cy
        )
    )
    T = T.at[..., 3, 1, 3].set(
        2.0
        * (
            0.5 * k2 * (2.0 * k1 * sy * jd - cy * js)
            + 0.5 * (k2 + hx * k1) * dx * sy
        )
    )
    T = T.at[..., 3, 2, 5].set(
        2.0
        * (
            0.5 * hx / beta * k1 * k2 * (2.0 * cy * jf - sy * jd)
            + 0.5 * hx / beta * (k2 + hx * k1) * j1 * cy
            + 0.25 / beta * k1 * (sy - length * cy)
        )
    )
    T = T.at[..., 3, 3, 5].set(
        2.0
        * (
            0.5 * hx / beta * k2 * (2.0 * k1 * sy * jf - cy * jd)
            + 0.5 * hx / beta * (k2 + hx * k1) * j1 * sy
            - 0.25 / beta * k1 * length * sy
        )
    )
    T = T.at[..., 4, 0, 0].set(
        -(
            hx / 12.0 / beta * khk * (sx * dx + 3.0 * j1)
            - 0.25 / beta * k1 * (length - sx * cx)
        )
    )
    T = T.at[..., 4, 0, 1].set(
        -2.0 * (hx / 12.0 / beta * khk * dx2 + 0.25 / beta * k1 * sx2)
    )
    T = T.at[..., 4, 1, 1].set(
        -(
            hx / 6.0 / beta * khk * j2
            - 0.5 / beta * sx
            - 0.25 / beta * k1 * (j1 - sx * dx)
        )
    )
    T = T.at[..., 4, 0, 5].set(
        -2.0
        * (
            hx2 / 12.0 / beta2 * khk * (3.0 * dx * j1 - 4.0 * j2)
            + 0.25 * hx / beta2 * k1 * j1 * (1.0 + cx)
            + 0.5 * hx / beta2 * igamma2 * sx
        )
    )
    T = T.at[..., 4, 1, 5].set(
        -2.0
        * (
            hx2 / 12.0 / beta2 * khk * (dx * dx2 - 2.0 * sx * j2)
            + 0.25 * hx / beta2 * k1 * sx * j1
            + 0.5 * hx / beta2 * igamma2 * dx
        )
    )
    T = T.at[..., 4, 5, 5].set(
        -(
            hx**3 / 6.0 / beta3 * khk * (3.0 * j3 - 2.0 * dx * j2)
            + hx2 / 6.0 / beta3 * k1 * (sx * dx2 - j2 * (1.0 + 2.0 * cx))
            + 1.5 / beta3 * igamma2 * (hx2 * j1 - length)
        )
    )
    T = T.at[..., 4, 2, 2].set(
        -(
            -hx / beta * k1 * k2 * jf
            - 0.5 * hx / beta * (k2 + hx * k1) * j1
            + 0.25 / beta * k1 * (length - cy * sy)
        )
    )
    T = T.at[..., 4, 2, 3].set(
        -2.0 * (-0.5 * hx / beta * k2 * jd - 0.25 / beta * k1 * jnp.square(sy))
    )
    T = T.at[..., 4, 3, 3].set(
        -(
            -hx / beta * k2 * jf
            + 0.5 * hx2 / beta * j1
            - 0.25 / beta * (length + cy * sy)
        )
    )
    return T
