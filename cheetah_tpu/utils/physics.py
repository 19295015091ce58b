"""Relativistic kinematics helpers (ref ``cheetah/utils/physics.py:4-19``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def compute_relativistic_factors(
    energy: Array, particle_mass_eV: Array
) -> tuple[Array, Array, Array]:
    """Compute (gamma, 1/gamma^2, beta) for a reference energy in eV."""
    energy = jnp.asarray(energy)
    gamma = energy / particle_mass_eV
    igamma2 = 1.0 / jnp.square(gamma)
    beta = jnp.sqrt(1.0 - igamma2)
    return gamma, igamma2, beta
