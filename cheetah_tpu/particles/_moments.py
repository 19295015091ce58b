"""Shared helpers for assembling beam moments from named parameters.

Factored out of the two beam classes (the reference duplicates this logic in
``particle_beam.py:108-355`` and ``parameter_beam.py:62-280``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.utils.pytree import as_float_array

# Defaults follow the reference (``particle_beam.py:193-255``).
PARAMETER_DEFAULTS = {
    "mu_x": 0.0,
    "mu_px": 0.0,
    "mu_y": 0.0,
    "mu_py": 0.0,
    "mu_tau": 0.0,
    "mu_p": 0.0,
    "sigma_x": 175e-6,
    "sigma_px": 4e-6,
    "sigma_y": 175e-6,
    "sigma_py": 4e-6,
    "sigma_tau": 8e-6,
    "sigma_p": 2e-3,
    "cov_xpx": 0.0,
    "cov_ypy": 0.0,
    "cov_taup": 0.0,
    "cov_xp": 0.0,
    "cov_pxp": 0.0,
    "cov_yp": 0.0,
    "cov_pyp": 0.0,
    "cov_xy": 0.0,
    "cov_xpy": 0.0,
    "cov_xtau": 0.0,
    "cov_pxy": 0.0,
    "cov_pxpy": 0.0,
    "cov_pxtau": 0.0,
    "cov_ytau": 0.0,
    "cov_pytau": 0.0,
}

# (row, col) of each named covariance entry in the 6x6 matrix.
_COV_POSITIONS = {
    "cov_xpx": (0, 1),
    "cov_ypy": (2, 3),
    "cov_taup": (4, 5),
    "cov_xp": (0, 5),
    "cov_pxp": (1, 5),
    "cov_yp": (2, 5),
    "cov_pyp": (3, 5),
    "cov_xy": (0, 2),
    "cov_xpy": (0, 3),
    "cov_xtau": (0, 4),
    "cov_pxy": (1, 2),
    "cov_pxpy": (1, 3),
    "cov_pxtau": (1, 4),
    "cov_ytau": (2, 4),
    "cov_pytau": (3, 4),
}


def resolve_parameters(dtype, **overrides) -> dict[str, Array]:
    """Fill in defaults and convert all beam parameters to arrays.

    Unknown names are rejected loudly — the callers take the moment set as
    ``**kwargs``, so without this check a typo'd ``sigma_xq`` would silently
    produce a default beam (the reference's explicit 27-parameter signatures
    raise ``TypeError`` in the same situation)."""
    unknown = sorted(set(overrides) - set(PARAMETER_DEFAULTS))
    if unknown:
        raise TypeError(
            f"Unknown beam moment parameter(s) {unknown}; valid names are "
            f"{sorted(PARAMETER_DEFAULTS)}"
        )
    resolved = {}
    for name, default in PARAMETER_DEFAULTS.items():
        value = overrides.get(name)
        resolved[name] = as_float_array(
            value if value is not None else default, dtype=dtype
        )
    return resolved


def build_mu(params: dict[str, Array]) -> Array:
    """Stack the six means into a broadcast ``(..., 6)`` vector."""
    mus = jnp.broadcast_arrays(
        params["mu_x"],
        params["mu_px"],
        params["mu_y"],
        params["mu_py"],
        params["mu_tau"],
        params["mu_p"],
    )
    return jnp.stack(mus, axis=-1)


def build_cov(params: dict[str, Array]) -> Array:
    """Assemble the ``(..., 6, 6)`` covariance matrix from named entries."""
    names = ["sigma_x", "sigma_px", "sigma_y", "sigma_py", "sigma_tau", "sigma_p"]
    entries = jnp.broadcast_arrays(
        *(params[name] for name in names), *(params[k] for k in _COV_POSITIONS)
    )
    sigmas = entries[: len(names)]
    covs = dict(zip(_COV_POSITIONS, entries[len(names):]))

    rows = [[None] * 6 for _ in range(6)]
    for i in range(6):
        rows[i][i] = jnp.square(sigmas[i])
    zero = jnp.zeros_like(sigmas[0])
    for name, (i, j) in _COV_POSITIONS.items():
        rows[i][j] = covs[name]
        rows[j][i] = covs[name]
    for i in range(6):
        for j in range(6):
            if rows[i][j] is None:
                rows[i][j] = zero
    return jnp.stack([jnp.stack(r, axis=-1) for r in rows], axis=-2)


def twiss_to_parameters(
    beta_x: Array,
    alpha_x: Array,
    emittance_x: Array,
    beta_y: Array,
    alpha_y: Array,
    emittance_y: Array,
    sigma_p: Array,
    dispersion_x: Array,
    dispersion_px: Array,
    dispersion_y: Array,
    dispersion_py: Array,
) -> dict[str, Array]:
    """Twiss parameters to second moments (ref ``parameter_beam.py:369-392``)."""
    sigma_p2 = jnp.square(sigma_p)
    return {
        "sigma_x": jnp.sqrt(
            emittance_x * beta_x + jnp.square(dispersion_x) * sigma_p2
        ),
        "sigma_px": jnp.sqrt(
            emittance_x * (1 + jnp.square(alpha_x)) / beta_x
            + jnp.square(dispersion_px) * sigma_p2
        ),
        "sigma_y": jnp.sqrt(
            emittance_y * beta_y + jnp.square(dispersion_y) * sigma_p2
        ),
        "sigma_py": jnp.sqrt(
            emittance_y * (1 + jnp.square(alpha_y)) / beta_y
            + jnp.square(dispersion_py) * sigma_p2
        ),
        "cov_xpx": -emittance_x * alpha_x + dispersion_x * dispersion_px * sigma_p2,
        "cov_ypy": -emittance_y * alpha_y + dispersion_y * dispersion_py * sigma_p2,
        "cov_xp": dispersion_x * sigma_p2,
        "cov_pxp": dispersion_px * sigma_p2,
        "cov_yp": dispersion_y * sigma_p2,
        "cov_pyp": dispersion_py * sigma_p2,
    }
