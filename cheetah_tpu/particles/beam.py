r"""Beam base class with derived physics properties.

Mirrors the 7D phase-space convention of the reference
(``cheetah/particles/beam.py:9-32``): each particle state is
``(x, px, y, py, tau, p, 1)`` with

- ``x``/``y``: transverse positions in m,
- ``px``/``py``: transverse momenta normalised to the reference momentum,
- ``tau``: longitudinal position relative to the reference particle in m,
- ``p``: relative energy deviation :math:`\Delta E / (p_0 c)`,
- the constant 1 making thin kicks/misalignments affine-expressible.

Subclasses provide the first/second moments (``mu_*``, ``sigma_*``,
``cov_*``); this base derives emittances, Twiss functions and dispersion
(ref ``beam.py:324-556``).
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


class Beam:
    """Abstract beam interface. Use :class:`ParticleBeam` or
    :class:`ParameterBeam`."""

    # Number of trailing non-vector dims of multi-dimensional attributes
    # (ref ``beam.py:34-36``): used for vectorisation-aware stacking.
    UNVECTORIZED_NUM_ATTR_DIMS: dict[str, int] = {}

    # ------------------------------------------------------------------
    # Abstract interface (ref ``beam.py:38-321``): first/second moments and
    # constructors that every concrete beam provides. Declared here so the
    # base class documents the full surface; subclasses override all of
    # these.
    # ------------------------------------------------------------------

    @classmethod
    def from_parameters(cls, *args, **kwargs) -> "Beam":
        raise NotImplementedError

    @classmethod
    def from_twiss(cls, *args, **kwargs) -> "Beam":
        raise NotImplementedError

    @classmethod
    def from_ocelot(cls, *args, **kwargs) -> "Beam":
        raise NotImplementedError

    @classmethod
    def from_astra(cls, *args, **kwargs) -> "Beam":
        raise NotImplementedError

    def transformed_to(self, *args, **kwargs) -> "Beam":
        raise NotImplementedError

    def clone(self) -> "Beam":
        raise NotImplementedError

    @property
    def defining_features(self) -> list[str]:
        raise NotImplementedError

    def _abstract_moment(name: str, doc: str):  # noqa: N805
        def getter(self):
            raise NotImplementedError(
                f"{type(self).__name__} must implement `{name}`."
            )

        getter.__name__ = name
        getter.__doc__ = doc
        return property(getter)

    for _name, _doc in [
        *[(f"mu_{c}", f"Mean of {c}.") for c in ("x", "px", "y", "py", "tau", "p")],
        *[
            (f"sigma_{c}", f"Standard deviation of {c}.")
            for c in ("x", "px", "y", "py", "tau", "p")
        ],
        *[
            (f"cov_{pair}", f"Covariance between {pair[:-2] or pair[0]}-like pairs.")
            for pair in (
                "xpx", "xy", "xpy", "xtau", "xp",
                "pxy", "pxpy", "pxtau", "pxp",
                "ypy", "ytau", "yp",
                "pytau", "pyp",
                "taup",
            )
        ],
    ]:
        locals()[_name] = _abstract_moment(_name, _doc)
    del _name, _doc, _abstract_moment

    @property
    def relativistic_gamma(self) -> Array:
        """Reference relativistic gamma of the beam."""
        return self.energy / self.species.mass_eV

    @property
    def relativistic_beta(self) -> Array:
        """Reference relativistic beta; 1 where gamma is 0 (ref ``beam.py:329``)."""
        gamma = self.relativistic_gamma
        safe_gamma = jnp.where(jnp.abs(gamma) > 0, gamma, jnp.ones_like(gamma))
        return jnp.where(
            jnp.abs(gamma) > 0,
            jnp.sqrt(1.0 - 1.0 / jnp.square(safe_gamma)),
            jnp.ones_like(gamma),
        )

    @property
    def p0c(self) -> Array:
        """Reference momentum times speed of light in eV."""
        return self.relativistic_beta * self.relativistic_gamma * self.species.mass_eV

    @property
    def projected_emittance_x(self) -> Array:
        """Projected emittance in x in m (no dispersion correction)."""
        return jnp.sqrt(
            jnp.square(self.sigma_x) * jnp.square(self.sigma_px)
            - jnp.square(self.cov_xpx)
        )

    @property
    def emittance_x(self) -> Array:
        """Dispersion-corrected betatron emittance in x in m (ref ``beam.py:442``)."""
        sigma_p2 = jnp.square(self.sigma_p)
        term = (
            jnp.square(self.sigma_x) - jnp.square(self.cov_xp) / sigma_p2
        ) * (
            jnp.square(self.sigma_px) - jnp.square(self.cov_pxp) / sigma_p2
        ) - jnp.square(self.cov_xpx - self.cov_xp * self.cov_pxp / sigma_p2)
        tiny = jnp.finfo(jnp.asarray(self.sigma_x).dtype).tiny
        return jnp.sqrt(jnp.clip(term, min=tiny))  # Patch NaN and 0.0

    @property
    def normalized_emittance_x(self) -> Array:
        """Normalized emittance in x in m."""
        return self.emittance_x * self.relativistic_beta * self.relativistic_gamma

    @property
    def beta_x(self) -> Array:
        """Beta function in x in m."""
        return (
            jnp.square(self.sigma_x)
            - jnp.square(self.cov_xp) / jnp.square(self.sigma_p)
        ) / self.emittance_x

    @property
    def alpha_x(self) -> Array:
        """Alpha function in x (dimensionless)."""
        return (
            -(self.cov_xpx - self.cov_xp * self.cov_pxp / jnp.square(self.sigma_p))
            / self.emittance_x
        )

    @property
    def projected_emittance_y(self) -> Array:
        """Projected emittance in y in m (no dispersion correction)."""
        return jnp.sqrt(
            jnp.square(self.sigma_y) * jnp.square(self.sigma_py)
            - jnp.square(self.cov_ypy)
        )

    @property
    def emittance_y(self) -> Array:
        """Dispersion-corrected betatron emittance in y in m (ref ``beam.py:498``)."""
        sigma_p2 = jnp.square(self.sigma_p)
        term = (
            jnp.square(self.sigma_y) - jnp.square(self.cov_yp) / sigma_p2
        ) * (
            jnp.square(self.sigma_py) - jnp.square(self.cov_pyp) / sigma_p2
        ) - jnp.square(self.cov_ypy - self.cov_yp * self.cov_pyp / sigma_p2)
        tiny = jnp.finfo(jnp.asarray(self.sigma_y).dtype).tiny
        return jnp.sqrt(jnp.clip(term, min=tiny))

    @property
    def normalized_emittance_y(self) -> Array:
        """Normalized emittance in y in m."""
        return self.emittance_y * self.relativistic_beta * self.relativistic_gamma

    @property
    def beta_y(self) -> Array:
        """Beta function in y in m."""
        return (
            jnp.square(self.sigma_y)
            - jnp.square(self.cov_yp) / jnp.square(self.sigma_p)
        ) / self.emittance_y

    @property
    def alpha_y(self) -> Array:
        """Alpha function in y (dimensionless)."""
        return (
            -(self.cov_ypy - self.cov_yp * self.cov_pyp / jnp.square(self.sigma_p))
            / self.emittance_y
        )

    @property
    def dispersion_x(self) -> Array:
        """Dispersion in x in m."""
        return self.cov_xp / jnp.square(self.sigma_p)

    @property
    def dispersion_px(self) -> Array:
        """Dispersion in px (dimensionless)."""
        return self.cov_pxp / jnp.square(self.sigma_p)

    @property
    def dispersion_y(self) -> Array:
        """Dispersion in y in m."""
        return self.cov_yp / jnp.square(self.sigma_p)

    @property
    def dispersion_py(self) -> Array:
        """Dispersion in py (dimensionless)."""
        return self.cov_pyp / jnp.square(self.sigma_p)
