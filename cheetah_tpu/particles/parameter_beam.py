"""Gaussian-moments beam (ref ``cheetah/particles/parameter_beam.py:8-779``).

A ``ParameterBeam`` models the beam as a 7-vector mean ``mu`` and a 7x7
covariance ``cov`` (both with arbitrary leading vector dimensions). Tracking a
``ParameterBeam`` through a linear map costs one 7-vector matmul and one 7x7
congruence, independent of particle count.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.particles import _moments
from cheetah_tpu.particles.beam import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass


@pytree_dataclass(init=False)
class ParameterBeam(Beam):
    """Beam described by its first and second moments.

    :param mu: Mean vector of shape ``(..., 7)`` (7th entry is 1).
    :param cov: Covariance matrix of shape ``(..., 7, 7)``.
    :param energy: Reference energy of the beam in eV.
    :param total_charge: Total charge of the beam in C.
    :param s: Position along the beamline of the reference particle in m.
    :param species: Particle species of the beam. Defaults to electron.
    """

    mu: Array
    cov: Array
    energy: Array
    total_charge: Array
    s: Array
    species: Species

    UNVECTORIZED_NUM_ATTR_DIMS = Beam.UNVECTORIZED_NUM_ATTR_DIMS | {
        "mu": 1,
        "cov": 2,
    }

    def __init__(
        self,
        mu: Array,
        cov: Array,
        energy: Array,
        total_charge: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.mu = as_float_array(mu, dtype=dtype)
        dtype = self.mu.dtype
        self.cov = jnp.asarray(cov, dtype=dtype)
        self.energy = jnp.asarray(energy, dtype=dtype)
        self.total_charge = jnp.asarray(
            total_charge if total_charge is not None else 0.0, dtype=dtype
        )
        self.s = jnp.asarray(s if s is not None else 0.0, dtype=dtype)
        self.species = species if species is not None else Species("electron", dtype=dtype)

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @classmethod
    def from_parameters(
        cls,
        energy: Array | None = None,
        total_charge: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        dtype: jnp.dtype | None = None,
        validate: bool = True,
        **moments: Array | None,
    ) -> "ParameterBeam":
        """Create a beam from named first/second moments (full 27-parameter
        specification, ref ``parameter_beam.py:62-280``).

        :param validate: If ``True`` (and no tracing is active), assert that
            the covariance matrix is positive definite.
        """
        params = _moments.resolve_parameters(dtype, **moments)
        mu6 = _moments.build_mu(params)
        cov6 = _moments.build_cov(params)

        mu = jnp.concatenate([mu6, jnp.ones_like(mu6[..., :1])], axis=-1)
        cov = jnp.zeros((*cov6.shape[:-2], 7, 7), dtype=cov6.dtype)
        cov = cov.at[..., :6, :6].set(cov6)

        # Cholesky of a non-PD matrix yields NaNs in JAX (no exception), so
        # validation is an explicit NaN check, skipped for traced values.
        import jax

        if validate and not isinstance(cov6, jax.core.Tracer):
            chol = jnp.linalg.cholesky(cov6)
            if bool(jnp.any(jnp.isnan(chol))):
                raise ValueError(
                    "The covariance matrix of the beam must be positive "
                    "definite. Please check the input parameters to ensure "
                    "that they are consistent."
                )

        energy = jnp.asarray(energy if energy is not None else 1e8, dtype=mu.dtype)
        return cls(
            mu=mu,
            cov=cov,
            energy=energy,
            total_charge=total_charge,
            s=s,
            species=species,
        )

    @classmethod
    def from_twiss(
        cls,
        beta_x: Array | None = None,
        alpha_x: Array | None = None,
        emittance_x: Array | None = None,
        beta_y: Array | None = None,
        alpha_y: Array | None = None,
        emittance_y: Array | None = None,
        sigma_tau: Array | None = None,
        sigma_p: Array | None = None,
        cov_taup: Array | None = None,
        dispersion_x: Array | None = None,
        dispersion_px: Array | None = None,
        dispersion_y: Array | None = None,
        dispersion_py: Array | None = None,
        energy: Array | None = None,
        total_charge: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        dtype: jnp.dtype | None = None,
    ) -> "ParameterBeam":
        """Create a beam from Twiss parameters (ref ``parameter_beam.py:282-414``)."""
        asarr = lambda value, default: as_float_array(  # noqa: E731
            value if value is not None else default, dtype=dtype
        )
        beta_x = asarr(beta_x, 1.0)
        alpha_x = asarr(alpha_x, 0.0)
        emittance_x = asarr(emittance_x, 7.1971891e-13)
        beta_y = asarr(beta_y, 1.0)
        alpha_y = asarr(alpha_y, 0.0)
        emittance_y = asarr(emittance_y, 7.1971891e-13)
        sigma_tau = asarr(sigma_tau, 1e-6)
        sigma_p = asarr(sigma_p, 1e-6)
        cov_taup = asarr(cov_taup, 0.0)
        dispersion_x = asarr(dispersion_x, 0.0)
        dispersion_px = asarr(dispersion_px, 0.0)
        dispersion_y = asarr(dispersion_y, 0.0)
        dispersion_py = asarr(dispersion_py, 0.0)

        assert bool(
            jnp.all(beta_x > 0)
        ), "Beta function in x direction must be larger than 0 everywhere."
        assert bool(
            jnp.all(beta_y > 0)
        ), "Beta function in y direction must be larger than 0 everywhere."

        moments = _moments.twiss_to_parameters(
            beta_x,
            alpha_x,
            emittance_x,
            beta_y,
            alpha_y,
            emittance_y,
            sigma_p,
            dispersion_x,
            dispersion_px,
            dispersion_y,
            dispersion_py,
        )
        return cls.from_parameters(
            sigma_tau=sigma_tau,
            sigma_p=sigma_p,
            cov_taup=cov_taup,
            energy=energy,
            total_charge=total_charge,
            s=s,
            species=species,
            dtype=dtype,
            **moments,
        )

    @classmethod
    def from_astra(cls, path: str, dtype: jnp.dtype | None = None) -> "ParameterBeam":
        """Load an ASTRA particle distribution as moments (ref
        ``parameter_beam.py:444-474``)."""
        import numpy as np

        from cheetah_tpu.converters.astra import from_astrabeam

        particles, energy, particle_charges = from_astrabeam(path)
        mu = jnp.concatenate(
            [jnp.asarray(particles.mean(axis=0), dtype), jnp.ones((1,), dtype)]
        )
        cov = jnp.zeros((7, 7), dtype)
        cov = cov.at[:6, :6].set(jnp.asarray(np.cov(particles.T), dtype))
        return cls(
            mu=mu,
            cov=cov,
            energy=jnp.asarray(energy, dtype),
            total_charge=jnp.asarray(particle_charges.sum(), dtype),
            species=Species("electron", dtype=dtype),
        )

    @classmethod
    def from_ocelot(cls, parray, dtype: jnp.dtype | None = None) -> "ParameterBeam":
        """Load an Ocelot ParticleArray as moments (ref
        ``parameter_beam.py:416-442``)."""
        import numpy as np

        rparticles = np.asarray(parray.rparticles)
        mu = jnp.concatenate(
            [jnp.asarray(rparticles.mean(axis=1), dtype), jnp.ones((1,), dtype)]
        )
        cov = jnp.zeros((7, 7), dtype)
        cov = cov.at[:6, :6].set(jnp.asarray(np.cov(rparticles), dtype))
        return cls(
            mu=mu,
            cov=cov,
            energy=jnp.asarray(1e9 * parray.E, dtype),
            total_charge=jnp.asarray(np.sum(np.asarray(parray.q_array)), dtype),
            species=Species("electron", dtype=dtype),
        )

    # ------------------------------------------------------------------
    # Transformations
    # ------------------------------------------------------------------

    def transformed_to(
        self,
        energy: Array | None = None,
        total_charge: Array | None = None,
        species: Species | None = None,
        **moments: Array | None,
    ) -> "ParameterBeam":
        """Return a version of this beam transformed to new parameters (ref
        ``parameter_beam.py:476-586``)."""
        current = {
            name: getattr(self, name) for name in _moments.PARAMETER_DEFAULTS
        }
        for name, value in moments.items():
            if value is not None:
                current[name] = value
        return self.__class__.from_parameters(
            energy=energy if energy is not None else self.energy,
            total_charge=(
                total_charge if total_charge is not None else self.total_charge
            ),
            s=self.s,
            species=species if species is not None else self.species,
            dtype=self.mu.dtype,
            **current,
        )

    def as_particle_beam(
        self, num_particles: int, key: Array | None = None
    ) -> "ParticleBeam":  # noqa: F821
        """Sample a :class:`ParticleBeam` with this beam's moments."""
        from cheetah_tpu.particles.particle_beam import ParticleBeam

        return ParticleBeam.from_distribution(
            num_particles=num_particles,
            mu=self.mu[..., :6],
            cov=self.cov[..., :6, :6],
            energy=self.energy,
            total_charge=self.total_charge,
            s=self.s,
            species=self.species,
            key=key,
        )

    def linspaced(self, num_particles: int) -> "ParticleBeam":  # noqa: F821
        """Evenly spaced :class:`ParticleBeam` with this beam's moments."""
        from cheetah_tpu.particles.particle_beam import ParticleBeam

        return ParticleBeam.make_linspaced(
            num_particles=num_particles,
            mu_x=self.mu_x,
            mu_px=self.mu_px,
            mu_y=self.mu_y,
            mu_py=self.mu_py,
            mu_tau=self.mu_tau,
            mu_p=self.mu_p,
            sigma_x=self.sigma_x,
            sigma_px=self.sigma_px,
            sigma_y=self.sigma_y,
            sigma_py=self.sigma_py,
            sigma_tau=self.sigma_tau,
            sigma_p=self.sigma_p,
            energy=self.energy,
            total_charge=self.total_charge,
            s=self.s,
            species=self.species,
        )

    def clone(self) -> "ParameterBeam":
        return self.__class__(
            mu=self.mu,
            cov=self.cov,
            energy=self.energy,
            total_charge=self.total_charge,
            s=self.s,
            species=self.species.clone(),
        )

    # ------------------------------------------------------------------
    # Statistics
    # ------------------------------------------------------------------

    @property
    def defining_features(self) -> list[str]:
        """Features that define the beam (for equality and serialisation)."""
        return ["mu", "cov", "energy", "total_charge", "s", "species"]

    @property
    def mu_x(self) -> Array:
        return self.mu[..., 0]

    @property
    def sigma_x(self) -> Array:
        return jnp.sqrt(self.cov[..., 0, 0])

    @property
    def mu_px(self) -> Array:
        return self.mu[..., 1]

    @property
    def sigma_px(self) -> Array:
        return jnp.sqrt(self.cov[..., 1, 1])

    @property
    def mu_y(self) -> Array:
        return self.mu[..., 2]

    @property
    def sigma_y(self) -> Array:
        return jnp.sqrt(self.cov[..., 2, 2])

    @property
    def mu_py(self) -> Array:
        return self.mu[..., 3]

    @property
    def sigma_py(self) -> Array:
        return jnp.sqrt(self.cov[..., 3, 3])

    @property
    def mu_tau(self) -> Array:
        return self.mu[..., 4]

    @property
    def sigma_tau(self) -> Array:
        return jnp.sqrt(self.cov[..., 4, 4])

    @property
    def mu_p(self) -> Array:
        return self.mu[..., 5]

    @property
    def sigma_p(self) -> Array:
        return jnp.sqrt(self.cov[..., 5, 5])

    @property
    def cov_xpx(self) -> Array:
        return self.cov[..., 0, 1]

    @property
    def cov_ypy(self) -> Array:
        return self.cov[..., 2, 3]

    @property
    def cov_taup(self) -> Array:
        return self.cov[..., 4, 5]

    @property
    def cov_xp(self) -> Array:
        return self.cov[..., 0, 5]

    @property
    def cov_pxp(self) -> Array:
        return self.cov[..., 1, 5]

    @property
    def cov_yp(self) -> Array:
        return self.cov[..., 2, 5]

    @property
    def cov_pyp(self) -> Array:
        return self.cov[..., 3, 5]

    @property
    def cov_xy(self) -> Array:
        return self.cov[..., 0, 2]

    @property
    def cov_xpy(self) -> Array:
        return self.cov[..., 0, 3]

    @property
    def cov_xtau(self) -> Array:
        return self.cov[..., 0, 4]

    @property
    def cov_pxy(self) -> Array:
        return self.cov[..., 1, 2]

    @property
    def cov_pxpy(self) -> Array:
        return self.cov[..., 1, 3]

    @property
    def cov_pxtau(self) -> Array:
        return self.cov[..., 1, 4]

    @property
    def cov_ytau(self) -> Array:
        return self.cov[..., 2, 4]

    @property
    def cov_pytau(self) -> Array:
        return self.cov[..., 3, 4]
