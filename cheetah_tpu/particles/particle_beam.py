"""Macroparticle beam (ref ``cheetah/particles/particle_beam.py:24-2011``).

A ``ParticleBeam`` is a pytree of arrays: ``particles`` of shape
``(..., num_particles, 7)``, per-macroparticle charges and survival
probabilities of shape ``(..., num_particles)``, plus scalars ``energy`` and
``s``. Arbitrary leading vector dimensions broadcast through all operations,
and the whole object can be vmapped, jitted, differentiated and sharded.

All statistics are survival-probability weighted, matching the reference's
soft particle-loss accounting (``particle_beam.py:1700-1943``).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax import Array

from cheetah_tpu import constants
from cheetah_tpu.particles import _moments
from cheetah_tpu.particles.beam import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.elementwise_linspace import elementwise_linspace
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass
from cheetah_tpu.utils.rng import ensure_key
from cheetah_tpu.utils.statistics import (
    match_distribution_moments,
    unbiased_weighted_covariance,
    unbiased_weighted_covariance_matrix,
)


@pytree_dataclass(init=False)
class ParticleBeam(Beam):
    """Beam of charged macroparticles.

    :param particles: Particle vectors of shape ``(..., num_particles, 7)``.
    :param energy: Reference energy of the beam in eV.
    :param particle_charges: Charges of the macroparticles in C, shape
        ``(..., num_particles)``.
    :param survival_probabilities: Per-particle survival probability in
        ``[0, 1]`` (1 = survived, 0 = lost). Defaults to ones.
    :param s: Position along the beamline of the reference particle in m.
    :param species: Particle species of the beam. Defaults to electron.
    """

    particles: Array
    energy: Array
    particle_charges: Array
    survival_probabilities: Array
    s: Array
    species: Species

    PRETTY_DIMENSION_LABELS = {
        "x": r"$x$",
        "px": r"$p_x$",
        "y": r"$y$",
        "py": r"$p_y$",
        "tau": r"$\tau$",
        "p": r"$\delta$",
    }
    UNVECTORIZED_NUM_ATTR_DIMS = Beam.UNVECTORIZED_NUM_ATTR_DIMS | {
        "particles": 2,
        "particle_charges": 1,
        "survival_probabilities": 1,
        "x": 1,
        "px": 1,
        "y": 1,
        "py": 1,
        "tau": 1,
        "p": 1,
    }

    def __init__(
        self,
        particles: Array,
        energy: Array,
        particle_charges: Array | None = None,
        survival_probabilities: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        particles = as_float_array(particles, dtype=dtype)
        assert (
            particles.shape[-2] > 0 and particles.shape[-1] == 7
        ), "Particle vectors must be 7-dimensional."
        dtype = particles.dtype

        self.species = species if species is not None else Species("electron", dtype=dtype)
        self.particles = particles
        self.energy = as_float_array(energy, dtype=dtype)
        num_particles = particles.shape[-2]
        self.particle_charges = (
            jnp.asarray(particle_charges, dtype=dtype)
            if particle_charges is not None
            else jnp.broadcast_to(
                jnp.asarray(self.species.charge_coulomb, dtype=dtype), (num_particles,)
            )
        )
        self.survival_probabilities = (
            jnp.asarray(survival_probabilities, dtype=dtype)
            if survival_probabilities is not None
            else jnp.ones((num_particles,), dtype=dtype)
        )
        self.s = jnp.asarray(s if s is not None else 0.0, dtype=dtype)

    # ------------------------------------------------------------------
    # Constructors
    # ------------------------------------------------------------------

    @classmethod
    def from_parameters(
        cls,
        num_particles: int = 100_000,
        energy: Array | None = None,
        total_charge: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        key: Array | None = None,
        dtype: jnp.dtype | None = None,
        **moments: Array | None,
    ) -> "ParticleBeam":
        """Generate a random Gaussian beam from named first/second moments.

        Accepts the full 27-parameter moment specification of the reference
        (``particle_beam.py:108-355``): ``mu_x``, ``mu_px``, ..., ``sigma_x``,
        ..., ``cov_xpx``, ..., ``cov_pytau``.

        :param key: JAX PRNG key for sampling. Drawn from the global sequence
            if not provided.
        """
        params = _moments.resolve_parameters(dtype, **moments)
        mu = _moments.build_mu(params)
        cov = _moments.build_cov(params)
        return cls.from_distribution(
            mu=mu,
            cov=cov,
            num_particles=num_particles,
            energy=energy,
            total_charge=total_charge,
            s=s,
            species=species,
            key=key,
            dtype=dtype,
        )

    @classmethod
    def from_distribution(
        cls,
        mu: Array,
        cov: Array,
        num_particles: int = 100_000,
        energy: Array | None = None,
        total_charge: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        key: Array | None = None,
        dtype: jnp.dtype | None = None,
    ) -> "ParticleBeam":
        """Generate a random beam from a 6D multivariate normal distribution.

        Samples a standard normal and affinely transforms it so the sampled
        moments match ``mu``/``cov`` *exactly* (Cholesky whiten-recolour, ref
        ``particle_beam.py:357-431``). Gradients flow through ``mu``/``cov``.
        """
        mu = jnp.asarray(mu, dtype=dtype)
        cov = jnp.asarray(cov, dtype=dtype)
        dtype = mu.dtype
        species = species if species is not None else Species("electron", dtype=dtype)

        energy = jnp.asarray(energy if energy is not None else 1e8, dtype=dtype)
        if total_charge is None:
            total_charge = jnp.asarray(
                species.charge_coulomb * num_particles, dtype=dtype
            )
        else:
            total_charge = jnp.asarray(total_charge, dtype=dtype)
        particle_charges = (
            jnp.ones((*total_charge.shape, num_particles), dtype=dtype)
            * total_charge[..., None]
            / num_particles
        )

        key = ensure_key(key)
        standard = jax.random.normal(key, (num_particles, 6), dtype=dtype)
        matched_6d = match_distribution_moments(standard, mu, cov)
        particles = jnp.concatenate(
            [matched_6d, jnp.ones_like(matched_6d[..., :1])], axis=-1
        )

        return cls(
            particles,
            energy,
            particle_charges=particle_charges,
            s=s,
            species=species,
        )

    @classmethod
    def from_twiss(
        cls,
        num_particles: int = 100_000,
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
        key: Array | None = None,
        dtype: jnp.dtype | None = None,
    ) -> "ParticleBeam":
        """Generate a random beam from Twiss parameters (ref
        ``particle_beam.py:433-560``)."""
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
            num_particles=num_particles,
            sigma_tau=sigma_tau,
            sigma_p=sigma_p,
            cov_taup=cov_taup,
            energy=energy,
            total_charge=total_charge,
            s=s,
            species=species,
            key=key,
            dtype=dtype,
            **moments,
        )

    @classmethod
    def uniform_3d_ellipsoid(
        cls,
        num_particles: int = 100_000,
        radius_x: Array | None = None,
        radius_y: Array | None = None,
        radius_tau: Array | None = None,
        sigma_px: Array | None = None,
        sigma_py: Array | None = None,
        sigma_p: Array | None = None,
        energy: Array | None = None,
        total_charge: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        key: Array | None = None,
        dtype: jnp.dtype | None = None,
    ) -> "ParticleBeam":
        """Waterbag beam: spatially uniform inside an ellipsoid, Gaussian in
        momenta (ref ``particle_beam.py:562-665``)."""
        radius_x = jnp.asarray(radius_x if radius_x is not None else 1e-3, dtype=dtype)
        radius_y = jnp.asarray(radius_y if radius_y is not None else 1e-3, dtype=dtype)
        radius_tau = jnp.asarray(
            radius_tau if radius_tau is not None else 1e-3, dtype=dtype
        )

        key = ensure_key(key)
        key_gauss, key_r, key_theta, key_phi = jax.random.split(key, 4)

        beam = cls.from_parameters(
            num_particles=num_particles,
            mu_px=jnp.zeros((), dtype=dtype),
            mu_py=jnp.zeros((), dtype=dtype),
            sigma_x=radius_x,  # Placeholder, overwritten below
            sigma_px=sigma_px,
            sigma_y=radius_y,  # Placeholder, overwritten below
            sigma_py=sigma_py,
            sigma_tau=radius_tau,  # Placeholder, overwritten below
            sigma_p=sigma_p,
            energy=energy,
            total_charge=total_charge,
            s=s,
            species=species,
            key=key_gauss,
            dtype=dtype,
        )
        fdtype = beam.particles.dtype

        vector_shape = beam.sigma_x.shape
        # Uniform sampling in the unit sphere in polar coordinates.
        r = jax.random.uniform(key_r, (*vector_shape, num_particles), dtype=fdtype) ** (
            1.0 / 3.0
        )
        theta = jnp.arccos(
            2.0 * jax.random.uniform(
                key_theta, (*vector_shape, num_particles), dtype=fdtype
            )
            - 1.0
        )
        phi = (
            jax.random.uniform(key_phi, (*vector_shape, num_particles), dtype=fdtype)
            * 2.0
            * jnp.pi
        )

        x = r * jnp.sin(theta) * jnp.cos(phi) * radius_x[..., None]
        y = r * jnp.sin(theta) * jnp.sin(phi) * radius_y[..., None]
        tau = r * jnp.cos(theta) * radius_tau[..., None]

        particles = beam.particles
        particles = particles.at[..., 0].set(x)
        particles = particles.at[..., 2].set(y)
        particles = particles.at[..., 4].set(tau)
        beam.particles = particles
        return beam

    @classmethod
    def make_linspaced(
        cls,
        num_particles: int = 10,
        mu_x: Array | None = None,
        mu_px: Array | None = None,
        mu_y: Array | None = None,
        mu_py: Array | None = None,
        mu_tau: Array | None = None,
        mu_p: Array | None = None,
        sigma_x: Array | None = None,
        sigma_px: Array | None = None,
        sigma_y: Array | None = None,
        sigma_py: Array | None = None,
        sigma_tau: Array | None = None,
        sigma_p: Array | None = None,
        energy: Array | None = None,
        total_charge: Array | None = None,
        particle_charges: Array | None = None,
        survival_probabilities: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        dtype: jnp.dtype | None = None,
    ) -> "ParticleBeam":
        """Generate a beam of evenly spaced particles spanning +-1 sigma in each
        dimension (ref ``particle_beam.py:667-802``)."""
        asarr = lambda value, default: as_float_array(  # noqa: E731
            value if value is not None else default, dtype=dtype
        )
        mu_x = asarr(mu_x, 0.0)
        mu_px = asarr(mu_px, 0.0)
        mu_y = asarr(mu_y, 0.0)
        mu_py = asarr(mu_py, 0.0)
        mu_tau = asarr(mu_tau, 0.0)
        mu_p = asarr(mu_p, 0.0)
        sigma_x = asarr(sigma_x, 175e-9)
        sigma_px = asarr(sigma_px, 2e-7)
        sigma_y = asarr(sigma_y, 175e-9)
        sigma_py = asarr(sigma_py, 2e-7)
        sigma_tau = asarr(sigma_tau, 1e-6)
        sigma_p = asarr(sigma_p, 1e-6)
        energy = asarr(energy, 1e8)
        dtype = energy.dtype

        species = species if species is not None else Species("electron", dtype=dtype)
        if particle_charges is None:
            if total_charge is None:
                total_charge = jnp.asarray(
                    species.charge_coulomb * num_particles, dtype=dtype
                )
            else:
                total_charge = jnp.asarray(total_charge, dtype=dtype)
            particle_charges = (
                jnp.ones((*total_charge.shape, num_particles), dtype=dtype)
                * total_charge[..., None]
                / num_particles
            )

        coords = [
            elementwise_linspace(mu - sigma, mu + sigma, num_particles)
            for mu, sigma in (
                (mu_x, sigma_x),
                (mu_px, sigma_px),
                (mu_y, sigma_y),
                (mu_py, sigma_py),
                (mu_tau, sigma_tau),
                (mu_p, sigma_p),
            )
        ]
        coords = jnp.broadcast_arrays(*coords)
        particles = jnp.stack([*coords, jnp.ones_like(coords[0])], axis=-1)

        return cls(
            particles=particles,
            energy=energy,
            particle_charges=particle_charges,
            survival_probabilities=survival_probabilities,
            s=s,
            species=species,
        )

    @classmethod
    def from_astra(cls, path: str, dtype: jnp.dtype | None = None) -> "ParticleBeam":
        """Load an ASTRA particle distribution (ref ``particle_beam.py:834``)."""
        from cheetah_tpu.converters.astra import from_astrabeam

        particles, energy, particle_charges = from_astrabeam(path)
        particles_7d = jnp.concatenate(
            [
                jnp.asarray(particles, dtype),
                jnp.ones((particles.shape[0], 1), dtype),
            ],
            axis=-1,
        )
        return cls(
            particles=particles_7d,
            energy=jnp.asarray(energy, dtype),
            particle_charges=jnp.asarray(particle_charges, dtype),
            species=Species("electron", dtype=dtype),
        )

    @classmethod
    def from_ocelot(cls, parray, dtype: jnp.dtype | None = None) -> "ParticleBeam":
        """Convert an Ocelot ParticleArray (ref ``particle_beam.py:804``)."""
        import numpy as np

        rparticles = np.asarray(parray.rparticles)
        num_particles = rparticles.shape[1]
        particles = jnp.concatenate(
            [
                jnp.asarray(rparticles.T, dtype),
                jnp.ones((num_particles, 1), dtype),
            ],
            axis=-1,
        )
        return cls(
            particles=particles,
            energy=jnp.asarray(1e9 * parray.E, dtype),
            particle_charges=jnp.asarray(np.asarray(parray.q_array), dtype),
            species=Species("electron", dtype=dtype),
        )

    @classmethod
    def from_elegant(cls, file_path, dtype: jnp.dtype | None = None) -> "ParticleBeam":
        """Load an Elegant SDDS particle distribution (ref
        ``particle_beam.py:867``)."""
        from pathlib import Path

        from cheetah_tpu.converters import elegant

        particles, energy, particle_charges = elegant.convert_beam(
            Path(file_path), dtype=dtype
        )
        return cls(
            particles=particles,
            energy=energy,
            particle_charges=particle_charges,
            species=Species("electron", dtype=dtype),
        )

    @classmethod
    def from_openpmd_file(
        cls, path: str, energy: Array, dtype: jnp.dtype | None = None
    ) -> "ParticleBeam":
        """Load an openPMD particle group HDF5 file (ref
        ``particle_beam.py:904``).

        Uses ``pmd_beamphysics`` when installed (as the reference requires);
        otherwise falls back to the native h5py reader in
        :mod:`cheetah_tpu.converters.openpmd` — same schema, no optional
        dependency.
        """
        try:
            import pmd_beamphysics as openpmd

            particle_group = openpmd.ParticleGroup(str(path))
        except ImportError:
            from cheetah_tpu.converters.openpmd import read_particle_group_h5

            particle_group = read_particle_group_h5(path)
        return cls.from_openpmd_particlegroup(particle_group, energy, dtype=dtype)

    @classmethod
    def from_openpmd_particlegroup(
        cls, particle_group, energy: Array, dtype: jnp.dtype | None = None
    ) -> "ParticleBeam":
        """Create a beam from an openPMD ``ParticleGroup`` (ref
        ``particle_beam.py:926-973``)."""
        species = Species(particle_group.species, dtype=dtype)
        energy = jnp.asarray(energy, dtype)
        p0c = jnp.sqrt(jnp.square(energy) - jnp.square(species.mass_eV))

        x = jnp.asarray(particle_group.x, dtype)
        y = jnp.asarray(particle_group.y, dtype)
        px = jnp.asarray(particle_group.px, dtype) / p0c
        py = jnp.asarray(particle_group.py, dtype) / p0c
        tau = jnp.asarray(particle_group.t, dtype) * constants.speed_of_light
        delta = (jnp.asarray(particle_group.energy, dtype) - energy) / p0c

        particles = jnp.stack(
            [x, px, y, py, tau, delta, jnp.ones_like(x)], axis=-1
        )
        return cls(
            particles=particles,
            energy=energy,
            particle_charges=jnp.asarray(particle_group.weight, dtype),
            survival_probabilities=jnp.asarray(particle_group.status, dtype),
            species=species,
        )

    def save_as_openpmd_h5(self, path: str) -> None:
        """Save the beam as an openPMD particle group HDF5 file.

        Uses ``pmd_beamphysics`` when installed (as the reference requires);
        otherwise writes the same openPMD BeamPhysics schema natively via
        :mod:`cheetah_tpu.converters.openpmd`.
        """
        try:
            self.to_openpmd_particlegroup().write(str(path))
        except ImportError:
            from cheetah_tpu.converters.openpmd import write_particle_group_h5

            write_particle_group_h5(self._to_openpmd_data(), path)

    def _to_openpmd_data(self) -> dict:
        """The beam as an openPMD BeamPhysics data dict — the exact dict the
        reference passes to ``openpmd.ParticleGroup(data=...)`` (ref
        ``particle_beam.py:1019-1030``): positions in m, momenta in eV/c,
        time in s, macro charges in C, integer status flags."""
        import numpy as np

        if self.particles.ndim != 2:
            raise ValueError(
                "Only non-vectorised particle distributions are supported."
            )

        px = self.px * self.p0c
        py = self.py * self.p0c
        p_total = jnp.sqrt(
            jnp.square(self.energies) - jnp.square(self.species.mass_eV)
        )
        pz = jnp.sqrt(jnp.square(p_total) - jnp.square(px) - jnp.square(py))
        t = self.tau / constants.speed_of_light
        status = self.survival_probabilities > 0.5

        return {
            "x": np.asarray(self.x),
            "y": np.asarray(self.y),
            "z": np.asarray(self.tau),
            "px": np.asarray(px),
            "py": np.asarray(py),
            "pz": np.asarray(pz),
            "t": np.asarray(t),
            "weight": np.asarray(self.particle_charges),
            "status": np.asarray(status).astype(int),
            "species": self.species.name,
        }

    def to_openpmd_particlegroup(self):
        """Convert to an openPMD ``ParticleGroup`` (ref
        ``particle_beam.py:984-1032``). Unvectorised beams only; survival
        probabilities are thresholded at 0.5 into boolean status flags.

        Requires ``pmd_beamphysics`` (the returned object is its class); for
        dependency-free file I/O use :meth:`save_as_openpmd_h5` /
        :meth:`from_openpmd_file`, which fall back to the native h5py layer.
        """
        try:
            import pmd_beamphysics as openpmd
        except ImportError:
            raise ImportError(
                "To use the openPMD beam export, openPMD-beamphysics must be "
                "installed."
            )

        return openpmd.ParticleGroup(data=self._to_openpmd_data())

    @classmethod
    def from_xyz_pxpypz(
        cls,
        xp_coordinates: Array,
        energy: Array,
        particle_charges: Array | None = None,
        survival_probabilities: Array | None = None,
        s: Array | None = None,
        species: Species | None = None,
        dtype: jnp.dtype | None = None,
    ) -> "ParticleBeam":
        """Create a beam from SI phase-space coordinates ``(x, p_x, y, p_y, z,
        p_z, 1)`` (momenta in kg m/s; ref ``particle_beam.py:1262-1314``)."""
        beam = cls(
            particles=jnp.asarray(xp_coordinates, dtype=dtype),
            energy=energy,
            particle_charges=particle_charges,
            survival_probabilities=survival_probabilities,
            s=s,
            species=species,
        )
        xp = beam.particles

        p0 = (
            beam.relativistic_gamma
            * beam.relativistic_beta
            * beam.species.mass_kg
            * constants.speed_of_light
        )
        # Normalise by p0 before squaring: SI momenta squared underflow
        # float32 (see `to_xyz_pxpypz`); the p0-relative form is exact.
        px_rel = xp[..., 1] / p0[..., None]
        py_rel = xp[..., 3] / p0[..., None]
        pz_rel = xp[..., 5] / p0[..., None]
        p_rel = jnp.sqrt(
            jnp.square(px_rel) + jnp.square(py_rel) + jnp.square(pz_rel)
        )
        # p / (m c) = (|p|/p0) * gamma0 * beta0.
        gamma = jnp.sqrt(
            1.0
            + jnp.square(
                p_rel
                * (beam.relativistic_gamma * beam.relativistic_beta)[..., None]
            )
        )

        particles = xp
        particles = particles.at[..., 1].set(px_rel)
        particles = particles.at[..., 3].set(py_rel)
        particles = particles.at[..., 4].set(
            -xp[..., 4] / beam.relativistic_beta[..., None]
        )
        particles = particles.at[..., 5].set(
            (gamma - beam.relativistic_gamma[..., None])
            / (beam.relativistic_beta * beam.relativistic_gamma)[..., None]
        )
        beam.particles = particles
        return beam

    def to_xyz_pxpypz(self) -> Array:
        """Extract SI phase-space coordinates ``(x, p_x, y, p_y, z, p_z, 1)``
        (ref ``particle_beam.py:1316-1346``)."""
        p0 = (
            self.relativistic_gamma
            * self.relativistic_beta
            * self.species.mass_kg
            * constants.speed_of_light
        )
        gamma = self.relativistic_gamma[..., None] * (
            1.0 + self.particles[..., 5] * self.relativistic_beta[..., None]
        )
        beta = jnp.sqrt(1.0 - 1.0 / jnp.square(gamma))
        # Work in units of p0: SI momenta squared (~1e-39 kg^2 m^2/s^2 for
        # electrons) underflow float32, which makes sqrt/division *gradients*
        # NaN. The O(1) ratio |p|/p0 = gamma*beta / (gamma0*beta0) is exact
        # and f32-safe.
        rel_momentum = (
            gamma
            * beta
            / (self.relativistic_gamma * self.relativistic_beta)[..., None]
        )

        px = self.particles[..., 1] * p0[..., None]
        py = self.particles[..., 3] * p0[..., None]
        zs = self.particles[..., 4] * -self.relativistic_beta[..., None]
        pz = p0[..., None] * jnp.sqrt(
            jnp.square(rel_momentum)
            - jnp.square(self.particles[..., 1])
            - jnp.square(self.particles[..., 3])
        )

        xp = self.particles
        xp = xp.at[..., 1].set(px)
        xp = xp.at[..., 3].set(py)
        xp = xp.at[..., 4].set(zs)
        xp = xp.at[..., 5].set(pz)
        return xp

    # ------------------------------------------------------------------
    # Transformations
    # ------------------------------------------------------------------

    def transformed_to(
        self,
        mu_x: Array | None = None,
        mu_px: Array | None = None,
        mu_y: Array | None = None,
        mu_py: Array | None = None,
        mu_tau: Array | None = None,
        mu_p: Array | None = None,
        sigma_x: Array | None = None,
        sigma_px: Array | None = None,
        sigma_y: Array | None = None,
        sigma_py: Array | None = None,
        sigma_tau: Array | None = None,
        sigma_p: Array | None = None,
        energy: Array | None = None,
        total_charge: Array | None = None,
        species: Species | None = None,
    ) -> "ParticleBeam":
        """Return this beam shifted/scaled to new first and second moments
        (ref ``particle_beam.py:1034-1158``)."""
        mu_x = mu_x if mu_x is not None else self.mu_x
        mu_px = mu_px if mu_px is not None else self.mu_px
        mu_y = mu_y if mu_y is not None else self.mu_y
        mu_py = mu_py if mu_py is not None else self.mu_py
        mu_tau = mu_tau if mu_tau is not None else self.mu_tau
        mu_p = mu_p if mu_p is not None else self.mu_p
        sigma_x = sigma_x if sigma_x is not None else self.sigma_x
        sigma_px = sigma_px if sigma_px is not None else self.sigma_px
        sigma_y = sigma_y if sigma_y is not None else self.sigma_y
        sigma_py = sigma_py if sigma_py is not None else self.sigma_py
        sigma_tau = sigma_tau if sigma_tau is not None else self.sigma_tau
        sigma_p = sigma_p if sigma_p is not None else self.sigma_p
        energy = energy if energy is not None else self.energy
        if total_charge is None:
            particle_charges = self.particle_charges
        else:
            total_charge = jnp.asarray(total_charge, dtype=self.particle_charges.dtype)
            particle_charges = (
                jnp.ones_like(self.particle_charges)
                * total_charge[..., None]
                / self.particle_charges.shape[-1]
            )
        species = species if species is not None else self.species

        new_mu = jnp.stack(
            jnp.broadcast_arrays(mu_x, mu_px, mu_y, mu_py, mu_tau, mu_p), axis=-1
        )
        new_sigma = jnp.stack(
            jnp.broadcast_arrays(
                sigma_x, sigma_px, sigma_y, sigma_py, sigma_tau, sigma_p
            ),
            axis=-1,
        )
        old_mu = jnp.stack(
            jnp.broadcast_arrays(
                self.mu_x, self.mu_px, self.mu_y, self.mu_py, self.mu_tau, self.mu_p
            ),
            axis=-1,
        )
        old_sigma = jnp.stack(
            jnp.broadcast_arrays(
                self.sigma_x,
                self.sigma_px,
                self.sigma_y,
                self.sigma_py,
                self.sigma_tau,
                self.sigma_p,
            ),
            axis=-1,
        )

        phase_space = self.particles[..., :6]
        phase_space = (phase_space - old_mu[..., None, :]) / old_sigma[
            ..., None, :
        ] * new_sigma[..., None, :] + new_mu[..., None, :]
        particles = jnp.concatenate(
            [phase_space, jnp.ones_like(phase_space[..., :1])], axis=-1
        )

        return self.__class__(
            particles=particles,
            energy=energy,
            particle_charges=particle_charges,
            survival_probabilities=self.survival_probabilities,
            s=self.s,
            species=species,
        )

    def as_parameter_beam(self) -> "ParameterBeam":  # noqa: F821
        """Collapse to a Gaussian-moments :class:`ParameterBeam`."""
        from cheetah_tpu.particles.parameter_beam import ParameterBeam

        mu = jnp.sum(
            self.particles * self.survival_probabilities[..., None], axis=-2
        ) / jnp.sum(self.survival_probabilities, axis=-1, keepdims=True)
        cov = unbiased_weighted_covariance_matrix(
            self.particles, self.survival_probabilities
        )
        return ParameterBeam(
            mu=mu,
            cov=cov,
            energy=self.energy,
            total_charge=self.total_charge,
            s=self.s,
            species=self.species,
        )

    def linspaced(self, num_particles: int) -> "ParticleBeam":
        """Evenly spaced beam with this beam's first/second moments."""
        return self.make_linspaced(
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

    def randomly_subsampled(
        self,
        num_particles: int,
        adjust_particle_charges: bool = True,
        key: Array | None = None,
    ) -> "ParticleBeam":
        """Random subsample of ``num_particles`` macroparticles (ref
        ``particle_beam.py:1212-1260``)."""
        assert num_particles <= self.num_particles, (
            "Number of particles to sample must be less than or equal to the "
            "number of particles in the original beam."
        )
        key = ensure_key(key)
        indices = jax.random.permutation(key, self.num_particles)[:num_particles]

        subsampled = self.__class__(
            particles=jnp.take(self.particles, indices, axis=-2),
            energy=self.energy,
            particle_charges=jnp.take(self.particle_charges, indices, axis=-1),
            survival_probabilities=jnp.take(
                self.survival_probabilities, indices, axis=-1
            ),
            s=self.s,
            species=self.species,
        )
        if adjust_particle_charges:
            subsampled.particle_charges = subsampled.particle_charges * (
                self.total_charge / subsampled.total_charge
            )
        return subsampled

    def clone(self) -> "ParticleBeam":
        """Copy of the beam (arrays are immutable in JAX; returns a new pytree)."""
        return self.__class__(
            particles=self.particles,
            energy=self.energy,
            particle_charges=self.particle_charges,
            survival_probabilities=self.survival_probabilities,
            s=self.s,
            species=self.species.clone(),
        )

    # ------------------------------------------------------------------
    # Coordinates and statistics
    # ------------------------------------------------------------------

    def __len__(self) -> int:
        return int(self.num_particles)

    # ------------------------------------------------------------------
    # Visualisation (thin delegations into cheetah_tpu.plotting)
    # ------------------------------------------------------------------

    def plot_1d_distribution(self, dimension, **kwargs):
        """1D histogram of one phase-space dimension (ref
        ``particle_beam.py:1348``)."""
        from cheetah_tpu import plotting

        return plotting.plot_1d_distribution(self, dimension, **kwargs)

    def plot_2d_distribution(self, x_dimension, y_dimension, **kwargs):
        """2D histogram/contour of two phase-space dimensions (ref
        ``particle_beam.py:1400``)."""
        from cheetah_tpu import plotting

        return plotting.plot_2d_distribution(self, x_dimension, y_dimension, **kwargs)

    def plot_distribution(self, **kwargs):
        """Corner plot over all phase-space dimensions (ref
        ``particle_beam.py:1489``)."""
        from cheetah_tpu import plotting

        return plotting.plot_distribution(self, **kwargs)

    def plot_point_cloud(self, **kwargs):
        """3D scatter of the spatial coordinates (ref
        ``particle_beam.py:1630``)."""
        from cheetah_tpu import plotting

        return plotting.plot_point_cloud(self, **kwargs)

    @property
    def total_charge(self) -> Array:
        """Total charge in C, accounting for particle losses."""
        return jnp.sum(self.particle_charges * self.survival_probabilities, axis=-1)

    @property
    def num_particles(self) -> int:
        """Number of macroparticles (ignoring losses)."""
        return self.particles.shape[-2]

    @property
    def num_particles_survived(self) -> Array:
        """Expected number of surviving macroparticles."""
        return jnp.sum(self.survival_probabilities, axis=-1)

    @property
    def x(self) -> Array:
        return self.particles[..., 0]

    @x.setter
    def x(self, value: Array) -> None:
        self.particles = self.particles.at[..., 0].set(value)

    @property
    def px(self) -> Array:
        return self.particles[..., 1]

    @px.setter
    def px(self, value: Array) -> None:
        self.particles = self.particles.at[..., 1].set(value)

    @property
    def y(self) -> Array:
        return self.particles[..., 2]

    @y.setter
    def y(self, value: Array) -> None:
        self.particles = self.particles.at[..., 2].set(value)

    @property
    def py(self) -> Array:
        return self.particles[..., 3]

    @py.setter
    def py(self, value: Array) -> None:
        self.particles = self.particles.at[..., 3].set(value)

    @property
    def tau(self) -> Array:
        return self.particles[..., 4]

    @tau.setter
    def tau(self, value: Array) -> None:
        self.particles = self.particles.at[..., 4].set(value)

    @property
    def p(self) -> Array:
        return self.particles[..., 5]

    @p.setter
    def p(self, value: Array) -> None:
        self.particles = self.particles.at[..., 5].set(value)

    def _weighted_mean(self, values: Array) -> Array:
        return jnp.sum(values * self.survival_probabilities, axis=-1) / jnp.sum(
            self.survival_probabilities, axis=-1
        )

    def _component_moments(self) -> tuple[Array, Array]:
        """Weighted mean and unbiased variance of ALL phase-space components
        in one pass over the particle array, shapes ``(..., 7)``.

        The reduction over particles runs BEFORE any component is sliced
        out. Under jit this is the difference between the beam-size readout
        fusing into the epilogue of the transport matmul that produced
        ``particles`` and that matmul's ``(..., N, 7)`` output making a full
        HBM round trip: slicing a component first forces the materialisation
        (1.15 GB at 4096x10k, measured 2.15 ms); reducing first measures
        0.43 ms on the same workload (PERF_NOTES.md "anatomy").

        The single pass requires the raw-moment identity
        ``Var = E[x^2] - mu^2`` (the numerically-stabler centered form needs
        a second pass, which re-materialises: measured 3.1 ms). For beams
        with ``|mu| >> sigma`` this costs relative precision
        ``~eps * (mu/sigma)^2`` — negligible for physical beams in f32 and
        exact headroom in f64; the variance is clamped at 0.
        """
        weights = self.survival_probabilities
        particles = self.particles
        # Eager memoization by array identity: reading the usual dozen
        # statistics costs ONE pass instead of one per property. The setters
        # replace `particles`/`survival_probabilities` wholesale, so an
        # identity mismatch is exactly "the beam changed". Tracers are never
        # cached (no leaks onto live objects); under jit XLA CSEs the
        # recomputation anyway.
        cached = getattr(self, "_moments_cache", None)
        if (
            cached is not None
            and cached[0] is particles
            and cached[1] is weights
        ):
            return cached[2], cached[3]

        total = jnp.sum(weights, axis=-1)
        s1 = jnp.sum(particles * weights[..., None], axis=-2)
        s2 = jnp.sum(jnp.square(particles) * weights[..., None], axis=-2)
        mean = s1 / total[..., None]
        correction = total - jnp.sum(jnp.square(weights), axis=-1) / total
        variance = (
            jnp.maximum(s2 - total[..., None] * jnp.square(mean), 0.0)
            / correction[..., None]
        )
        if not any(
            isinstance(value, jax.core.Tracer) for value in (particles, weights)
        ):
            self._moments_cache = (particles, weights, mean, variance)
        return mean, variance

    @property
    def mu_x(self) -> Array:
        return self._component_moments()[0][..., 0]

    @property
    def sigma_x(self) -> Array:
        return jnp.sqrt(self._component_moments()[1][..., 0])

    @property
    def mu_px(self) -> Array:
        return self._component_moments()[0][..., 1]

    @property
    def sigma_px(self) -> Array:
        return jnp.sqrt(self._component_moments()[1][..., 1])

    @property
    def mu_y(self) -> Array:
        return self._component_moments()[0][..., 2]

    @property
    def sigma_y(self) -> Array:
        return jnp.sqrt(self._component_moments()[1][..., 2])

    @property
    def mu_py(self) -> Array:
        return self._component_moments()[0][..., 3]

    @property
    def sigma_py(self) -> Array:
        return jnp.sqrt(self._component_moments()[1][..., 3])

    @property
    def mu_tau(self) -> Array:
        return self._component_moments()[0][..., 4]

    @property
    def sigma_tau(self) -> Array:
        return jnp.sqrt(self._component_moments()[1][..., 4])

    @property
    def mu_p(self) -> Array:
        return self._component_moments()[0][..., 5]

    @property
    def sigma_p(self) -> Array:
        return jnp.sqrt(self._component_moments()[1][..., 5])

    def _weighted_cov(self, a: Array, b: Array) -> Array:
        return unbiased_weighted_covariance(a, b, self.survival_probabilities)

    @property
    def cov_xpx(self) -> Array:
        return self._weighted_cov(self.x, self.px)

    @property
    def cov_ypy(self) -> Array:
        return self._weighted_cov(self.y, self.py)

    @property
    def cov_taup(self) -> Array:
        return self._weighted_cov(self.tau, self.p)

    @property
    def cov_xp(self) -> Array:
        return self._weighted_cov(self.x, self.p)

    @property
    def cov_pxp(self) -> Array:
        return self._weighted_cov(self.px, self.p)

    @property
    def cov_yp(self) -> Array:
        return self._weighted_cov(self.y, self.p)

    @property
    def cov_pyp(self) -> Array:
        return self._weighted_cov(self.py, self.p)

    @property
    def cov_xy(self) -> Array:
        return self._weighted_cov(self.x, self.y)

    @property
    def cov_xpy(self) -> Array:
        return self._weighted_cov(self.x, self.py)

    @property
    def cov_xtau(self) -> Array:
        return self._weighted_cov(self.x, self.tau)

    @property
    def cov_pxy(self) -> Array:
        return self._weighted_cov(self.px, self.y)

    @property
    def cov_pxpy(self) -> Array:
        return self._weighted_cov(self.px, self.py)

    @property
    def cov_pxtau(self) -> Array:
        return self._weighted_cov(self.px, self.tau)

    @property
    def cov_ytau(self) -> Array:
        return self._weighted_cov(self.y, self.tau)

    @property
    def cov_pytau(self) -> Array:
        return self._weighted_cov(self.py, self.tau)

    @property
    def defining_features(self) -> list[str]:
        """Features that define the beam (for equality and serialisation)."""
        return [
            "particles",
            "energy",
            "particle_charges",
            "survival_probabilities",
            "s",
            "species",
        ]

    @property
    def energies(self) -> Array:
        """Energies of the individual particles in eV."""
        return self.p * self.p0c[..., None] + self.energy[..., None]

    @property
    def momenta(self) -> Array:
        """Momenta (times c) of the individual particles in eV."""
        return jnp.sqrt(jnp.square(self.energies) - jnp.square(self.species.mass_eV))

    def __getitem__(self, item: Any) -> "ParticleBeam":
        """Index into the vector dimensions (broadcast-then-index, ref
        ``particle_beam.py:1976-2001``)."""
        vector_shape = jnp.broadcast_shapes(
            self.particles.shape[:-2],
            self.energy.shape,
            self.particle_charges.shape[:-1],
            self.survival_probabilities.shape[:-1],
        )
        n = self.num_particles
        return self.__class__(
            particles=jnp.broadcast_to(self.particles, (*vector_shape, n, 7))[item],
            energy=jnp.broadcast_to(self.energy, vector_shape)[item],
            particle_charges=jnp.broadcast_to(
                self.particle_charges, (*vector_shape, n)
            )[item],
            survival_probabilities=jnp.broadcast_to(
                self.survival_probabilities, (*vector_shape, n)
            )[item],
            s=self.s,
            species=self.species,
        )
