"""Space-charge kick (ref ``cheetah/accelerator/space_charge_kick.py:10-609``).

Integrated-Green-function (Hockney) FFT solver in the lab frame with a
gamma-scaled longitudinal coordinate:

1. Deposit the charge onto a ``grid_shape`` grid sized to the actual beam
   sigmas (CIC, differentiable).
2. Solve the modified Poisson equation by convolving with the tabulated
   integrated Green function on a 2x zero-padded grid (``jnp.fft.rfftn``).
3. Central-difference the potential into force fields (scaled by -1/gamma^2).
4. Gather the force back to the particles with trilinear interpolation and
   apply the momentum kick ``p += F dt``.

TPU-design notes vs. the reference:

- The deposit is the batched ``segment_sum`` CIC kernel
  (:mod:`cheetah_tpu.ops.cloud_in_cell`); the FFT rides XLA's native FFT.
- The reference gathers the 8 corner forces and then ``scatter_add``\\ s them
  back per particle (``space_charge_kick.py:419-475``); here the gather is a
  batched ``take_along_axis`` reshaped to ``(..., N, 8)`` and summed — no
  scatter at all.
- Positions are unmodified; interleave with ``Drift``\\ s (e.g. via
  ``Segment`` construction) for a split-operator integration.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element, ZeroLengthMixin
from cheetah_tpu.constants import elementary_charge, epsilon_0, speed_of_light
from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_charge_deposition
from cheetah_tpu.particles import Beam, ParticleBeam
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class SpaceChargeKick(ZeroLengthMixin, Element):
    """Applies the integrated space-charge momentum kick over
    ``effect_length``.

    :param effect_length: Length over which the effect is applied in m.
    :param grid_shape: Grid points in (x, y, tau) (static).
    :param grid_extent_x: Grid half-extent in x as a multiple of sigma_x.
    :param grid_extent_y: Grid half-extent in y as a multiple of sigma_y.
    :param grid_extent_tau: Grid half-extent in tau as a multiple of
        sigma_tau.
    :param particle_axis: Name of a ``shard_map`` mesh axis over which the
        beam's particle dimension is sharded (static). When set, the kick
        performs its cross-shard collectives explicitly: the grid-sizing
        beam moments and the deposited charge grid are ``psum``-reduced over
        the axis, while the Poisson solve is replicated and the force gather
        stays local. This is the multi-chip path that composes with the
        Pallas kernels (GSPMD cannot partition ``pallas_call``); under plain
        GSPMD sharding leave it ``None`` and XLA derives the same
        collectives for the XLA code path.
    :param name: Unique identifier of the element.

    .. note:: On the default TPU dispatch path the CIC deposit/gather run as
        Pallas kernels registered as JAX primitives whose jvp and transpose
        rules re-bind the same kernels at raised derivative orders —
        ``jax.grad``/``jax.jacrev``, ``jax.jvp``/``jax.jacfwd``,
        ``jax.hessian`` and ``jax.vmap`` through :meth:`track` (and any
        composition, to any order) all stay on-kernel.
        ``cheetah_tpu.ops.pallas_cic.ENABLED = False`` falls back to the XLA
        formulation, which differentiates identically (a.e.-equal
        derivatives, f32 accumulation order aside).
    """

    effect_length: Array
    grid_extent_x: Array
    grid_extent_y: Array
    grid_extent_tau: Array
    name: str = static_field(None)
    grid_shape: tuple = static_field((32, 32, 32))
    particle_axis: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        effect_length: Array,
        grid_shape: tuple[int, int, int] = (32, 32, 32),
        grid_extent_x: Array | None = None,
        grid_extent_y: Array | None = None,
        grid_extent_tau: Array | None = None,
        particle_axis: str | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.effect_length = as_float_array(effect_length, dtype=dtype)
        dtype = self.effect_length.dtype
        self.grid_shape = tuple(grid_shape)
        self.particle_axis = particle_axis
        self.grid_extent_x = as_float_array(
            grid_extent_x if grid_extent_x is not None else 3.0, dtype=dtype
        )
        self.grid_extent_y = as_float_array(
            grid_extent_y if grid_extent_y is not None else 3.0, dtype=dtype
        )
        self.grid_extent_tau = as_float_array(
            grid_extent_tau if grid_extent_tau is not None else 3.0, dtype=dtype
        )
        self._init_element(name, sanitize_name, metadata)

    @property
    def is_skippable(self) -> bool:
        return False

    def _global_weighted_std(self, values: Array, weights: Array) -> Array:
        """Unbiased weighted std over the LOCAL particle axis combined with a
        ``psum`` over ``self.particle_axis`` — the moment-sum form of
        ``utils.statistics.unbiased_weighted_std``, exact up to rounding."""
        sums = jnp.stack(
            [
                jnp.sum(weights, axis=-1),
                jnp.sum(weights * values, axis=-1),
                jnp.sum(weights * jnp.square(values), axis=-1),
                jnp.sum(jnp.square(weights), axis=-1),
            ]
        )
        sw, swx, swx2, sw2 = jax.lax.psum(sums, self.particle_axis)
        mean = swx / sw
        correction = sw - sw2 / sw
        return jnp.sqrt((swx2 - sw * jnp.square(mean)) / correction)

    # ------------------------------------------------------------------
    # Green function
    # ------------------------------------------------------------------

    @staticmethod
    def _integrated_potential(x: Array, y: Array, tau: Array) -> Array:
        """Closed-form integrated potential (ref
        ``space_charge_kick.py:103-123``); evaluated only at half-cell offsets
        where all arguments are nonzero."""
        r = jnp.sqrt(jnp.square(x) + jnp.square(y) + jnp.square(tau))
        return (
            -0.5 * jnp.square(tau) * jnp.arctan(x * y / (tau * r))
            - 0.5 * jnp.square(y) * jnp.arctan(x * tau / (y * r))
            - 0.5 * jnp.square(x) * jnp.arctan(y * tau / (x * r))
            + y * tau * jnp.arcsinh(x / jnp.sqrt(jnp.square(y) + jnp.square(tau)))
            + x * tau * jnp.arcsinh(y / jnp.sqrt(jnp.square(x) + jnp.square(tau)))
            + x * y * jnp.arcsinh(tau / jnp.sqrt(jnp.square(x) + jnp.square(y)))
        )

    def _integrated_green_function(self, gamma: Array, cell_size: Array) -> Array:
        """Tabulate the IGF via 8 corner evaluations and mirror it into all
        octants of the 2x grid (ref ``space_charge_kick.py:163-291``)."""
        nx, ny, nt = self.grid_shape
        dx = cell_size[..., 0]
        dy = cell_size[..., 1]
        # Longitudinal dimension scaled by gamma: modified Poisson equation in
        # the lab frame.
        dt = cell_size[..., 2] * gamma

        # The 8 corner evaluations P(x_i +- hx, y_j +- hy, t_k +- ht) over the
        # cell grid visit only (nx+1)(ny+1)(nt+1) DISTINCT half-integer corner
        # points — tabulating the (transcendental-heavy) potential once on
        # that corner grid and taking the 3D mixed finite difference is the
        # same sum of the same values in the same order, with 7.3x fewer
        # evaluations (measured 0.22 -> 0.03 ms of a 0.25 ms kick on v5e).
        ix = jnp.arange(nx + 1, dtype=cell_size.dtype) - 0.5
        iy = jnp.arange(ny + 1, dtype=cell_size.dtype) - 0.5
        it = jnp.arange(nt + 1, dtype=cell_size.dtype) - 0.5
        ix_g, iy_g, it_g = jnp.meshgrid(ix, iy, it, indexing="ij")

        bc = lambda v: v[..., None, None, None]  # noqa: E731
        Phi = self._integrated_potential(ix_g * bc(dx), iy_g * bc(dy), it_g * bc(dt))

        lo, hi = slice(None, -1), slice(1, None)
        G = (
            Phi[..., hi, hi, hi]
            - Phi[..., lo, hi, hi]
            - Phi[..., hi, lo, hi]
            - Phi[..., hi, hi, lo]
            + Phi[..., hi, lo, lo]
            + Phi[..., lo, hi, lo]
            + Phi[..., lo, lo, hi]
            - Phi[..., lo, lo, lo]
        )

        # Mirror into all 8 octants of the doubled grid (open-boundary
        # Hockney): per axis the doubled layout is [G, zero plane,
        # flip(G[1:])]. Three concatenations instead of a zeros-init plus 8
        # dynamic-update-slices (each of which is a separate full-grid copy
        # kernel on TPU); cross-octant mirrors fall out of applying the axes
        # sequentially.
        def mirror(a: Array, axis: int) -> Array:
            shape = list(a.shape)
            shape[axis] = 1
            zero = jnp.zeros(shape, a.dtype)
            n = a.shape[axis]
            body = jnp.flip(jax.lax.slice_in_dim(a, 1, n, axis=axis), axis)
            return jnp.concatenate([a, zero, body], axis)

        return mirror(mirror(mirror(G, -1), -2), -3)

    # ------------------------------------------------------------------
    # Poisson solve
    # ------------------------------------------------------------------

    def _charge_density(
        self,
        beam: ParticleBeam,
        positions: Array,
        cell_size: Array,
        grid_dimensions: Array,
    ) -> Array:
        """CIC deposit, normalised to density, zero-padded to the 2x grid
        (ref ``space_charge_kick.py:125-161``)."""
        charge_grid = cloud_in_cell_charge_deposition(
            positions=positions,
            bins=self.grid_shape,
            extent=jnp.stack([-grid_dimensions, grid_dimensions], axis=-1),
            charges=beam.particle_charges * beam.survival_probabilities,
        )
        if self.particle_axis is not None:
            # Explicit shard_map collective: each shard deposited its local
            # particles; the physical grid is the sum over shards.
            charge_grid = jax.lax.psum(charge_grid, self.particle_axis)
        inv_cell_volume = 1.0 / jnp.prod(cell_size, axis=-1)
        charge_density = charge_grid * inv_cell_volume[..., None, None, None]

        nx, ny, nt = self.grid_shape
        padded = jnp.zeros(
            (*charge_density.shape[:-3], 2 * nx, 2 * ny, 2 * nt),
            dtype=charge_density.dtype,
        )
        return padded.at[..., :nx, :ny, :nt].set(charge_density)

    def _solve_poisson_equation(
        self,
        beam: ParticleBeam,
        positions: Array,
        cell_size: Array,
        grid_dimensions: Array,
    ) -> Array:
        """FFT convolution on the 2x grid, cropped to the physical octant
        (ref ``space_charge_kick.py:293-322``)."""
        rho = self._charge_density(beam, positions, cell_size, grid_dimensions)
        igf = self._integrated_green_function(beam.relativistic_gamma, cell_size)

        axes = (-3, -2, -1)
        potential_ft = jnp.fft.rfftn(rho, axes=axes) * jnp.fft.rfftn(igf, axes=axes)
        potential = (1.0 / (4 * jnp.pi * epsilon_0)) * jnp.fft.irfftn(
            potential_ft, s=rho.shape[-3:], axes=axes
        )

        nx, ny, nt = self.grid_shape
        return potential[..., :nx, :ny, :nt]

    def _force_fields(
        self,
        beam: ParticleBeam,
        positions: Array,
        cell_size: Array,
        grid_dimensions: Array,
    ) -> tuple[Array, Array, Array]:
        """Central-difference force fields with zero boundaries, scaled by
        ``-1/gamma^2`` (ref ``space_charge_kick.py:324-365``)."""
        gamma = beam.relativistic_gamma
        gamma_safe = jnp.where(gamma != 0, gamma, jnp.ones_like(gamma))
        igamma2 = jnp.where(gamma != 0, 1.0 / jnp.square(gamma_safe), 0.0)

        potential = self._solve_poisson_equation(
            beam, positions, cell_size, grid_dimensions
        )

        def central_diff(p: Array, axis: int, inv_h: Array) -> Array:
            upper = jnp.roll(p, -1, axis=axis)
            lower = jnp.roll(p, 1, axis=axis)
            grad = (upper - lower) * (0.5 * inv_h[..., None, None, None])
            # Zero boundary conditions on the differentiated axis.
            n = p.shape[axis]
            index = jnp.arange(n)
            interior = (index > 0) & (index < n - 1)
            shape = [1, 1, 1]
            shape[axis + 3] = n
            return grad * interior.reshape(shape[-3:])

        inv_cell = 1.0 / cell_size
        grad_x = -igamma2[..., None, None, None] * central_diff(
            potential, -3, inv_cell[..., 0]
        )
        grad_y = -igamma2[..., None, None, None] * central_diff(
            potential, -2, inv_cell[..., 1]
        )
        grad_tau = -igamma2[..., None, None, None] * central_diff(
            potential, -1, inv_cell[..., 2]
        )
        return grad_x, grad_y, grad_tau

    # ------------------------------------------------------------------
    # Gather
    # ------------------------------------------------------------------

    def _compute_forces(
        self,
        beam: ParticleBeam,
        xp_coordinates: Array,
        cell_size: Array,
        grid_dimensions: Array,
    ) -> Array:
        """Trilinear interpolation of the force grids onto the particles
        (ref ``space_charge_kick.py:367-475``). Batch dims must be flattened
        to one."""
        positions = xp_coordinates[..., jnp.array([0, 2, 4])]
        grad_x, grad_y, grad_tau = self._force_fields(
            beam, positions, cell_size, grid_dimensions
        )
        nx, ny, nt = self.grid_shape

        normalized = (positions + grid_dimensions[..., None, :]) / cell_size[
            ..., None, :
        ]

        from cheetah_tpu.ops.cloud_in_cell import (
            TENSOR_PRODUCT_MAX_CELLS,
            cloud_in_cell_gather_3d,
        )
        from cheetah_tpu.ops.pallas_cic import (
            differentiable_pallas_gather,
            pallas_deposit_available,
        )

        use_pallas = (
            pallas_deposit_available(self.grid_shape)
            and normalized.dtype == jnp.float32
        )
        if use_pallas or nx * ny * nt <= TENSOR_PRODUCT_MAX_CELLS:
            # Scatter/gather-free interpolation via two-hot MXU contractions
            # (same trick as the deposit; much faster than 8-corner gathers).
            # The Pallas kernel's VMEM bound admits larger grids (64^3) than
            # the XLA two-hot, whose HBM materialisation caps it at
            # TENSOR_PRODUCT_MAX_CELLS.
            grids = jnp.stack([grad_x, grad_y, grad_tau], axis=1)  # (B, 3, ...)
            if use_pallas:
                # TPU fast path: two-hot tiles built in VMEM (PERF_NOTES.md).
                values = differentiable_pallas_gather()(grids, normalized)
            else:
                values = cloud_in_cell_gather_3d(grids, normalized)
            forces = jnp.moveaxis(values, 1, -1) * elementary_charge  # (B, N, 3)
            return forces

        cell_indices = jnp.floor(normalized).astype(jnp.int32)  # (B, N, 3)

        offsets = jnp.array(
            [
                [0, 0, 0], [0, 0, 1], [0, 1, 0], [0, 1, 1],
                [1, 0, 0], [1, 0, 1], [1, 1, 0], [1, 1, 1],
            ],
            dtype=jnp.int32,
        )
        surrounding = cell_indices[..., None, :] + offsets  # (B, N, 8, 3)
        weights = 1.0 - jnp.abs(normalized[..., None, :] - surrounding)
        cell_weights = jnp.prod(weights, axis=-1)  # (B, N, 8)

        idx_x = surrounding[..., 0]
        idx_y = surrounding[..., 1]
        idx_t = surrounding[..., 2]
        valid = (
            (idx_x >= 0) & (idx_x < nx)
            & (idx_y >= 0) & (idx_y < ny)
            & (idx_t >= 0) & (idx_t < nt)
        )
        flat_idx = (
            jnp.clip(idx_x, 0, nx - 1) * (ny * nt)
            + jnp.clip(idx_y, 0, ny - 1) * nt
            + jnp.clip(idx_t, 0, nt - 1)
        )  # (B, N, 8)

        batch = flat_idx.shape[0]
        flat_idx_2d = flat_idx.reshape(batch, -1)  # (B, N*8)

        def gather(grid: Array) -> Array:
            values = jnp.take_along_axis(
                grid.reshape(batch, -1), flat_idx_2d, axis=-1
            ).reshape(flat_idx.shape)
            return jnp.where(valid, values, 0.0)

        w = cell_weights * elementary_charge
        force_x = jnp.sum(w * gather(grad_x), axis=-1)
        force_y = jnp.sum(w * gather(grad_y), axis=-1)
        force_tau = jnp.sum(w * gather(grad_tau), axis=-1)
        return jnp.stack([force_x, force_y, force_tau], axis=-1)

    # ------------------------------------------------------------------
    # Tracking
    # ------------------------------------------------------------------

    def track(self, incoming: Beam) -> Beam:
        assert isinstance(
            incoming, ParticleBeam
        ), "SpaceChargeKick tracking is currently only supported for `ParticleBeam`."

        # Sub-f32 beams (bf16/f16 throughput dtypes) compute the collective
        # effect in f32 and cast the result back: the FFT Poisson solve has
        # no sub-f32 kernels (XLA raises "RFFT input must be float32 or
        # float64"), and the density deposit would be meaningless at 8
        # mantissa bits anyway.
        in_dtype = incoming.particles.dtype
        if in_dtype in (jnp.bfloat16, jnp.float16):
            upcast = ParticleBeam(
                particles=incoming.particles.astype(jnp.float32),
                energy=incoming.energy.astype(jnp.float32),
                particle_charges=incoming.particle_charges.astype(jnp.float32),
                survival_probabilities=incoming.survival_probabilities.astype(
                    jnp.float32
                ),
                s=incoming.s,
                species=incoming.species,
            )
            tracked = self.track(upcast)
            return ParticleBeam(
                particles=tracked.particles.astype(in_dtype),
                energy=tracked.energy.astype(incoming.energy.dtype),
                particle_charges=incoming.particle_charges,
                survival_probabilities=incoming.survival_probabilities,
                s=tracked.s,
                species=incoming.species,
            )

        # Flatten all vector dims to one batch dim (reversed at the end).
        vector_shape = jnp.broadcast_shapes(
            incoming.particles.shape[:-2],
            incoming.energy.shape,
            incoming.particle_charges.shape[:-1],
            incoming.survival_probabilities.shape[:-1],
            self.effect_length.shape,
            (1,),
        )
        num_particles = incoming.num_particles
        flattened = ParticleBeam(
            particles=jnp.broadcast_to(
                incoming.particles, (*vector_shape, num_particles, 7)
            ).reshape(-1, num_particles, 7),
            energy=jnp.broadcast_to(incoming.energy, vector_shape).reshape(-1),
            particle_charges=jnp.broadcast_to(
                incoming.particle_charges, (*vector_shape, num_particles)
            ).reshape(-1, num_particles),
            survival_probabilities=jnp.broadcast_to(
                incoming.survival_probabilities, (*vector_shape, num_particles)
            ).reshape(-1, num_particles),
            species=incoming.species,
        )
        effect_length = jnp.broadcast_to(self.effect_length, vector_shape).reshape(-1)

        # Grid geometry from the actual beam sigmas (traced extents, static
        # shapes). Under shard_map (``particle_axis``) the sigmas must be the
        # GLOBAL beam moments, so every shard sizes the same grid.
        if self.particle_axis is not None:
            sigma_x, sigma_y, sigma_tau = (
                self._global_weighted_std(
                    values, flattened.survival_probabilities
                )
                for values in (flattened.x, flattened.y, flattened.tau)
            )
        else:
            sigma_x = flattened.sigma_x
            sigma_y = flattened.sigma_y
            sigma_tau = flattened.sigma_tau
        grid_dimensions = jnp.stack(
            [
                self.grid_extent_x * sigma_x,
                self.grid_extent_y * sigma_y,
                self.grid_extent_tau * sigma_tau,
            ],
            axis=-1,
        )
        cell_size = (
            2 * grid_dimensions / jnp.asarray(self.grid_shape, grid_dimensions.dtype)
        )
        dt = effect_length / (speed_of_light * flattened.relativistic_beta)

        xp_coordinates = flattened.to_xyz_pxpypz()
        forces = self._compute_forces(
            flattened, xp_coordinates, cell_size, grid_dimensions
        )
        xp_coordinates = xp_coordinates.at[..., 1].add(forces[..., 0] * dt[..., None])
        xp_coordinates = xp_coordinates.at[..., 3].add(forces[..., 1] * dt[..., None])
        xp_coordinates = xp_coordinates.at[..., 5].add(forces[..., 2] * dt[..., None])

        outgoing_vector_shape = jnp.broadcast_shapes(
            incoming.particles.shape[:-2],
            incoming.energy.shape,
            incoming.particle_charges.shape[:-1],
            incoming.survival_probabilities.shape[:-1],
            self.effect_length.shape,
        )
        return ParticleBeam.from_xyz_pxpypz(
            xp_coordinates=xp_coordinates.reshape(
                (*outgoing_vector_shape, num_particles, 7)
            ),
            energy=incoming.energy,
            particle_charges=incoming.particle_charges,
            survival_probabilities=incoming.survival_probabilities,
            s=incoming.s,
            species=incoming.species,
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "effect_length",
            "grid_shape",
            "grid_extent_x",
            "grid_extent_y",
            "grid_extent_tau",
        ]
