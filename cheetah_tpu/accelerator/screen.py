"""Diagnostic screen (ref ``cheetah/accelerator/screen.py:20-383``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element, ZeroLengthMixin
from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_charge_deposition
from cheetah_tpu.particles import Beam, ParameterBeam, ParticleBeam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.kde import kde_histogram_2d
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Screen(ZeroLengthMixin, Element):
    """Diagnostic screen producing a differentiable camera image of the beam.

    Image generation methods (ref ``screen.py:24-29``):

    - ``"histogram"``: fastest; vectorised (unlike the reference, which
      raises on vector dims); piecewise-constant in positions so position
      gradients are zero (weights/charges gradients flow).
    - ``"cloud-in-cell"`` (default): differentiable, vectorised, ~1.5x
      histogram cost.
    - ``"kde"``: differentiable, vectorised, smooth but much more expensive.

    The functional readout is :meth:`observe` (jit-safe); use
    ``Segment.track_with_readings`` to collect images under ``jax.jit``. For
    reference-style ergonomics, eager tracking also caches the read beam so
    ``screen.reading`` works afterwards.

    :param resolution: Camera sensor resolution ``(width, height)`` in pixels
        (static).
    :param pixel_size: Pixel size ``(width, height)`` in m.
    :param binning: Camera binning (static).
    :param misalignment: Screen misalignment ``(x, y)`` in m.
    :param method: ``"histogram"``, ``"kde"`` or ``"cloud-in-cell"`` (static).
    :param kde_bandwidth: KDE bandwidth in m (defaults to pixel width).
    :param is_blocking: Whether the screen stops the beam (static).
    :param is_active: Whether the screen records the beam (static).
    :param name: Unique identifier of the element.
    """

    pixel_size: Array
    misalignment: Array
    kde_bandwidth: Array
    name: str = static_field(None)
    resolution: tuple = static_field((1024, 1024))
    binning: int = static_field(1)
    method: str = static_field("cloud-in-cell")
    is_blocking: bool = static_field(False)
    is_active: bool = static_field(False)
    metadata: dict = static_field(None)

    def __init__(
        self,
        resolution: tuple[int, int] = (1024, 1024),
        pixel_size: Array | None = None,
        binning: int = 1,
        misalignment: Array | None = None,
        method: str = "cloud-in-cell",
        kde_bandwidth: Array | None = None,
        is_blocking: bool = False,
        is_active: bool = False,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        assert (
            isinstance(resolution, (tuple, list)) and len(resolution) == 2
        ), "Invalid resolution. Must be a tuple of 2 integers."
        assert method in [
            "histogram",
            "kde",
            "cloud-in-cell",
        ], f"Invalid method {method}. Must be 'histogram', 'kde', or 'cloud-in-cell'."

        self.pixel_size = as_float_array(
            pixel_size if pixel_size is not None else (1e-3, 1e-3), dtype=dtype
        )
        dtype = self.pixel_size.dtype
        self.misalignment = as_float_array(
            misalignment if misalignment is not None else (0.0, 0.0), dtype=dtype
        )
        self.kde_bandwidth = as_float_array(
            kde_bandwidth if kde_bandwidth is not None else self.pixel_size[0],
            dtype=dtype,
        )
        self.resolution = tuple(resolution)
        self.binning = binning
        self.method = method
        self.is_blocking = is_blocking
        self.is_active = is_active
        self._init_element(name, sanitize_name, metadata)

    @property
    def is_skippable(self) -> bool:
        return not self.is_active

    @property
    def effective_resolution(self) -> tuple[int, int]:
        return (self.resolution[0] // self.binning, self.resolution[1] // self.binning)

    @property
    def effective_pixel_size(self) -> Array:
        return self.pixel_size * self.binning

    @property
    def extent(self) -> Array:
        return jnp.stack(
            [
                -self.resolution[0] * self.pixel_size[0] / 2,
                self.resolution[0] * self.pixel_size[0] / 2,
                -self.resolution[1] * self.pixel_size[1] / 2,
                self.resolution[1] * self.pixel_size[1] / 2,
            ]
        )

    @property
    def pixel_bin_edges(self) -> tuple[Array, Array]:
        return (
            jnp.linspace(
                -self.resolution[0] * self.pixel_size[0] / 2,
                self.resolution[0] * self.pixel_size[0] / 2,
                int(self.effective_resolution[0]) + 1,
            ),
            jnp.linspace(
                -self.resolution[1] * self.pixel_size[1] / 2,
                self.resolution[1] * self.pixel_size[1] / 2,
                int(self.effective_resolution[1]) + 1,
            ),
        )

    @property
    def pixel_bin_centers(self) -> tuple[Array, Array]:
        edges_x, edges_y = self.pixel_bin_edges
        return ((edges_x[1:] + edges_x[:-1]) / 2, (edges_y[1:] + edges_y[:-1]) / 2)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        energy = jnp.asarray(energy)
        return jnp.broadcast_to(jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7))

    def track(self, incoming: Beam) -> Beam:
        if self.is_active:
            shifted = self._misalignment_shifted(incoming)
            # Eager convenience cache for the `reading` property; skipped when
            # tracing so no tracers leak onto the live object.
            if not any(
                isinstance(leaf, jax.core.Tracer)
                for leaf in jax.tree_util.tree_leaves(shifted)
            ):
                self._read_beam = shifted
                self._cached_reading = None

        if self.is_active and self.is_blocking:
            # Blocking screens zero out the beam's charge (ref screen.py:217-237).
            if isinstance(incoming, ParameterBeam):
                return ParameterBeam(
                    mu=incoming.mu,
                    cov=incoming.cov,
                    energy=incoming.energy,
                    total_charge=jnp.zeros_like(incoming.total_charge),
                    s=incoming.s,
                    species=incoming.species,
                )
            elif isinstance(incoming, ParticleBeam):
                return ParticleBeam(
                    particles=incoming.particles,
                    energy=incoming.energy,
                    particle_charges=incoming.particle_charges,
                    survival_probabilities=jnp.zeros_like(
                        incoming.survival_probabilities
                    ),
                    s=incoming.s,
                    species=incoming.species,
                )
        return incoming

    def _misalignment_shifted(self, incoming: Beam) -> Beam:
        """The beam as seen by the screen (shifted by its misalignment)."""
        if isinstance(incoming, ParameterBeam):
            mu = incoming.mu
            misalignment = self.misalignment.astype(mu.dtype)
            # A vectorised misalignment (e.g. (2, 3, 2)) broadcasts against
            # the beam's own batch dims (ref ``tests/test_vectorized.py:307``).
            batch = jnp.broadcast_shapes(
                mu.shape[:-1], misalignment.shape[:-1]
            )
            mu = jnp.broadcast_to(mu, (*batch, mu.shape[-1]))
            mu = mu.at[..., 0].add(-misalignment[..., 0])
            mu = mu.at[..., 2].add(-misalignment[..., 1])
            return ParameterBeam(
                mu=mu,
                cov=incoming.cov,
                energy=incoming.energy,
                total_charge=incoming.total_charge,
                s=incoming.s,
                species=incoming.species,
            )
        elif isinstance(incoming, ParticleBeam):
            particles = incoming.particles
            misalignment = self.misalignment.astype(particles.dtype)
            batch = jnp.broadcast_shapes(
                particles.shape[:-2], misalignment.shape[:-1]
            )
            particles = jnp.broadcast_to(
                particles, (*batch, *particles.shape[-2:])
            )
            particles = particles.at[..., 0].add(-misalignment[..., 0, None])
            particles = particles.at[..., 2].add(-misalignment[..., 1, None])
            return ParticleBeam(
                particles=particles,
                energy=incoming.energy,
                particle_charges=incoming.particle_charges,
                survival_probabilities=incoming.survival_probabilities,
                s=incoming.s,
                species=incoming.species,
            )
        else:
            raise TypeError(f"Incoming beam is of invalid type {type(incoming)}")

    def observe(self, incoming: Beam) -> Array:
        """Functional readout: the camera image the screen would record for
        ``incoming``, of shape ``(..., height, width)``. Jit-safe for the
        ``"kde"`` and ``"cloud-in-cell"`` methods."""
        return self._image_of(self._misalignment_shifted(incoming))

    @property
    def reading(self) -> Array:
        """Image reading of the last eagerly tracked beam (ref
        ``screen.py:241-344``)."""
        cached = getattr(self, "_cached_reading", None)
        if cached is not None:
            return cached

        read_beam = getattr(self, "_read_beam", None)
        if read_beam is None:
            image = jnp.zeros(
                (self.effective_resolution[1], self.effective_resolution[0]),
                dtype=self.misalignment.dtype,
            )
        else:
            image = self._image_of(read_beam)
        self._cached_reading = image
        return image

    def _image_of(self, read_beam: Beam) -> Array:
        if isinstance(read_beam, ParameterBeam):
            # Analytic 2D Gaussian pdf over the pixel grid (ref screen.py:252-290).
            # Vectorises over arbitrary leading dims by broadcasting the
            # (..., 2) mean / (..., 2, 2) covariance against the pixel grid
            # (the reference raises ``NotImplementedError`` on vector dims).
            transverse_mu = jnp.stack(
                [read_beam.mu[..., 0], read_beam.mu[..., 2]], axis=-1
            )
            transverse_cov = jnp.stack(
                [
                    jnp.stack(
                        [read_beam.cov[..., 0, 0], read_beam.cov[..., 0, 2]], axis=-1
                    ),
                    jnp.stack(
                        [read_beam.cov[..., 2, 0], read_beam.cov[..., 2, 2]], axis=-1
                    ),
                ],
                axis=-1,
            )
            extent = self.extent
            hstep = self.pixel_size[0] * self.binning
            vstep = self.pixel_size[1] * self.binning
            nx, ny = self.effective_resolution
            xs = extent[0] + hstep * jnp.arange(nx)
            ys = extent[2] + vstep * jnp.arange(ny)
            x, y = jnp.meshgrid(xs, ys, indexing="ij")
            pos = jnp.stack([x, y], axis=-1)
            pdf = jax.scipy.stats.multivariate_normal.pdf(
                pos,
                transverse_mu[..., None, None, :],
                transverse_cov[..., None, None, :, :],
            )
            return jnp.swapaxes(pdf, -1, -2)
        elif isinstance(read_beam, ParticleBeam):
            weights = jnp.abs(read_beam.particle_charges) * (
                read_beam.survival_probabilities
            )
            x, y, weights = jnp.broadcast_arrays(
                read_beam.x, read_beam.y, weights
            )
            if self.method == "histogram":
                # Uniform-grid histogram via bucketize + segment_sum: 4x
                # faster than jnp.histogram2d on TPU (PERF_NOTES.md). Matches
                # histogram2d's edge semantics: the right-most edge is
                # included in the last bin. Vectorises over arbitrary leading
                # dims with a per-instance segment offset (the reference's
                # histogram path raises on vector dims, ``screen.py:291-339``).
                edges_x, edges_y = self.pixel_bin_edges
                nbx, nby = edges_x.shape[0] - 1, edges_y.shape[0] - 1
                batch_shape = x.shape[:-1]
                num_particles = x.shape[-1]
                x = x.reshape(-1, num_particles)
                y = y.reshape(-1, num_particles)
                flat_weights = weights.reshape(-1, num_particles)
                batch = x.shape[0]
                ix = jnp.floor(
                    (x - edges_x[0]) / (edges_x[1] - edges_x[0])
                ).astype(jnp.int32)
                iy = jnp.floor(
                    (y - edges_y[0]) / (edges_y[1] - edges_y[0])
                ).astype(jnp.int32)
                inside = (
                    (x >= edges_x[0])
                    & (x <= edges_x[-1])
                    & (y >= edges_y[0])
                    & (y <= edges_y[-1])
                )
                ix = jnp.clip(ix, 0, nbx - 1)
                iy = jnp.clip(iy, 0, nby - 1)
                offsets = (
                    jnp.arange(batch, dtype=jnp.int32)[:, None] * (nbx * nby)
                )
                image = jax.ops.segment_sum(
                    (flat_weights * inside).reshape(-1),
                    (offsets + ix * nby + iy).reshape(-1),
                    num_segments=batch * nbx * nby,
                ).reshape(*batch_shape, nbx, nby)
                return jnp.swapaxes(image, -1, -2)
            elif self.method == "kde":
                nx, ny = (
                    int(self.effective_resolution[0]),
                    int(self.effective_resolution[1]),
                )
                # Megapixel grids: evaluate the kernels only on a bounding-box
                # window (beam + 10-bandwidth margin) — the dense KDE matmul
                # shrinks by the grid/window area ratio (runtime fallback for
                # wide beams; the screen's bins are uniform by construction).
                window = 512 if nx * ny > 4 * 512 * 512 else None
                image = kde_histogram_2d(
                    x1=x,
                    x2=y,
                    bins1=self.pixel_bin_centers[0],
                    bins2=self.pixel_bin_centers[1],
                    bandwidth=self.kde_bandwidth,
                    weights=weights,
                    window=window,
                )
                return jnp.swapaxes(image, -1, -2)
            else:  # cloud-in-cell
                image = cloud_in_cell_charge_deposition(
                    positions=jnp.stack([x, y], axis=-1),
                    bins=self.effective_resolution,
                    extent=self.extent.reshape(2, 2),
                    charges=weights,
                )
                return jnp.swapaxes(image, -1, -2)
        else:
            raise TypeError(f"Read beam is of invalid type {type(read_beam)}")

    def get_read_beam(self) -> Beam | None:
        return getattr(self, "_read_beam", None)

    def set_read_beam(self, value: Beam | None) -> None:
        self._read_beam = value
        self._cached_reading = None

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "resolution",
            "pixel_size",
            "binning",
            "misalignment",
            "method",
            "kde_bandwidth",
            "is_active",
        ]
