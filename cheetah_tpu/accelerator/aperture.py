"""Physical aperture (ref ``cheetah/accelerator/aperture.py:15-153``)."""

from __future__ import annotations

import warnings

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element, ZeroLengthMixin
from cheetah_tpu.particles import Beam, ParticleBeam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field
from cheetah_tpu.utils.warnings import PhysicsWarning


@pytree_dataclass(init=False)
class Aperture(ZeroLengthMixin, Element):
    """Physical aperture that (softly) removes particles outside its opening.

    Rather than deleting particles (which would change array shapes), the
    aperture multiplies each particle's ``survival_probability`` by an
    inside-mask — positions are untouched, so the loss is differentiable and
    shapes stay static (ref ``aperture.py:90-132``).

    NOTE: Only affects ``ParticleBeam``\\ s, and only when active.

    :param x_max: Horizontal half-opening in m.
    :param y_max: Vertical half-opening in m.
    :param shape: ``"rectangular"`` or ``"elliptical"`` (static).
    :param is_active: Whether the aperture blocks particles (static).
    :param name: Unique identifier of the element.
    """

    x_max: Array
    y_max: Array
    name: str = static_field(None)
    shape: str = static_field("rectangular")
    is_active: bool = static_field(True)
    metadata: dict = static_field(None)

    def __init__(
        self,
        x_max: Array | None = None,
        y_max: Array | None = None,
        shape: str = "rectangular",
        is_active: bool = True,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        assert shape in ["rectangular", "elliptical"], f"Unknown aperture shape {shape}"
        self.x_max = as_float_array(
            x_max if x_max is not None else float("inf"), dtype=dtype
        )
        dtype = self.x_max.dtype
        self.y_max = as_float_array(
            y_max if y_max is not None else float("inf"), dtype=dtype
        )
        self.shape = shape
        self.is_active = is_active
        self._init_element(name, sanitize_name, metadata)

    @property
    def is_skippable(self) -> bool:
        return not self.is_active

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        energy = jnp.asarray(energy)
        return jnp.broadcast_to(jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7))

    def track(self, incoming: Beam) -> Beam:
        if not self.is_active:
            return incoming
        if not isinstance(incoming, ParticleBeam):
            warnings.warn(
                "Aperture tracking is currently only supported for `ParticleBeam`.",
                PhysicsWarning,
                stacklevel=2,
            )
            return incoming

        if self.shape == "rectangular":
            survived_mask = (
                (incoming.x > -self.x_max[..., None])
                & (incoming.x < self.x_max[..., None])
                & (incoming.y > -self.y_max[..., None])
                & (incoming.y < self.y_max[..., None])
            )
        else:  # elliptical
            survived_mask = (
                jnp.square(incoming.x) / jnp.square(self.x_max)[..., None]
                + jnp.square(incoming.y) / jnp.square(self.y_max)[..., None]
            ) <= 1.0

        return ParticleBeam(
            particles=incoming.particles,
            energy=incoming.energy,
            particle_charges=incoming.particle_charges,
            survival_probabilities=incoming.survival_probabilities * survived_mask,
            s=incoming.s,
            species=incoming.species,
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["x_max", "y_max", "shape", "is_active"]
