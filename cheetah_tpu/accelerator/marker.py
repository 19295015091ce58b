"""Marker element (ref ``cheetah/accelerator/marker.py:44-57``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element, ZeroLengthMixin
from cheetah_tpu.particles import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Marker(ZeroLengthMixin, Element):
    """Zero-length identity element marking a position in the lattice.

    :param name: Unique identifier of the element.
    """

    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self._init_element(name, sanitize_name, metadata)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        energy = jnp.asarray(energy)
        return jnp.broadcast_to(
            jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7)
        )

    def track(self, incoming: Beam) -> Beam:
        return incoming

    @property
    def is_skippable(self) -> bool:
        return True
