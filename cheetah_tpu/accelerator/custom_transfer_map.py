"""Element wrapping an arbitrary 7x7 transfer map
(ref ``cheetah/accelerator/custom_transfer_map.py:12-135``).

``from_merging_elements`` is the engine of lattice fusion: it folds a run of
skippable elements into one precomposed matrix, tracking a probe beam along to
capture energy dependence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.particles import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class CustomTransferMap(Element):
    """An element representing an arbitrary first-order transfer map.

    :param predefined_transfer_map: Transfer map of shape ``(..., 7, 7)``. The
        bottom row must be ``[0, 0, 0, 0, 0, 0, 1]``.
    :param length: Length of the element in m (0 if not given).
    :param name: Unique identifier of the element.
    """

    predefined_transfer_map: Array
    length: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        predefined_transfer_map: Array,
        length: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        tm = as_float_array(predefined_transfer_map, dtype=dtype)
        assert tm.shape[-2:] == (7, 7)
        if not isinstance(tm, jax.core.Tracer):
            assert bool(jnp.all(tm[..., -1, :-2] == 0.0)) and bool(
                jnp.all(tm[..., -1, -1] == 1.0)
            ), "The seventh row of the transfer map must be [0, 0, 0, 0, 0, 0, 1]."
        self.predefined_transfer_map = tm
        self.length = as_float_array(
            length if length is not None else 0.0, dtype=tm.dtype
        )
        self._init_element(name, sanitize_name, metadata)

    @classmethod
    def from_merging_elements(
        cls, elements: list[Element], incoming_beam: Beam
    ) -> "CustomTransferMap":
        """Fold the transfer maps of consecutive skippable elements into one
        (ref ``custom_transfer_map.py:60-109``).

        :param incoming_beam: Beam entering the first element; needed because
            individual maps may depend on the beam energy at that element.
        """
        assert all(element.is_skippable for element in elements), (
            "Combining the elements in a Segment that is not skippable will "
            "result in incorrect tracking results."
        )

        energy = jnp.asarray(incoming_beam.energy)
        tm = jnp.broadcast_to(
            jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7)
        )
        for element in elements:
            tm = (
                element.first_order_transfer_map(
                    incoming_beam.energy, incoming_beam.species
                )
                @ tm
            )
            incoming_beam = element.track(incoming_beam)

        combined_length = sum(
            (element.length for element in elements), start=jnp.zeros(())
        )
        combined_name = "combined_" + "_".join(element.name for element in elements)
        return cls(tm, length=combined_length, name=combined_name, sanitize_name=False)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        return self.predefined_transfer_map

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "predefined_transfer_map"]
