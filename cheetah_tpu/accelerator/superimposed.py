"""Superimposed elements (ref ``cheetah/accelerator/superimposed.py:13-98``).

A zero-length element placed at the centre of a base element; internally the
base is split into two halves with the superimposed element in between.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.particles import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import pytree_dataclass, replace, static_field


@pytree_dataclass(init=False)
class Superimposed(Element):
    """One element superimposed at the centre of another.

    NOTE: Changing either ``base_element`` or ``superimposed_element`` after
    initialisation leads to unexpected behaviour; create a new instance
    instead.

    :param base_element: The element at whose centre the superimposed element
        is placed. Must have a ``length`` leaf field.
    :param superimposed_element: Zero-length element placed at the centre.
    :param name: Unique identifier of the element.
    """

    base_element: Element
    superimposed_element: Element
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        base_element: Element,
        superimposed_element: Element,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        # ``dtype`` is accepted for signature parity with the reference
        # (``superimposed.py:39-52``), which also leaves the sub-elements'
        # own dtypes untouched — it only forwards the value to the Element
        # base, where nothing reads it for this class.
        del dtype
        assert bool(
            jnp.all(superimposed_element.length == 0.0)
        ), "The superimposed element must have zero length."
        assert "length" in getattr(base_element, "__pytree_leaf_fields__", ()), (
            "The base element must have a `length` field to be split in half."
        )
        self.base_element = base_element
        self.superimposed_element = superimposed_element
        self._init_element(name, sanitize_name, metadata)

    def _segment(self) -> "Segment":  # noqa: F821
        """Internal half-base / superimposed / half-base segment, built on
        demand (trace-safe: halving is a functional field update, not a
        resolution-based split)."""
        from cheetah_tpu.accelerator.segment import Segment

        half_front = replace(
            self.base_element, length=self.base_element.length / 2.0
        )
        half_front.name = f"{self.base_element.name}_half_front"
        half_back = replace(
            self.base_element, length=self.base_element.length / 2.0
        )
        half_back.name = f"{self.base_element.name}_half_back"
        return Segment(
            elements=[half_front, self.superimposed_element, half_back],
            name=f"{self.name}_segment",
            sanitize_name=False,
        )

    def flattened(self) -> "Segment":  # noqa: F821
        return self._segment().flattened()

    @property
    def is_skippable(self) -> bool:
        return self._segment().is_skippable

    @property
    def length(self) -> Array:
        return self.base_element.length

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        return self._segment().first_order_transfer_map(energy, species)

    def track(self, incoming: Beam) -> Beam:
        return self._segment().track(incoming)

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["base_element", "superimposed_element"]
