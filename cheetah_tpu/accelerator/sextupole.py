"""Sextupole magnet (ref ``cheetah/accelerator/sextupole.py:21-186``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.ops.transfer_maps import (
    base_ttensor,
    combined_rotation_misalignment_matrix,
    drift_matrix,
)
from cheetah_tpu.particles import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.names import merge_element_names
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Sextupole(Element):
    """Sextupole magnet.

    To first order a sextupole is a pure drift; its field only enters the
    second-order map, so the default tracking method is ``"second_order"``
    (ref ``sextupole.py:45-53``).

    :param length: Length in m.
    :param k2: Sextupole strength in 1/m^3.
    :param misalignment: Transverse misalignment ``(dx, dy)`` in m.
    :param tilt: Tilt angle in the x-y plane in rad.
    :param tracking_method: ``"linear"`` or ``"second_order"`` (static).
    :param name: Unique identifier of the element.
    """

    length: Array
    k2: Array
    misalignment: Array
    tilt: Array
    name: str = static_field(None)
    tracking_method: str = static_field("second_order")
    metadata: dict = static_field(None)

    supported_tracking_methods = ["linear", "second_order"]

    def __init__(
        self,
        length: Array,
        k2: Array | None = None,
        misalignment: Array | None = None,
        tilt: Array | None = None,
        tracking_method: str = "second_order",
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        self.k2 = as_float_array(k2 if k2 is not None else 0.0, dtype=dtype)
        self.misalignment = as_float_array(
            misalignment if misalignment is not None else (0.0, 0.0), dtype=dtype
        )
        self.tilt = as_float_array(tilt if tilt is not None else 0.0, dtype=dtype)
        self._init_element(name, sanitize_name, metadata, tracking_method)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        return drift_matrix(length=self.length, species=species, energy=energy)

    def second_order_transfer_map(self, energy: Array, species: Species) -> Array:
        zero = jnp.zeros_like(self.length)
        T = base_ttensor(
            length=self.length,
            k1=zero,
            k2=self.k2,
            hx=zero,
            species=species,
            energy=energy,
        )
        R = drift_matrix(length=self.length, species=species, energy=energy)
        T = T.at[..., :, 6, :].set(jnp.broadcast_to(R, T.shape[:-3] + (7, 7)))

        R_entry, R_exit = combined_rotation_misalignment_matrix(
            angle=self.tilt, misalignment=self.misalignment
        )
        return jnp.einsum(
            "...ij,...jkl,...kn,...lm->...inm", R_exit, T, R_entry, R_entry
        )

    def track(self, incoming: Beam) -> Beam:
        return (
            self._track_second_order(incoming)
            if self.tracking_method == "second_order"
            else self._track_first_order(incoming)
        )

    @property
    def is_skippable(self) -> bool:
        return self.tracking_method == "linear"

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.k2 != 0.0))

    def merge(self, other: "Sextupole") -> "Sextupole | None":
        if not (
            self.tracking_method == other.tracking_method
            and self.k2.shape == other.k2.shape
            and bool(jnp.all(self.k2 == other.k2))
            and bool(jnp.all(self.misalignment == other.misalignment))
            and bool(jnp.all(self.tilt == other.tilt))
        ):
            return None
        return self.__class__(
            length=self.length + other.length,
            k2=self.k2,
            misalignment=self.misalignment,
            tilt=self.tilt,
            tracking_method=self.tracking_method,
            name=merge_element_names(self.name, other.name),
            sanitize_name=False,
            metadata={**other.metadata, **self.metadata},
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "k2", "misalignment", "tilt"]
