"""Corrector magnets (ref ``cheetah/accelerator/horizontal_corrector.py``,
``vertical_corrector.py``, ``combined_corrector.py``).

A corrector is a drift with a thin kick applied through the affine (7th)
column of the transfer map.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.ops.transfer_maps import drift_matrix
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class HorizontalCorrector(Element):
    """Horizontal corrector magnet: drift plus thin horizontal kick
    (ref ``horizontal_corrector.py:60-78``).

    :param length: Length in m.
    :param angle: Kick angle in rad.
    """

    length: Array
    angle: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        length: Array,
        angle: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        self.angle = as_float_array(
            angle if angle is not None else 0.0, dtype=self.length.dtype
        )
        self._init_element(name, sanitize_name, metadata)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        tm = drift_matrix(self.length, energy, species)
        tm, angle = jnp.broadcast_arrays(tm, self.angle[..., None, None])
        return tm.at[..., 1, 6].set(angle[..., 0, 0])

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.angle != 0))

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "angle"]


@pytree_dataclass(init=False)
class VerticalCorrector(Element):
    """Vertical corrector magnet: drift plus thin vertical kick
    (ref ``vertical_corrector.py:60-78``).

    :param length: Length in m.
    :param angle: Kick angle in rad.
    """

    length: Array
    angle: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        length: Array,
        angle: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        self.angle = as_float_array(
            angle if angle is not None else 0.0, dtype=self.length.dtype
        )
        self._init_element(name, sanitize_name, metadata)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        tm = drift_matrix(self.length, energy, species)
        tm, angle = jnp.broadcast_arrays(tm, self.angle[..., None, None])
        return tm.at[..., 3, 6].set(angle[..., 0, 0])

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.angle != 0))

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "angle"]


@pytree_dataclass(init=False)
class CombinedCorrector(Element):
    """Corrector kicking in both planes (ref ``combined_corrector.py:76-98``).

    :param length: Length in m.
    :param horizontal_angle: Horizontal kick angle in rad.
    :param vertical_angle: Vertical kick angle in rad.
    """

    length: Array
    horizontal_angle: Array
    vertical_angle: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        length: Array,
        horizontal_angle: Array | None = None,
        vertical_angle: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        self.horizontal_angle = as_float_array(
            horizontal_angle if horizontal_angle is not None else 0.0, dtype=dtype
        )
        self.vertical_angle = as_float_array(
            vertical_angle if vertical_angle is not None else 0.0, dtype=dtype
        )
        self._init_element(name, sanitize_name, metadata)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        tm = drift_matrix(self.length, energy, species)
        h = self.horizontal_angle[..., None, None]
        v = self.vertical_angle[..., None, None]
        tm, h, v = jnp.broadcast_arrays(tm, h, v)
        tm = tm.at[..., 1, 6].set(h[..., 0, 0])
        tm = tm.at[..., 3, 6].set(v[..., 0, 0])
        return tm

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def is_active(self) -> bool:
        return bool(
            jnp.any(self.horizontal_angle != 0) or jnp.any(self.vertical_angle != 0)
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "length",
            "horizontal_angle",
            "vertical_angle",
        ]
