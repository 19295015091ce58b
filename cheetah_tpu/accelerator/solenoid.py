"""Solenoid magnet (ref ``cheetah/accelerator/solenoid.py:18-177``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.ops.transfer_maps import misalignment_matrix
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.names import merge_element_names
from cheetah_tpu.utils.physics import compute_relativistic_factors
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Solenoid(Element):
    """Solenoid magnet (A. W. Chao, p. 74): coupled rotation-focusing 4x4
    block plus R56.

    :param length: Length in m.
    :param k: Normalised strength ``B0 / (2 Brho)``.
    :param misalignment: Misalignment ``(dx, dy)`` in m.
    :param name: Unique identifier of the element.
    """

    length: Array
    k: Array
    misalignment: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        length: Array,
        k: Array | None = None,
        misalignment: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        self.k = as_float_array(k if k is not None else 0.0, dtype=dtype)
        self.misalignment = as_float_array(
            misalignment if misalignment is not None else (0.0, 0.0), dtype=dtype
        )
        self._init_element(name, sanitize_name, metadata)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        gamma, _, _ = compute_relativistic_factors(energy, species.mass_eV)

        length, k, gamma = jnp.broadcast_arrays(self.length, self.k, gamma)
        c = jnp.cos(length * k)
        s = jnp.sin(length * k)
        s_k = jnp.sinc(length * k / jnp.pi) * length
        r56 = length / (1 - jnp.square(gamma))

        R = jnp.broadcast_to(
            jnp.eye(7, dtype=length.dtype), (*length.shape, 7, 7)
        )
        R = R.at[..., 0, 0].set(c * c)
        R = R.at[..., 0, 1].set(c * s_k)
        R = R.at[..., 0, 2].set(s * c)
        R = R.at[..., 0, 3].set(s * s_k)
        R = R.at[..., 1, 0].set(-k * s * c)
        R = R.at[..., 1, 1].set(c * c)
        R = R.at[..., 1, 2].set(-k * s * s)
        R = R.at[..., 1, 3].set(s * c)
        R = R.at[..., 2, 0].set(-s * c)
        R = R.at[..., 2, 1].set(-s * s_k)
        R = R.at[..., 2, 2].set(c * c)
        R = R.at[..., 2, 3].set(c * s_k)
        R = R.at[..., 3, 0].set(k * s * s)
        R = R.at[..., 3, 1].set(-s * c)
        R = R.at[..., 3, 2].set(-k * s * c)
        R = R.at[..., 3, 3].set(c * c)
        R = R.at[..., 4, 5].set(r56)

        R_entry, R_exit = misalignment_matrix(self.misalignment)
        return R_exit @ R @ R_entry

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.k != 0))

    @property
    def is_skippable(self) -> bool:
        return True

    def split(self, resolution: Array) -> list[Element]:
        num_splits = int(jnp.ceil(jnp.max(jnp.abs(self.length)) / resolution))
        return [
            Solenoid(
                length=self.length / num_splits,
                k=self.k,
                misalignment=self.misalignment,
                name=f"{self.name}_split_{i}",
                sanitize_name=False,
                metadata=self.metadata,
            )
            for i in range(num_splits)
        ]

    def merge(self, other: "Solenoid") -> "Solenoid | None":
        if not (
            self.misalignment.shape == other.misalignment.shape
            and bool(jnp.all(self.misalignment == other.misalignment))
        ):
            return None
        return self.__class__(
            length=self.length + other.length,
            k=(self.k * self.length + other.k * other.length)
            / (self.length + other.length),
            misalignment=self.misalignment,
            name=merge_element_names(self.name, other.name),
            sanitize_name=False,
            metadata={**other.metadata, **self.metadata},
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "k", "misalignment"]
