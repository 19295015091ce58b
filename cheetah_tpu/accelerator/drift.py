"""Drift section (ref ``cheetah/accelerator/drift.py:19-218``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.ops.transfer_maps import base_ttensor, drift_matrix
from cheetah_tpu.particles import Beam, ParticleBeam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils import bmadx
from cheetah_tpu.utils.names import merge_element_names
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Drift(Element):
    """Drift section in a particle accelerator.

    :param length: Length in m.
    :param tracking_method: One of ``"linear"``, ``"second_order"``,
        ``"drift_kick_drift"`` (static configuration).
    :param name: Unique identifier of the element.
    """

    length: Array
    name: str = static_field(None)
    tracking_method: str = static_field("linear")
    metadata: dict = static_field(None)

    supported_tracking_methods = ["linear", "second_order", "drift_kick_drift"]

    def __init__(
        self,
        length: Array,
        tracking_method: str = "linear",
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        self._init_element(name, sanitize_name, metadata, tracking_method)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        return drift_matrix(length=self.length, energy=energy, species=species)

    def second_order_transfer_map(self, energy: Array, species: Species) -> Array:
        zero = jnp.zeros_like(self.length)
        T = base_ttensor(
            self.length, k1=zero, k2=zero, hx=zero, energy=energy, species=species
        )
        R = drift_matrix(length=self.length, energy=energy, species=species)
        # Fill the first-order transfer map into the second-order transfer map.
        T = T.at[..., :, 6, :].set(jnp.broadcast_to(R, T.shape[:-3] + (7, 7)))
        return T

    def _track_drift_kick_drift(self, incoming: Beam) -> Beam:
        """Exact nonlinear drift via the Bmad-X map (ref ``drift.py:106-154``)."""
        assert isinstance(
            incoming, ParticleBeam
        ), "Drift-kick-drift tracking is currently only supported for `ParticleBeam`."

        x, px = incoming.x, incoming.px
        y, py = incoming.y, incoming.py

        z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(
            incoming.tau, incoming.p, incoming.energy, incoming.species.mass_eV
        )
        x, y, z = bmadx.track_a_drift(
            self.length, x, px, y, py, z, pz, p0c, incoming.species.mass_eV
        )
        tau, delta, ref_energy = bmadx.bmad_to_cheetah_z_pz(
            z, pz, p0c, incoming.species.mass_eV
        )

        x, px, y, py, tau, delta = jnp.broadcast_arrays(x, px, y, py, tau, delta)
        return ParticleBeam(
            particles=jnp.stack([x, px, y, py, tau, delta, jnp.ones_like(x)], axis=-1),
            energy=ref_energy,
            particle_charges=incoming.particle_charges,
            survival_probabilities=incoming.survival_probabilities,
            s=incoming.s + self.length,
            species=incoming.species,
        )

    @property
    def is_skippable(self) -> bool:
        return self.tracking_method == "linear"

    def split(self, resolution: Array) -> list[Element]:
        num_splits = int(jnp.ceil(jnp.max(jnp.abs(self.length)) / resolution))
        return [
            Drift(
                self.length / num_splits,
                tracking_method=self.tracking_method,
                name=f"{self.name}_split_{i}",
                sanitize_name=False,
                metadata=self.metadata,
            )
            for i in range(num_splits)
        ]

    def merge(self, other: "Drift") -> "Drift | None":
        if self.tracking_method != other.tracking_method:
            return None
        return self.__class__(
            length=self.length + other.length,
            tracking_method=self.tracking_method,
            name=merge_element_names(self.name, other.name),
            sanitize_name=False,
            metadata={**other.metadata, **self.metadata},
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length"]
