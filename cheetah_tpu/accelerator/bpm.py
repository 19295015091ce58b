"""Beam position monitor (ref ``cheetah/accelerator/bpm.py``)."""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element, ZeroLengthMixin
from cheetah_tpu.particles import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class BPM(ZeroLengthMixin, Element):
    """Beam position monitor reading out the transverse beam centroid.

    The functional readout is :meth:`observe`; use
    ``Segment.track_with_readings`` to collect readings under ``jax.jit``.
    For reference-style ergonomics, eager (non-traced) tracking also stores
    the latest reading on the Python object as ``bpm.reading``
    (ref ``bpm.py:77-87``).

    :param is_active: Whether the BPM records readings (static).
    :param misalignment: Misalignment ``(x, y)`` of the BPM in m.
    :param name: Unique identifier of the element.
    """

    misalignment: Array
    name: str = static_field(None)
    is_active: bool = static_field(False)
    metadata: dict = static_field(None)

    def __init__(
        self,
        is_active: bool = False,
        name: str | None = None,
        misalignment: Array | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.is_active = is_active
        self.misalignment = as_float_array(
            misalignment if misalignment is not None else (0.0, 0.0), dtype=dtype
        )
        self._init_element(name, sanitize_name, metadata)

    @property
    def is_skippable(self) -> bool:
        return not self.is_active

    @property
    def reading(self) -> Array:
        """Latest eager reading, or NaNs if nothing has been recorded."""
        cached = getattr(self, "_cached_reading", None)
        if cached is None:
            return jnp.full((2,), jnp.nan, dtype=self.misalignment.dtype)
        return cached

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        energy = jnp.asarray(energy)
        return jnp.broadcast_to(jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7))

    def observe(self, incoming: Beam) -> Array:
        """Functional readout: misalignment-corrected beam centroid of shape
        ``(..., 2)``."""
        return jnp.stack(
            jnp.broadcast_arrays(
                incoming.mu_x - self.misalignment[..., 0],
                incoming.mu_y - self.misalignment[..., 1],
            ),
            axis=-1,
        )

    def track(self, incoming: Beam) -> Beam:
        if self.is_active:
            reading = self.observe(incoming)
            # Eager convenience cache; never store tracers on the live object.
            if not isinstance(reading, jax.core.Tracer):
                self._cached_reading = reading
        return incoming

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["is_active"]
