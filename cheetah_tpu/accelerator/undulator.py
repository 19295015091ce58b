"""Undulator (ref ``cheetah/accelerator/undulator.py``): paraxial model with
longitudinal chirp and per-plane transverse focusing channels."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.physics import compute_relativistic_factors
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Undulator(Element):
    """Undulator element.

    The vertical field component (``kx``) focuses in y and the horizontal
    component (``ky``) focuses in x (ref ``undulator.py:78-125``).

    :param length: Length in m.
    :param period: Undulator period in m.
    :param kx: Horizontal undulator strength parameter.
    :param ky: Vertical undulator strength parameter.
    :param name: Unique identifier of the element.
    """

    length: Array
    period: Array
    kx: Array
    ky: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        length: Array,
        period: Array | None = None,
        kx: Array | None = None,
        ky: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        self.period = as_float_array(period if period is not None else 1.0, dtype=dtype)
        self.kx = as_float_array(kx if kx is not None else 0.0, dtype=dtype)
        self.ky = as_float_array(ky if ky is not None else 0.0, dtype=dtype)
        self._init_element(name, sanitize_name, metadata)

    @property
    def is_active(self) -> bool:
        return bool(jnp.any((self.kx != 0.0) | (self.ky != 0.0)))

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        gamma, igamma2, beta = compute_relativistic_factors(energy, species.mass_eV)
        length, igamma2, beta, gamma, kx, ky, period = jnp.broadcast_arrays(
            self.length, igamma2, beta, gamma, self.kx, self.ky, self.period
        )

        R = jnp.broadcast_to(jnp.eye(7, dtype=length.dtype), (*length.shape, 7, 7))
        R = R.at[..., 4, 5].set(
            -length
            * igamma2
            * (1.0 / jnp.square(beta) + 0.5 * (jnp.square(kx) + jnp.square(ky)))
        )

        period_safe = jnp.where(period > 0.0, period, jnp.ones_like(period))
        spatial_frequency = jnp.where(
            period > 0.0,
            jnp.sqrt(2.0) * jnp.pi / (period_safe * gamma * beta),
            jnp.zeros_like(period),
        )

        # Transverse focusing from the vertical field (kx > 0) acts in y.
        omega_x = spatial_frequency * kx
        R = R.at[..., 2, 2].set(jnp.cos(omega_x * length))
        R = R.at[..., 2, 3].set(jnp.sinc(omega_x * length / jnp.pi) * length)
        R = R.at[..., 3, 2].set(-jnp.sin(omega_x * length) * omega_x)
        R = R.at[..., 3, 3].set(jnp.cos(omega_x * length))

        # Transverse focusing from the horizontal field (ky > 0) acts in x.
        omega_y = spatial_frequency * ky
        R = R.at[..., 0, 0].set(jnp.cos(omega_y * length))
        R = R.at[..., 0, 1].set(jnp.sinc(omega_y * length / jnp.pi) * length)
        R = R.at[..., 1, 0].set(-jnp.sin(omega_y * length) * omega_y)
        R = R.at[..., 1, 1].set(jnp.cos(omega_y * length))

        return R

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "period", "kx", "ky"]
