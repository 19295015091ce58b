"""Rectangular bending magnet (ref ``cheetah/accelerator/rbend.py``).

Thin subclass of :class:`Dipole` with ``dipole_e1 = rbend_e1 + angle/2``.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.dipole import Dipole
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass


@pytree_dataclass(init=False)
class RBend(Dipole):
    """Rectangular bending magnet.

    :param length: Length in m.
    :param angle: Deflection angle in rad.
    :param rbend_e1: Inclination of the entrance face in rad (relative to the
        rectangular geometry).
    :param rbend_e2: Inclination of the exit face in rad.

    All other parameters as for :class:`Dipole`.
    """

    def __init__(
        self,
        length: Array,
        angle: Array | None = None,
        k1: Array | None = None,
        rbend_e1: Array | None = None,
        rbend_e2: Array | None = None,
        tilt: Array | None = None,
        gap: Array | None = None,
        gap_exit: Array | None = None,
        fringe_integral: Array | None = None,
        fringe_integral_exit: Array | None = None,
        fringe_at: str = "both",
        fringe_type: str = "linear_edge",
        tracking_method: str = "linear",
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        angle = as_float_array(angle if angle is not None else 0.0, dtype=dtype)
        rbend_e1 = as_float_array(rbend_e1 if rbend_e1 is not None else 0.0, dtype=dtype)
        rbend_e2 = as_float_array(rbend_e2 if rbend_e2 is not None else 0.0, dtype=dtype)

        super().__init__(
            length=length,
            angle=angle,
            k1=k1,
            dipole_e1=rbend_e1 + angle / 2,
            dipole_e2=rbend_e2 + angle / 2,
            tilt=tilt,
            gap=gap,
            gap_exit=gap_exit,
            fringe_integral=fringe_integral,
            fringe_integral_exit=fringe_integral_exit,
            fringe_at=fringe_at,
            fringe_type=fringe_type,
            tracking_method=tracking_method,
            name=name,
            sanitize_name=sanitize_name,
            metadata=metadata,
            dtype=dtype,
        )

    @property
    def rbend_e1(self) -> Array:
        return self.dipole_e1 - self.angle / 2

    @rbend_e1.setter
    def rbend_e1(self, value: Array) -> None:
        self.dipole_e1 = value + self.angle / 2

    @property
    def rbend_e2(self) -> Array:
        return self.dipole_e2 - self.angle / 2

    @rbend_e2.setter
    def rbend_e2(self, value: Array) -> None:
        self.dipole_e2 = value + self.angle / 2

    @property
    def defining_features(self) -> list[str]:
        dipole_features = super().defining_features
        dipole_features.remove("dipole_e1")
        dipole_features.remove("dipole_e2")
        return dipole_features + ["rbend_e1", "rbend_e2"]
