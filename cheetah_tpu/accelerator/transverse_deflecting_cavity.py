"""Transverse deflecting cavity (ref
``cheetah/accelerator/transverse_deflecting_cavity.py:15-237``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.constants import speed_of_light
from cheetah_tpu.particles import Beam, ParticleBeam
from cheetah_tpu.utils import bmadx
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class TransverseDeflectingCavity(Element):
    """Transverse deflecting cavity: half-drift, transverse RF kick with
    energy modulation ``E += V cos(phase) k x``, half-drift.

    :param length: Length in m.
    :param voltage: Voltage in V (sign convention for electron-like
        particles).
    :param phase: Phase in (radians / 2 pi).
    :param frequency: RF frequency in Hz.
    :param misalignment: Misalignment ``(dx, dy)`` in m.
    :param tilt: Tilt angle in the x-y plane in rad.
    :param num_steps: Number of drift-kick-drift steps (static).
    :param tracking_method: Only ``"drift_kick_drift"`` (static).
    :param name: Unique identifier of the element.
    """

    length: Array
    voltage: Array
    phase: Array
    frequency: Array
    misalignment: Array
    tilt: Array
    name: str = static_field(None)
    num_steps: int = static_field(1)
    tracking_method: str = static_field("drift_kick_drift")
    metadata: dict = static_field(None)
    _aligned_hint: bool = static_field(False, init=False)

    supported_tracking_methods = ["drift_kick_drift"]
    _offset_fields = ("misalignment", "tilt")

    def __init__(
        self,
        length: Array,
        voltage: Array | None = None,
        phase: Array | None = None,
        frequency: Array | None = None,
        misalignment: Array | None = None,
        tilt: Array | None = None,
        num_steps: int = 1,
        tracking_method: str = "drift_kick_drift",
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        self.voltage = as_float_array(voltage if voltage is not None else 0.0, dtype=dtype)
        self.phase = as_float_array(phase if phase is not None else 0.0, dtype=dtype)
        self.frequency = as_float_array(
            frequency if frequency is not None else 0.0, dtype=dtype
        )
        self.misalignment = as_float_array(
            misalignment if misalignment is not None else (0.0, 0.0), dtype=dtype
        )
        self.tilt = as_float_array(tilt if tilt is not None else 0.0, dtype=dtype)
        self.num_steps = num_steps
        self._init_element(name, sanitize_name, metadata, tracking_method)

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.voltage != 0))

    @property
    def is_skippable(self) -> bool:
        return False

    def track(self, incoming: Beam) -> Beam:
        return self._track_drift_kick_drift(incoming)

    def _track_drift_kick_drift(self, incoming: Beam) -> Beam:
        """Bmad-X crab-cavity map (ref
        ``transverse_deflecting_cavity.py:122-209``)."""
        assert isinstance(
            incoming, ParticleBeam
        ), "Drift-kick-drift tracking is currently only supported for `ParticleBeam`."

        mc2 = incoming.species.mass_eV
        x, px = incoming.x, incoming.px
        y, py = incoming.y, incoming.py

        z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(
            incoming.tau, incoming.p, incoming.energy, mc2
        )

        x_offset = self.misalignment[..., 0]
        y_offset = self.misalignment[..., 1]

        # Zero-offset fast path (see Element._offsets_statically_zero):
        # drops the identity entry/exit frame transforms and their fused
        # duplication. Identical results (x - 0 == x exactly).
        apply_offsets = not self._offsets_statically_zero()
        if apply_offsets:
            x, px, y, py = bmadx.offset_particle_set(
                x_offset, y_offset, self.tilt, x, px, y, py
            )
        x, y, z = bmadx.track_a_drift(
            self.length / 2, x, px, y, py, z, pz, p0c, mc2
        )

        voltage = self.voltage * -1 * incoming.species.num_elementary_charges / p0c
        k_rf = 2 * jnp.pi * self.frequency / speed_of_light
        # Phase that the particle sees.
        phase = (
            2
            * jnp.pi
            * (
                self.phase[..., None]
                - bmadx.particle_rf_time(z, pz, p0c, mc2) * self.frequency[..., None]
            )
        )

        px = px + voltage[..., None] * jnp.sin(phase)

        p0c_ = p0c[..., None]
        beta_old = (
            (1 + pz)
            * p0c_
            / jnp.sqrt(jnp.square((1 + pz) * p0c_) + jnp.square(mc2))
        )
        E_old = (1 + pz) * p0c_ / beta_old
        E_new = E_old + voltage[..., None] * jnp.cos(phase) * k_rf[..., None] * x * p0c_
        pc = jnp.sqrt(jnp.square(E_new) - jnp.square(mc2))
        beta = pc / E_new

        pz = (pc - p0c_) / p0c_
        z = z * beta / beta_old

        x, y, z = bmadx.track_a_drift(
            self.length / 2, x, px, y, py, z, pz, p0c, mc2
        )

        if apply_offsets:
            x, px, y, py = bmadx.offset_particle_unset(
                x_offset, y_offset, self.tilt, x, px, y, py
            )

        tau, delta, ref_energy = bmadx.bmad_to_cheetah_z_pz(z, pz, p0c, mc2)
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
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "length",
            "voltage",
            "phase",
            "frequency",
            "misalignment",
            "tilt",
            "num_steps",
        ]
