"""Accelerating cavity (ref ``cheetah/accelerator/cavity.py:21-385``)."""

from __future__ import annotations

import math
import warnings

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.constants import speed_of_light
from cheetah_tpu.particles import Beam, ParameterBeam, ParticleBeam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.maths import log1pdiv
from cheetah_tpu.utils.physics import compute_relativistic_factors
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field
from cheetah_tpu.utils.warnings import PhysicsWarning


def _safe(x: Array, bad: Array) -> Array:
    return jnp.where(bad, jnp.ones_like(x), x)


@pytree_dataclass(init=False)
class Cavity(Element):
    """Accelerating cavity.

    ``track`` applies the cavity R-matrix, then recomputes the relative energy
    deviation with the RF cosine curvature and adds the longitudinal
    second-order terms T566/T556/T555 when accelerating; the beam's reference
    ``energy`` is genuinely updated (ref ``cavity.py:100-251``).

    Jit-design notes (deviations from the reference's Python branches):

    - The reference gates T566/T556/T555 on ``(delta_energy > 0).any()``
      (``cavity.py:157``); here the branch is selected *per vector instance*
      with ``jnp.where`` and guarded denominators, which matches the
      reference for uniform batches and is well-defined for mixed ones.
    - ``is_skippable`` matches the reference's runtime behaviour
      (``cavity.py:86-92``) by default: a cavity whose voltage is a
      *concrete* zero at partition time reports itself skippable, so idle RF
      fuses into the surrounding linear run exactly as the reference merges
      it. Under tracing (voltage is a jit argument) the conservative answer
      is ``False``, keeping jit valid; flipping the voltage of a fused
      lattice re-partitions (and hence retraces) on the next ``track``.
      Opt out with ``skippable_when_off=False`` to always run the bespoke
      ``track``: the reference's own fused track deviates ~4e-8 from its
      element-wise track for idle cavities (see ``tests/test_full_ares.py``)
      because the bespoke ``track`` recomputes the energy spread even at
      zero voltage; the flag trades fusion speed for that element-wise
      semantics.

    Known model limitation (shared with the reference, verified numerically):
    at zero-crossing phase (``phase = +-90 deg``) the standing-wave ``r55``
    term ``tan(phi) (...) / dE`` blows up (``~1e18``) because ``cos(phi)`` is
    only floating-point zero, producing meaningless tracking output (the
    reference goes non-finite there; this implementation's guarded
    denominators keep the values finite but equally meaningless, and within
    ~1e-3 deg of the crossing the near-singular ``1/dgamma^3`` longitudinal
    terms amplify floating-point noise so the two implementations diverge). A
    :class:`PhysicsWarning` is emitted when an active standing-wave cavity is
    configured within 1e-3 deg of a zero crossing (when the values are
    concrete — traced values cannot be inspected). Operate cavities away from
    exact zero-crossing, or with ``voltage = 0``.

    :param length: Length in m.
    :param voltage: Cavity voltage in V (positive accelerates electron-like
        particles; energy gain on crest for charge ``n e`` is ``n * voltage``).
    :param phase: Cavity phase in degrees.
    :param frequency: RF frequency in Hz.
    :param cavity_type: ``"standing_wave"`` or ``"traveling_wave"`` (static).
    :param name: Unique identifier of the element.
    """

    length: Array
    voltage: Array
    phase: Array
    frequency: Array
    name: str = static_field(None)
    cavity_type: str = static_field("standing_wave")
    skippable_when_off: bool = static_field(True)
    metadata: dict = static_field(None)

    def __init__(
        self,
        length: Array,
        voltage: Array | None = None,
        phase: Array | None = None,
        frequency: Array | None = None,
        cavity_type: str = "standing_wave",
        skippable_when_off: bool = True,
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
        assert cavity_type in ("standing_wave", "traveling_wave"), (
            f"Invalid cavity type: {cavity_type}"
        )
        self.cavity_type = cavity_type
        self.skippable_when_off = skippable_when_off
        self._init_element(name, sanitize_name, metadata)
        self._warn_if_zero_crossing()

    def _warn_if_zero_crossing(self) -> None:
        """Warn when an active standing-wave cavity sits at a zero-crossing
        phase, where the r55 model is known-wrong (class docstring). Only
        possible for concrete values; traced values are left alone."""
        # getattr: during __init__, voltage/phase assignments run before
        # cavity_type exists; the explicit end-of-init check covers that.
        if getattr(self, "cavity_type", None) != "standing_wave":
            return
        voltage, phase = self.voltage, self.phase
        if isinstance(voltage, jax.core.Tracer) or isinstance(phase, jax.core.Tracer):
            return
        # numpy, not jnp: this runs on every concrete voltage/phase
        # assignment, and a jnp formulation would force a host-device sync
        # per setattr in eager tuning loops.
        voltage_np, phase_np = np.asarray(voltage), np.asarray(phase)
        at_crossing = (np.abs(np.mod(phase_np, 180.0) - 90.0) < 1e-3) & (
            voltage_np != 0
        )
        if bool(np.any(at_crossing)):
            warnings.warn(
                f"Cavity {getattr(self, 'name', '?')} is at a zero-crossing "
                "phase (+-90 deg) with non-zero voltage: the standing-wave "
                "r55 model is numerically invalid there (non-finite tracking "
                "output). Offset the phase or set voltage to zero.",
                category=PhysicsWarning,
                stacklevel=3,
            )

    def __setattr__(self, key: str, value) -> None:
        super().__setattr__(key, value)
        # Re-check the zero-crossing guard on live reconfiguration, once the
        # instance is fully constructed (both attributes exist).
        if key in ("voltage", "phase") and hasattr(self, "voltage") and hasattr(self, "phase"):
            self._warn_if_zero_crossing()

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.voltage != 0))

    @property
    def is_skippable(self) -> bool:
        # Static False by default for jit-safety (see class docstring);
        # `skippable_when_off` opts into the reference's runtime behaviour
        # (ref cavity.py:86-92) when the voltage is concrete at partition
        # time. Under tracing the conservative answer keeps jit valid.
        if not self.skippable_when_off:
            return False
        if isinstance(self.voltage, jax.core.Tracer):
            return False
        return bool(jnp.all(self.voltage == 0))

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        return self._cavity_rmatrix(energy, species)

    def track(self, incoming: Beam) -> Beam:
        gamma0, igamma2, beta0 = compute_relativistic_factors(
            incoming.energy, incoming.species.mass_eV
        )
        phi = jnp.deg2rad(self.phase)

        tm = self.first_order_transfer_map(incoming.energy, incoming.species)
        is_parameter = isinstance(incoming, ParameterBeam)
        if is_parameter:
            outgoing_mu = jnp.squeeze(tm @ incoming.mu[..., None], -1)
            outgoing_cov = tm @ incoming.cov @ jnp.swapaxes(tm, -1, -2)
        else:
            outgoing_particles = incoming.particles @ jnp.swapaxes(tm, -1, -2)

        delta_energy = (
            self.voltage * jnp.cos(phi) * incoming.species.num_elementary_charges * -1
        )

        k = 2.0 * jnp.pi * self.frequency / speed_of_light
        outgoing_energy = incoming.energy + delta_energy
        gamma1, _, beta1 = compute_relativistic_factors(
            outgoing_energy, incoming.species.mass_eV
        )

        # Recompute the relative energy deviation from the RF cosine curvature.
        if is_parameter:
            outgoing_mu = outgoing_mu.at[..., 5].set(
                incoming.mu[..., 5]
                * incoming.energy
                * beta0
                / (outgoing_energy * beta1)
                + self.voltage
                * beta0
                / (outgoing_energy * beta1)
                * (jnp.cos(-incoming.mu[..., 4] * beta0 * k + phi) - jnp.cos(phi))
            )
            outgoing_cov = outgoing_cov.at[..., 5, 5].set(incoming.cov[..., 5, 5])
        else:
            outgoing_particles = outgoing_particles.at[..., 5].set(
                incoming.particles[..., 5]
                * incoming.energy[..., None]
                * beta0[..., None]
                / (outgoing_energy[..., None] * beta1[..., None])
                + self.voltage[..., None]
                * beta0[..., None]
                / (outgoing_energy[..., None] * beta1[..., None])
                * (
                    jnp.cos(
                        -incoming.particles[..., 4] * beta0[..., None] * k[..., None]
                        + phi[..., None]
                    )
                    - jnp.cos(phi)[..., None]
                )
            )

        dgamma = self.voltage / incoming.species.mass_eV

        # Longitudinal second-order terms; accelerating branch selected
        # per-instance with guarded denominators (see class docstring).
        accelerating = delta_energy > 0
        T566_default = 1.5 * self.length * igamma2 / beta0**3
        gdiff = jnp.where(accelerating, gamma0 - gamma1, jnp.ones_like(gamma0))
        T566_accel = (
            self.length
            * (beta0**3 * gamma0**3 - beta1**3 * gamma1**3)
            / (2.0 * beta0 * beta1**3 * gamma0 * gdiff * gamma1**3)
        )
        T556_accel = (
            beta0
            * k
            * self.length
            * dgamma
            * gamma0
            * (beta1**3 * gamma1**3 + beta0 * (gamma0 - gamma1**3))
            * jnp.sin(phi)
            / (beta1**3 * gamma1**3 * jnp.square(gdiff))
        )
        T555_accel = (
            jnp.square(beta0)
            * jnp.square(k)
            * self.length
            * dgamma
            / 2.0
            * (
                dgamma
                * (
                    2.0 * gamma0 * gamma1**3 * (beta0 * beta1**3 - 1.0)
                    + jnp.square(gamma0)
                    + 3.0 * jnp.square(gamma1)
                    - 2.0
                )
                / (beta1**3 * gamma1**3 * gdiff**3)
                * jnp.square(jnp.sin(phi))
                - (gamma1 * gamma0 * (beta1 * beta0 - 1.0) + 1.0)
                / (beta1 * gamma1 * jnp.square(gdiff))
                * jnp.cos(phi)
            )
        )
        T566 = jnp.where(accelerating, T566_accel, T566_default)
        T556 = jnp.where(accelerating, T556_accel, jnp.zeros_like(T556_accel))
        T555 = jnp.where(accelerating, T555_accel, jnp.zeros_like(T555_accel))

        if is_parameter:
            outgoing_mu = outgoing_mu.at[..., 4].add(
                T566 * jnp.square(incoming.mu[..., 5])
                + T556 * incoming.mu[..., 4] * incoming.mu[..., 5]
                + T555 * jnp.square(incoming.mu[..., 4])
            )
            longitudinal = (
                T566 * jnp.square(incoming.cov[..., 5, 5])
                + T556 * incoming.cov[..., 4, 5] * incoming.cov[..., 5, 5]
                + T555 * jnp.square(incoming.cov[..., 4, 4])
            )
            outgoing_cov = outgoing_cov.at[..., 4, 4].set(longitudinal)
            outgoing_cov = outgoing_cov.at[..., 4, 5].set(longitudinal)
            outgoing_cov = outgoing_cov.at[..., 5, 4].set(longitudinal)
            return ParameterBeam(
                mu=outgoing_mu,
                cov=outgoing_cov,
                energy=outgoing_energy,
                total_charge=incoming.total_charge,
                s=incoming.s + self.length,
                species=incoming.species,
            )
        else:
            outgoing_particles = outgoing_particles.at[..., 4].add(
                T566[..., None] * jnp.square(incoming.particles[..., 5])
                + T556[..., None]
                * incoming.particles[..., 4]
                * incoming.particles[..., 5]
                + T555[..., None] * jnp.square(incoming.particles[..., 4])
            )
            return ParticleBeam(
                particles=outgoing_particles,
                energy=outgoing_energy,
                particle_charges=incoming.particle_charges,
                survival_probabilities=incoming.survival_probabilities,
                s=incoming.s + self.length,
                species=incoming.species,
            )

    def _cavity_rmatrix(self, energy: Array, species: Species) -> Array:
        """R-matrix of the cavity (ref ``cavity.py:253-358``): standing-wave
        per the Rosenzweig-Serafini-style alpha model, travelling-wave with
        entry/exit focusing matrices."""
        energy = jnp.asarray(energy)
        phi = jnp.deg2rad(self.phase)
        effective_voltage = -self.voltage * species.num_elementary_charges
        delta_energy = effective_voltage * jnp.cos(phi)

        Ei = energy / species.mass_eV
        dE = delta_energy / species.mass_eV
        Ef = Ei + dE
        Ep = dE / self.length  # Derivative of the energy

        k = 2 * jnp.pi * self.frequency / speed_of_light

        if self.cavity_type == "standing_wave":
            alpha = (
                math.sqrt(0.125)
                * effective_voltage
                / energy
                * log1pdiv(delta_energy / energy)
            )
            beta0 = jnp.sqrt(1 - 1 / jnp.square(Ei))
            beta1 = jnp.sqrt(1 - 1 / jnp.square(Ef))

            r11 = jnp.cos(alpha) - math.sqrt(2.0) * jnp.cos(phi) * jnp.sin(alpha)
            r12 = (
                jnp.sinc(alpha / jnp.pi) * log1pdiv(delta_energy / energy) * self.length
            )
            r21 = -(
                effective_voltage
                / ((energy + delta_energy) * math.sqrt(2.0) * self.length)
                * (0.5 + jnp.square(jnp.cos(phi)))
                * jnp.sin(alpha)
            )
            r22 = Ei / Ef * (
                jnp.cos(alpha) + math.sqrt(2.0) * jnp.cos(phi) * jnp.sin(alpha)
            )

            dE_safe = _safe(dE, dE == 0)
            r55 = 1.0 + jnp.where(
                dE != 0.0,
                k
                * self.length
                * beta0
                * jnp.tan(phi)
                * (Ei * Ef * (beta0 * beta1 - 1) + 1)
                / (beta1 * Ef * dE_safe),
                jnp.zeros_like(dE),
            )
            r56 = (
                -self.length
                / (jnp.square(Ef) * Ei * beta1)
                * (Ef + Ei)
                / (beta1 + beta0)
            )
            r65 = (
                k * jnp.sin(phi) * effective_voltage
                / (beta1 * (energy + delta_energy))
            )
            r66 = Ei / Ef * beta0 / beta1

        else:  # traveling_wave
            # Rosenzweig and Serafini, PhysRevE Vol. 49, p. 1599 (1994).
            body_01 = self.length * log1pdiv(dE / Ei)
            body_11 = Ei / Ef
            f_entry_10 = -Ep / (2 * Ei)
            f_exit_10 = Ep / (2 * Ef)

            # M = M_f_exit @ M_body @ M_f_entry, expanded for 2x2 matrices.
            r11 = 1.0 + body_01 * f_entry_10
            r12 = body_01
            r21 = f_exit_10 * r11 + body_11 * f_entry_10
            r22 = f_exit_10 * body_01 + body_11
            r55 = jnp.ones_like(self.length)
            r56 = jnp.zeros_like(self.length)
            r65 = (
                k * jnp.sin(phi) * effective_voltage / (energy + delta_energy)
            )
            r66 = r22

        r11, r12, r21, r22, r55, r56, r65, r66 = jnp.broadcast_arrays(
            r11, r12, r21, r22, r55, r56, r65, r66
        )

        R = jnp.broadcast_to(jnp.eye(7, dtype=r11.dtype), (*r11.shape, 7, 7))
        R = R.at[..., 0, 0].set(r11)
        R = R.at[..., 0, 1].set(r12)
        R = R.at[..., 1, 0].set(r21)
        R = R.at[..., 1, 1].set(r22)
        R = R.at[..., 2, 2].set(r11)
        R = R.at[..., 2, 3].set(r12)
        R = R.at[..., 3, 2].set(r21)
        R = R.at[..., 3, 3].set(r22)
        R = R.at[..., 4, 4].set(r55)
        R = R.at[..., 4, 5].set(r56)
        R = R.at[..., 5, 4].set(r65)
        R = R.at[..., 5, 5].set(r66)
        return R

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "length",
            "voltage",
            "phase",
            "frequency",
            "cavity_type",
            # Only when opted out: default cavities keep a schema the
            # reference loader accepts (LatticeJSON interop); the flag is an
            # extension.
            *([] if self.skippable_when_off else ["skippable_when_off"]),
        ]
