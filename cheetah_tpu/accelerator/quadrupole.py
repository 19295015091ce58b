"""Quadrupole magnet (ref ``cheetah/accelerator/quadrupole.py:25-371``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.ops.transfer_maps import (
    base_rmatrix,
    base_ttensor,
    combined_rotation_misalignment_matrix,
)
from cheetah_tpu.particles import Beam, ParticleBeam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils import bmadx
from cheetah_tpu.utils.names import merge_element_names
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Quadrupole(Element):
    """Quadrupole magnet in a particle accelerator.

    :param length: Length in m.
    :param k1: Strength of the quadrupole in 1/m^2.
    :param misalignment: Misalignment vector ``(dx, dy)`` in m.
    :param tilt: Tilt angle in the x-y plane in rad (``pi/4`` for a
        skew quadrupole).
    :param num_steps: Number of drift-kick-drift steps (static).
    :param tracking_method: ``"linear"``, ``"second_order"`` or
        ``"drift_kick_drift"`` (static).
    :param name: Unique identifier of the element.
    """

    length: Array
    k1: Array
    misalignment: Array
    tilt: Array
    name: str = static_field(None)
    num_steps: int = static_field(1)
    tracking_method: str = static_field("linear")
    metadata: dict = static_field(None)
    _aligned_hint: bool = static_field(False, init=False)

    supported_tracking_methods = ["linear", "second_order", "drift_kick_drift"]
    _offset_fields = ("misalignment", "tilt")

    def __init__(
        self,
        length: Array,
        k1: Array | None = None,
        misalignment: Array | None = None,
        tilt: Array | None = None,
        num_steps: int = 1,
        tracking_method: str = "linear",
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        self.k1 = as_float_array(k1 if k1 is not None else 0.0, dtype=dtype)
        self.misalignment = as_float_array(
            misalignment if misalignment is not None else (0.0, 0.0), dtype=dtype
        )
        self.tilt = as_float_array(tilt if tilt is not None else 0.0, dtype=dtype)
        self.num_steps = num_steps
        self._init_element(name, sanitize_name, metadata, tracking_method)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        R = base_rmatrix(
            length=self.length,
            k1=self.k1,
            hx=jnp.zeros_like(self.length),
            species=species,
            energy=energy,
        )
        R_entry, R_exit = combined_rotation_misalignment_matrix(
            angle=self.tilt, misalignment=self.misalignment
        )
        return R_exit @ R @ R_entry

    def second_order_transfer_map(self, energy: Array, species: Species) -> Array:
        zero = jnp.zeros_like(self.length)
        T = base_ttensor(
            length=self.length,
            k1=self.k1,
            k2=zero,
            hx=zero,
            energy=energy,
            species=species,
        )
        R = base_rmatrix(
            length=self.length, k1=self.k1, hx=zero, species=species, energy=energy
        )
        # Fill the first-order transfer map into the second-order transfer map.
        T = T.at[..., :, 6, :].set(jnp.broadcast_to(R, T.shape[:-3] + (7, 7)))

        # Sandwich misalignment/rotation around the full second-order map.
        R_entry, R_exit = combined_rotation_misalignment_matrix(
            angle=self.tilt, misalignment=self.misalignment
        )
        T = jnp.einsum(
            "...ij,...jkl,...kn,...lm->...inm", R_exit, T, R_entry, R_entry
        )
        return T

    def _track_drift_kick_drift(self, incoming: Beam) -> Beam:
        """Momentum-dependent drift-kick-drift tracking via Bmad-X quadrupole
        coefficient matrices (ref ``quadrupole.py:168-251``) — evaluated in
        closed form, without the reference's step loop.

        The reference applies the same step map ``num_steps`` times: ``pz`` is
        constant through the element, so every step uses identical
        coefficients. That composition collapses exactly:

        - The 2x2 transverse matrices form a one-parameter group in the
          length, ``A(L/n)^n == A(L)`` (cos/sin and cosh/sinh addition laws).
        - The per-step z quadratic form ``c1 x^2 + c2 x px + c3 px^2`` is the
          exact integral of the longitudinal slip along the (exactly linear)
          transverse flow over one step, so the sum over steps telescopes to
          the full-length form: ``sum_i q_{L/n}(A^i v) == q_L(v)``.
        - ``low_energy_z_correction`` is linear in ``ds`` (both branches and
          a ``ds``-independent switch), so ``n * corr(L/n) == corr(L)``.

        The result is bit-compatible with the stepped reference up to float
        round-off (validated against the live torch oracle with
        ``num_steps=5`` and against external Bmad-X ground truth in
        ``tests/test_compare_bmadx_dkd.py``) and turns the stepped scan into
        ONE fused elementwise pass over the particle arrays — ``num_steps``
        no longer affects cost or result for this element.
        """
        assert isinstance(
            incoming, ParticleBeam
        ), "Drift-kick-drift tracking is currently only supported for `ParticleBeam`."

        mc2 = incoming.species.mass_eV
        x, px = incoming.x, incoming.px
        y, py = incoming.y, incoming.py

        z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(
            incoming.tau, incoming.p, incoming.energy, mc2
        )

        # Zero-offset fast path: with concrete-zero misalignment/tilt (the
        # common case, decided statically — see
        # Element._offsets_statically_zero) the entry/exit frame transforms
        # are the identity; dropping them removes the fusion-split
        # duplication XLA pays for them (1.27 ms of the 6.15 ms 4096x10k dkd
        # env step, PERF_NOTES.md). Ref behaviour: the reference always
        # computes them (``quadrupole.py:168-251``); identical results
        # because x - 0 == x exactly.
        apply_offsets = not self._offsets_statically_zero()
        x_offset = self.misalignment[..., 0]
        y_offset = self.misalignment[..., 1]

        if apply_offsets:
            x, px, y, py = bmadx.offset_particle_set(
                x_offset, y_offset, self.tilt, x, px, y, py
            )

        # Chromatic factorisation: the focusing-function argument
        # k1 L^2 / rel_p is rank-1 (instance x particle), so the map's
        # per-particle transcendentals reduce to one sqrt — the rest is the
        # design-momentum quartet at the instance shape plus a pure-FMA
        # Taylor correction (exact to machine precision for
        # sqrt(|k1|) L |1/sqrt(rel_p) - 1| <~ 1; see
        # bmadx.calculate_quadrupole_coefficients_chromatic). On TPU this
        # turns the vectorised dkd env step from transcendental-bound into
        # FMA-bound (measured ~2x, PERF_NOTES.md).
        (tx, dzx), (ty, dzy) = bmadx.calculate_quadrupole_coefficients_chromatic(
            self.k1[..., None], self.length, pz
        )
        dz_low_energy = bmadx.low_energy_z_correction(pz, p0c, mc2, self.length)

        z = (
            z
            + dzx[0] * jnp.square(x)
            + dzx[1] * x * px
            + dzx[2] * jnp.square(px)
            + dzy[0] * jnp.square(y)
            + dzy[1] * y * py
            + dzy[2] * jnp.square(py)
            + dz_low_energy
        )
        x, px = tx[0][0] * x + tx[0][1] * px, tx[1][0] * x + tx[1][1] * px
        y, py = ty[0][0] * y + ty[0][1] * py, ty[1][0] * y + ty[1][1] * py

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
    def is_skippable(self) -> bool:
        return self.tracking_method == "linear"

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.k1 != 0))

    def split(self, resolution: Array) -> list[Element]:
        num_splits = int(jnp.ceil(jnp.max(jnp.abs(self.length)) / resolution))
        return [
            Quadrupole(
                self.length / num_splits,
                self.k1,
                misalignment=self.misalignment,
                tilt=self.tilt,
                num_steps=self.num_steps,
                tracking_method=self.tracking_method,
                name=f"{self.name}_split_{i}",
                sanitize_name=False,
                metadata=self.metadata,
            )
            for i in range(num_splits)
        ]

    def merge(self, other: "Quadrupole") -> "Quadrupole | None":
        if not (
            self.tracking_method == other.tracking_method
            and self.misalignment.shape == other.misalignment.shape
            and bool(jnp.all(self.misalignment == other.misalignment))
            and bool(jnp.all(self.tilt == other.tilt))
        ):
            return None
        return self.__class__(
            length=self.length + other.length,
            k1=(self.k1 * self.length + other.k1 * other.length)
            / (self.length + other.length),
            misalignment=self.misalignment,
            tilt=self.tilt,
            num_steps=self.num_steps + other.num_steps,
            tracking_method=self.tracking_method,
            name=merge_element_names(self.name, other.name),
            sanitize_name=False,
            metadata={**other.metadata, **self.metadata},
        )

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "length",
            "k1",
            "misalignment",
            "tilt",
            "num_steps",
        ]
