"""Dipole / sector bending magnet (ref ``cheetah/accelerator/dipole.py:16-531``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.ops.transfer_maps import base_rmatrix, base_ttensor, rotation_matrix
from cheetah_tpu.particles import Beam, ParticleBeam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils import bmadx
from cheetah_tpu.utils.maths import sqrta2minusbdiva
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Dipole(Element):
    """Dipole magnet (by default a sector bending magnet).

    :param length: Length in m.
    :param angle: Deflection angle in rad.
    :param k1: Focusing strength in 1/m^2 (``"linear"`` tracking only).
    :param dipole_e1: Inclination of the entrance face in rad.
    :param dipole_e2: Inclination of the exit face in rad.
    :param tilt: Tilt in the x-y plane in rad.
    :param gap: Magnet gap in m (MAD/ELEGANT ``HGAP = gap/2``).
    :param gap_exit: Magnet gap at the exit in m, if different from ``gap``.
    :param fringe_integral: Fringe field integral of the entrance face.
    :param fringe_integral_exit: Fringe field integral of the exit face, if
        different.
    :param fringe_at: Where to apply fringe fields for ``"drift_kick_drift"``
        tracking: ``"neither"``, ``"entrance"``, ``"exit"`` or ``"both"``
        (static).
    :param fringe_type: Only ``"linear_edge"`` is supported (static).
    :param tracking_method: ``"linear"``, ``"second_order"`` or
        ``"drift_kick_drift"`` (static).
    :param name: Unique identifier of the element.
    """

    length: Array
    angle: Array
    k1: Array
    dipole_e1: Array
    dipole_e2: Array
    tilt: Array
    gap: Array
    gap_exit: Array
    fringe_integral: Array
    fringe_integral_exit: Array
    name: str = static_field(None)
    fringe_at: str = static_field("both")
    fringe_type: str = static_field("linear_edge")
    tracking_method: str = static_field("linear")
    metadata: dict = static_field(None)
    _aligned_hint: bool = static_field(False, init=False)

    supported_tracking_methods = ["linear", "second_order", "drift_kick_drift"]
    _offset_fields = ("tilt",)

    def __init__(
        self,
        length: Array,
        angle: Array | None = None,
        k1: Array | None = None,
        dipole_e1: Array | None = None,
        dipole_e2: Array | None = None,
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
        self.length = as_float_array(length, dtype=dtype)
        dtype = self.length.dtype
        asarr = lambda value, default: as_float_array(  # noqa: E731
            value if value is not None else default, dtype=dtype
        )
        self.angle = asarr(angle, 0.0)
        self.k1 = asarr(k1, 0.0)
        self.dipole_e1 = asarr(dipole_e1, 0.0)
        self.dipole_e2 = asarr(dipole_e2, 0.0)
        self.fringe_integral = asarr(fringe_integral, 0.0)
        self.fringe_integral_exit = (
            as_float_array(fringe_integral_exit, dtype=dtype)
            if fringe_integral_exit is not None
            else self.fringe_integral
        )
        self.gap = asarr(gap, 0.0)
        self.gap_exit = (
            as_float_array(gap_exit, dtype=dtype) if gap_exit is not None else self.gap
        )
        self.tilt = asarr(tilt, 0.0)
        self.fringe_at = fringe_at
        self.fringe_type = fringe_type
        self._init_element(name, sanitize_name, metadata, tracking_method)

    @property
    def hx(self) -> Array:
        """Curvature of the trajectory (zero length is not physical)."""
        return self.angle / self.length

    @property
    def is_skippable(self) -> bool:
        return self.tracking_method == "linear"

    @property
    def is_active(self) -> bool:
        return bool(jnp.any(self.angle != 0))

    # ------------------------------------------------------------------
    # Linear and second-order maps
    # ------------------------------------------------------------------

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        R_enter = self._transfer_map_enter()
        R_exit = self._transfer_map_exit()
        R = base_rmatrix(
            length=self.length,
            k1=self.k1,
            hx=self.hx,
            species=species,
            energy=energy,
        )  # Tilt is applied after adding edges

        R = R_exit @ R @ R_enter

        rotation = rotation_matrix(self.tilt)
        return jnp.swapaxes(rotation, -1, -2) @ R @ rotation

    def second_order_transfer_map(self, energy: Array, species: Species) -> Array:
        R_enter = self._transfer_map_enter()
        R_exit = self._transfer_map_exit()

        T = base_ttensor(
            length=self.length,
            k1=self.k1,
            k2=jnp.zeros_like(self.length),
            hx=self.hx,
            species=species,
            energy=energy,
        )
        R = base_rmatrix(
            length=self.length, k1=self.k1, hx=self.hx, species=species, energy=energy
        )
        T = T.at[..., :, 6, :].set(jnp.broadcast_to(R, T.shape[:-3] + (7, 7)))

        T = jnp.einsum(
            "...ij,...jkl,...kn,...lm->...inm", R_exit, T, R_enter, R_enter
        )

        rotation = rotation_matrix(self.tilt)
        return jnp.einsum(
            "...ji,...jkl,...kn,...lm->...inm", rotation, T, rotation, rotation
        )

    def _transfer_map_enter(self) -> Array:
        """Pole-face rotation + fringe map of the entrance face
        (ref ``dipole.py:430-447``)."""
        sec_e = 1.0 / jnp.cos(self.dipole_e1)
        phi = (
            self.fringe_integral
            * self.hx
            * self.gap
            * sec_e
            * (1 + jnp.square(jnp.sin(self.dipole_e1)))
        )
        r10 = self.hx * jnp.tan(self.dipole_e1)
        r32 = -self.hx * jnp.tan(self.dipole_e1 - phi)
        r10, r32 = jnp.broadcast_arrays(r10, r32)

        tm = jnp.broadcast_to(jnp.eye(7, dtype=r10.dtype), (*r10.shape, 7, 7))
        tm = tm.at[..., 1, 0].set(r10)
        tm = tm.at[..., 3, 2].set(r32)
        return tm

    def _transfer_map_exit(self) -> Array:
        """Pole-face rotation + fringe map of the exit face
        (ref ``dipole.py:449-466``)."""
        sec_e = 1.0 / jnp.cos(self.dipole_e2)
        phi = (
            self.fringe_integral_exit
            * self.hx
            * self.gap
            * sec_e
            * (1 + jnp.square(jnp.sin(self.dipole_e2)))
        )
        r10 = self.hx * jnp.tan(self.dipole_e2)
        r32 = -self.hx * jnp.tan(self.dipole_e2 - phi)
        r10, r32 = jnp.broadcast_arrays(r10, r32)

        tm = jnp.broadcast_to(jnp.eye(7, dtype=r10.dtype), (*r10.shape, 7, 7))
        tm = tm.at[..., 1, 0].set(r10)
        tm = tm.at[..., 3, 2].set(r32)
        return tm

    # ------------------------------------------------------------------
    # Drift-kick-drift (exact Bmad-X sector bend)
    # ------------------------------------------------------------------

    def _track_drift_kick_drift(self, incoming: Beam) -> Beam:
        """Exact sector-bend body with linear fringes
        (ref ``dipole.py:183-243``)."""
        assert isinstance(
            incoming, ParticleBeam
        ), "Drift-kick-drift tracking is currently only supported for `ParticleBeam`."

        mc2 = incoming.species.mass_eV
        zero = jnp.zeros_like(self.tilt)

        x, px = incoming.x, incoming.px
        y, py = incoming.y, incoming.py

        z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(
            incoming.tau, incoming.p, incoming.energy, mc2
        )

        # Zero-tilt fast path (see Element._offsets_statically_zero): drops
        # the entry/exit frame rotations XLA would otherwise duplicate into
        # the fused chain. Identical results (rotation by 0 is the identity).
        apply_offsets = not self._offsets_statically_zero()
        if apply_offsets:
            x, px, y, py = bmadx.offset_particle_set(
                zero, zero, self.tilt, x, px, y, py
            )

        if self.fringe_at in ("entrance", "both"):
            px, py = self._bmadx_fringe_linear("entrance", x, px, y, py)
        x, px, y, py, z, pz = self._bmadx_body(x, px, y, py, z, pz, p0c, mc2)
        if self.fringe_at in ("exit", "both"):
            px, py = self._bmadx_fringe_linear("exit", x, px, y, py)

        if apply_offsets:
            x, px, y, py = bmadx.offset_particle_unset(
                zero, zero, self.tilt, x, px, y, py
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

    def _bmadx_body(
        self,
        x: Array,
        px: Array,
        y: Array,
        py: Array,
        z: Array,
        pz: Array,
        p0c: Array,
        mc2: Array,
    ) -> tuple[Array, ...]:
        r"""Exact sector-bend body map (ref ``dipole.py:245-336``).

        The reference evaluates, per particle, ``arcsin`` (entry angle
        ``phi1``), ``arctan2`` (chord angle), and four ``sin``/``cos`` calls
        at per-particle arguments. Unlike the quadrupole's focusing argument
        (rank-1 in instance x particle, see
        ``calculate_quadrupole_coefficients_chromatic``), ``phi1 =
        arcsin(px/px_norm)`` depends jointly on ``(px, py, pz)`` — no
        factorisation applies. Instead this implementation removes the
        *angle representation* wherever only sines/cosines are consumed
        (angle-addition identities with ``sin(phi1) = px/px_norm`` and
        ``cos(phi1) = sqrt(1 - sin^2)``, exact for ``phi1`` in
        ``[-pi/2, pi/2]`` by construction), leaving ONE inverse-trig call
        per particle — the arc angle ``theta_p = 2 arcsin(sin(theta_p/2))``
        needed for the arc length ``Lp`` (and for small ``theta_p`` the
        arcsin form is the numerically stabler of the two: the reference's
        ``angle + phi1 - pi/2 - atan2`` cancels O(1) angles). Per-particle
        transcendental budget: 1 arcsin + sqrts, down from
        arcsin + atan2 + 4 sin/cos + sqrts (measured on the 4096x10k env
        step, PERF_NOTES.md "dkd beyond the quadrupole").
        """
        length = self.length[..., None]
        angle = self.angle[..., None]

        px_norm = jnp.sqrt(jnp.square(1 + pz) - jnp.square(py))
        # sin/cos of the entry angle phi1 = arcsin(px / px_norm), without the
        # angle itself: cos(phi1) >= 0 always (phi1 in [-pi/2, pi/2]).
        sin_phi1 = px / px_norm
        cos_phi1 = jnp.sqrt((1 - sin_phi1) * (1 + sin_phi1))
        sin_angle = jnp.sin(angle)  # instance-shaped
        cos_angle = jnp.cos(angle)
        # A = angle + phi1 by angle addition.
        sin_A = sin_angle * cos_phi1 + cos_angle * sin_phi1
        cos_A = cos_angle * cos_phi1 - sin_angle * sin_phi1

        g = self.angle / self.length
        gp = g[..., None] / px_norm

        sinc_angle = bmadx.sinc(angle)
        alpha = (
            2 * (1 + g[..., None] * x) * sin_A * length * sinc_angle
            - gp * jnp.square((1 + g[..., None] * x) * length * sinc_angle)
        )

        x2_t1 = x * cos_angle + jnp.square(length) * g[..., None] * bmadx.cosc(
            angle
        )
        x2_t2 = jnp.sqrt(jnp.square(cos_A) + gp * alpha)
        x2_t3 = cos_A

        c1 = x2_t1 + alpha / (x2_t2 + x2_t3)
        c2 = x2_t1 + alpha * sqrta2minusbdiva(x2_t3, gp * alpha)
        # |angle + phi1| < pi/2  <=>  cos_A > 0 on the physical branch
        # (|A| < pi for practical bends). Branch allowed because both sides
        # contain the same inputs.
        x2 = jnp.where(cos_A > 0, c1, c2)

        Lcu = (
            x2
            - jnp.square(length) * g[..., None] * bmadx.cosc(angle)
            - x * cos_angle
        )
        Lcv = -length * sinc_angle - x * sin_angle

        # theta_p = 2 (A - pi/2 - atan2(Lcv, Lcu)); with u = atan2(Lcv, Lcu),
        # sin(theta_p/2) = sin(A - pi/2 - u) = -cos(A - u)
        #               = -(cos_A Lcu + sin_A Lcv) / Lc,
        # and |theta_p| < pi for any practical bend, so the angle itself is
        # recovered by ONE arcsin (stable: no large-angle cancellation).
        Lc = jnp.sqrt(jnp.square(Lcu) + jnp.square(Lcv))
        sin_half = -(cos_A * Lcu + sin_A * Lcv) / Lc
        half_p = jnp.arcsin(sin_half)
        # Lp = Lc / sinc(theta_p / 2) = Lc * half_p / sin_half; the where
        # guards the removable zero (ratio = 1 + theta^2/24 + ..., below one
        # ulp for |sin_half| < 1e-9 even at f64).
        tiny = jnp.abs(sin_half) < 1e-9
        Lp = jnp.where(
            tiny, Lc, Lc * half_p / jnp.where(tiny, 1.0, sin_half)
        )

        P = p0c[..., None] * (1 + pz)  # In eV
        E = jnp.sqrt(jnp.square(P) + jnp.square(mc2))
        E0 = jnp.sqrt(jnp.square(p0c) + jnp.square(mc2))
        beta = P / E
        beta0 = p0c / E0

        x_f = x2
        # px_f = px_norm sin(A - theta_p), by angle addition from the free
        # sin/cos(theta_p) = (2 sin cos, 1 - 2 sin^2) of the half angle.
        cos_half = jnp.sqrt((1 - sin_half) * (1 + sin_half))
        sin_theta = 2 * sin_half * cos_half
        cos_theta = 1 - 2 * jnp.square(sin_half)
        px_f = px_norm * (sin_A * cos_theta - cos_A * sin_theta)
        y_f = y + py * Lp / px_norm
        z_f = z + (beta * length / beta0[..., None]) - ((1 + pz) * Lp / px_norm)

        return x_f, px_f, y_f, py, z_f, pz

    def _bmadx_fringe_linear(
        self, location: str, x: Array, px: Array, y: Array, py: Array
    ) -> tuple[Array, Array]:
        """Linear fringe kick (ref ``dipole.py:338-370``)."""
        g = self.angle / self.length
        e = self.dipole_e1 if location == "entrance" else self.dipole_e2
        f_int = (
            self.fringe_integral
            if location == "entrance"
            else self.fringe_integral_exit
        )
        h_gap = 0.5 * (self.gap if location == "entrance" else self.gap_exit)

        hx = g * jnp.tan(e)
        hy = -g * jnp.tan(
            e - 2 * f_int * h_gap * g * (1 + jnp.square(jnp.sin(e))) / jnp.cos(e)
        )
        px_f = px + x * hx[..., None]
        py_f = py + y * hy[..., None]
        return px_f, py_f

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + [
            "length",
            "angle",
            "k1",
            "dipole_e1",
            "dipole_e2",
            "tilt",
            "gap",
            "gap_exit",
            "fringe_integral",
            "fringe_integral_exit",
            "fringe_at",
            "fringe_type",
        ]
