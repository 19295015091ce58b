"""Element base class (ref ``cheetah/accelerator/element.py:17-491``).

Elements are mutable pytree dataclasses: physical parameters (length, k1,
misalignment, ...) are array leaves that JAX traces, differentiates, vmaps and
shards; configuration (name, tracking method, grid shapes) is static aux data.
The reference's ``nn.Parameter`` vs. buffer distinction becomes "which leaves
you pass to ``jax.grad``"; its per-element transfer-map cache
(``cheetah/utils/cache.py``) is subsumed by ``jax.jit`` tracing.

Design note: ``is_skippable`` must be decidable from *static* configuration
only (tracking method, element class) so that :class:`Segment` can partition
the lattice into fused linear runs at trace time. The reference's runtime
checks on tensor values (e.g. ``cavity.py:86-92``) would break under tracing.
"""

from __future__ import annotations

import warnings
from typing import Any

import jax.numpy as jnp
from jax import Array

from cheetah_tpu.particles import Beam, ParameterBeam, ParticleBeam, Species
from cheetah_tpu.utils.names import UniqueNameGenerator
from cheetah_tpu.utils.names import sanitize_name as _sanitize
from cheetah_tpu.utils.pytree import tree_equal
from cheetah_tpu.utils.warnings import DirtyNameWarning, PhysicsWarning

generate_unique_name = UniqueNameGenerator(prefix="unnamed_element")


def sum_element_lengths(lengths: list) -> Array:
    """Broadcast-sum of per-element lengths, host-cheap when concrete.

    Eager lattice surgery sums thousands of (tiny) length arrays; doing that
    with one device op per element costs one dispatch each — and one host
    sync each on remote-attached devices. When every value is concrete, ONE
    batched ``device_get`` plus a numpy reduction replaces them all. Under
    tracing (any value is a tracer) the device-side reduction is kept so the
    result stays differentiable.
    """
    import jax
    import numpy as np

    if not lengths:
        return jnp.zeros(())
    lengths = [
        value if isinstance(value, jax.core.Tracer) else jnp.asarray(value)
        for value in lengths
    ]
    if any(isinstance(value, jax.core.Tracer) for value in lengths):
        if all(value.shape == lengths[0].shape for value in lengths):
            return jnp.sum(jnp.stack(lengths), axis=0)
        total = lengths[0]
        for value in lengths[1:]:
            total = total + value
        return total
    host = jax.device_get(lengths)
    total = host[0]
    for value in host[1:]:
        total = np.add(total, value)
    return jnp.asarray(total)


def second_order_moment_transport(
    T: Array, mu: Array, cov: Array
) -> tuple[Array, Array]:
    r"""Exact first/second moments of ``out_i = T_ijk p_j p_k`` for Gaussian p.

    A :class:`ParameterBeam` is by definition Gaussian, so its moments
    propagate through a quadratic map in closed form (Isserlis / quadratic
    forms of Gaussians). With ``B_i = (T_i + T_i^T) / 2``:

    .. math::
        \mu'_i = \mu^T B_i \mu + \mathrm{tr}(B_i \Sigma), \qquad
        \Sigma'_{il} = 2\,\mathrm{tr}(B_i \Sigma B_l \Sigma)
                       + 4\,(B_i \mu)^T \Sigma (B_l \mu).

    When ``T`` encodes a purely linear map (first-order block in
    ``T[..., :, 6, :]``, augmented coordinate ``p_6 = 1``) this reduces
    algebraically to the familiar congruence ``mu' = M mu``,
    ``cov' = M cov M^T`` — verified in ``tests/test_second_order_fusion.py``.
    O(7^4) per lattice instance, independent of particle count. The reference
    raises on ``ParameterBeam`` second-order tracking
    (ref ``element.py:195-203``); this closure removes that restriction.
    """
    B = 0.5 * (T + jnp.swapaxes(T, -1, -2))
    mu_out = jnp.einsum("...ijk,...j,...k->...i", B, mu, mu) + jnp.einsum(
        "...ijk,...jk->...i", B, cov
    )
    BS = jnp.einsum("...ijk,...kl->...ijl", B, cov)  # B_i @ Sigma
    Bmu = jnp.einsum("...ijk,...k->...ij", B, mu)  # B_i @ mu
    cov_out = 2.0 * jnp.einsum("...ijk,...lkj->...il", BS, BS) + 4.0 * jnp.einsum(
        "...ij,...jk,...lk->...il", Bmu, cov, Bmu
    )
    return mu_out, cov_out


def apply_second_order_map(T: Array, p: Array) -> Array:
    """Apply a 7x7x7 second-order map: ``out_i = sum_jk T_ijk p_j p_k``.

    Two formulations, picked by whether the PARTICLE array carries batch dims
    (the map ``T`` may be batched either way — per-instance lattice settings):

    * Unbatched particles ``(N, 7)`` (the vectorised-lattice case): the
      quadratic form factors through the instance-INDEPENDENT outer-product
      matrix ``S[n, jk] = p_j p_k`` — ``(N, 49)``, ~2.8 MB at 10k particles —
      and the whole contraction is ONE batched matmul
      ``(N, 49) @ (..., 49, 7)``, i.e. the same single materialisation as
      linear transport. Measured 13.3 -> ~2 ms on the 4096x10k second_order
      env step vs the per-component unroll below (which pays 7 full-size dot
      outputs).
    * Batched particles: ``S`` would be ``(..., N, 49)`` — 7x the linear
      intermediate (8 TB at 4096x10k). Unroll over the 7 output components
      instead: per ``i`` a ``(..., N, 7) @ (..., 7, 7)`` matmul plus a fused
      multiply-reduce keeps the peak intermediate at ``(..., N, 7)``.
    """
    if p.ndim == 2:
        S = (p[:, :, None] * p[:, None, :]).reshape(p.shape[0], 49)
        T2 = T.reshape(*T.shape[:-3], 7, 49)
        return S @ jnp.swapaxes(T2, -1, -2)
    return jnp.stack(
        [
            jnp.sum((p @ jnp.swapaxes(T[..., i, :, :], -1, -2)) * p, axis=-1)
            for i in range(7)
        ],
        axis=-1,
    )


class Element:
    """Base class for elements of particle accelerators.

    Subclasses are pytree dataclasses; this base provides shared tracking
    logic and naming. Construct subclasses directly, not this class.
    """

    #: Tracking methods supported by the element type; the first is the default.
    supported_tracking_methods: list[str] = ["linear"]

    #: Default tracking method for elements that do not declare it as a
    #: (static) field.
    tracking_method: str = "linear"

    #: Names of the attributes whose concrete-zero state makes the Bmad-X
    #: entry/exit frame transforms (``offset_particle_set``/``unset``) the
    #: identity. Subclasses with a drift-kick-drift path set this (plain
    #: class attribute, NOT a dataclass field) and declare an
    #: ``_aligned_hint`` static field; :meth:`__setattr__` then keeps the
    #: hint in sync on assignment.
    _offset_fields: tuple = ()

    def _compute_aligned_hint(self) -> bool:
        """True when every offset attribute exists and is a CONCRETE zero.
        Evaluated eagerly on assignment (construction and user mutation), so
        the result can ride the pytree treedef into traces where the values
        themselves are tracers (segment passed as a jit argument). The check
        runs on the host via numpy: ``jnp`` ops on concrete constants become
        tracers under an ambient trace (e.g. constructing an element inside
        ``shard_map``), which must not leak into this static decision."""
        import jax
        import numpy as np

        for field_name in type(self)._offset_fields:
            value = getattr(self, field_name, None)
            if value is None or isinstance(value, jax.core.Tracer):
                return False
            if not bool(np.all(np.asarray(value) == 0)):
                return False
        return True

    def _offsets_statically_zero(self) -> bool:
        """Static (trace-time) decision: may the entry/exit frame transforms
        be dropped from the compiled graph? (They duplicate the whole
        elementwise chain through XLA's fusion splits — measured 1.27 ms of
        a 6.15 ms dkd env step, PERF_NOTES.md.)

        - Concrete values: decided from the values directly (no staleness).
        - Values under differentiation (``jax.grad``/``jvp`` w.r.t. the
          element): never dropped, so offset gradients at zero stay exact.
        - Values merely traced (``jit``/``vmap`` argument): the
          construction-time ``_aligned_hint`` decides. Caveat: surgery that
          swaps the arrays WITHOUT attribute assignment (raw
          ``tree_map``/``tree_unflatten``) keeps the stale hint — reassign
          the attribute (or reconstruct the element) after such surgery.
        """
        import jax
        import numpy as np

        from cheetah_tpu.utils.pytree import is_differentiation_tracer

        values = [getattr(self, name) for name in type(self)._offset_fields]
        if not any(isinstance(value, jax.core.Tracer) for value in values):
            # numpy, not jnp: concrete constants inside an ambient trace
            # (shard_map, vmap closures) must stay a host-side decision.
            return all(bool(np.all(np.asarray(value) == 0)) for value in values)
        if any(is_differentiation_tracer(value) for value in values):
            return False
        return getattr(self, "_aligned_hint", False)

    def _init_element(
        self,
        name: str | None,
        sanitize_name: bool | None,
        metadata: dict | None,
        tracking_method: str | None = None,
    ) -> None:
        name = name if name is not None else generate_unique_name()
        if not name.isidentifier():
            if sanitize_name:
                name = _sanitize(name)
            elif sanitize_name is None:
                warnings.warn(
                    f"Dirty element name {name} is not a valid Python variable "
                    "name. You will not be able to use the "
                    "`segment.element_name` syntax to access this element. Set "
                    "`sanitize_name=True` to change the name to a valid one, or "
                    "`sanitize_name=False` to silence this warning.",
                    category=DirtyNameWarning,
                    stacklevel=3,
                )
        self.name = name
        self.metadata = metadata if metadata is not None else {}
        if tracking_method is not None:
            if tracking_method not in self.supported_tracking_methods:
                warnings.warn(
                    f"Invalid tracking method '{tracking_method}' for element "
                    f"{self.name} of type {self.__class__.__name__}, supported "
                    f"methods are {self.supported_tracking_methods}. Using "
                    f"'{self.supported_tracking_methods[0]}' instead.",
                    PhysicsWarning,
                    stacklevel=3,
                )
                tracking_method = self.supported_tracking_methods[0]
            self.tracking_method = tracking_method
        elif "tracking_method" in getattr(self, "__pytree_static_fields__", ()):
            self.tracking_method = self.supported_tracking_methods[0]

    def __setattr__(self, key: str, value: Any) -> None:
        # Validate tracking-method assignment like the reference's property
        # setter (ref ``element.py:231-259``): warn and fall back to the
        # first supported method instead of failing later inside ``track``.
        # Pytree unflatten bypasses this via ``object.__setattr__``.
        if key == "tracking_method" and value not in self.supported_tracking_methods:
            warnings.warn(
                f"Invalid tracking method '{value}' for element "
                f"{getattr(self, 'name', '?')} of type "
                f"{self.__class__.__name__}, supported methods are "
                f"{self.supported_tracking_methods}. Using "
                f"'{self.supported_tracking_methods[0]}' instead.",
                category=PhysicsWarning,
                stacklevel=2,
            )
            value = self.supported_tracking_methods[0]
        object.__setattr__(self, key, value)
        if key in type(self)._offset_fields:
            object.__setattr__(self, "_aligned_hint", self._compute_aligned_hint())

    # ------------------------------------------------------------------
    # Transfer maps
    # ------------------------------------------------------------------

    def transfer_map(self, energy: Array, species: Species) -> Array:
        """Deprecated alias of :meth:`first_order_transfer_map`
        (ref ``element.py:67-102``)."""
        warnings.warn(
            "The `transfer_map` method is deprecated and will be removed in a "
            "future version. Use `first_order_transfer_map` instead.",
            DeprecationWarning,
            stacklevel=2,
        )
        return self.first_order_transfer_map(energy, species)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        r"""The element's first-order 7x7 transfer map for a beam with
        reference ``energy`` and ``species`` (ref ``element.py:104-132``)."""
        raise NotImplementedError

    def second_order_transfer_map(self, energy: Array, species: Species) -> Array:
        r"""The element's second-order 7x7x7 T-tensor ``T_ijk`` such that
        ``out_i = sum_jk T_ijk in_j in_k`` (ref ``element.py:134-147``)."""
        raise NotImplementedError

    # ------------------------------------------------------------------
    # Tracking
    # ------------------------------------------------------------------

    def track(self, incoming: Beam) -> Beam:
        """Track a beam through the element, returning the outgoing beam.

        Pure function of ``(self, incoming)``; safe to call under ``jax.jit``
        with the element (or a containing :class:`Segment`) as an argument.
        """
        method = getattr(self, "tracking_method", "linear")
        if method == "linear":
            return self._track_first_order(incoming)
        elif method == "second_order":
            return self._track_second_order(incoming)
        elif method == "drift_kick_drift":
            return self._track_drift_kick_drift(incoming)
        else:
            raise ValueError(
                f"Invalid tracking method {method}. For element of type "
                f"{self.__class__.__name__}, supported methods are "
                f"{self.supported_tracking_methods}."
            )

    def _track_first_order(self, incoming: Beam) -> Beam:
        """Linear tracking: moments congruence for ``ParameterBeam``, batched
        ``(..., N, 7) @ (..., 7, 7)^T`` matmul for ``ParticleBeam``
        (ref ``element.py:159-193``)."""
        if isinstance(incoming, ParameterBeam):
            tm = self.first_order_transfer_map(incoming.energy, incoming.species)
            new_mu = jnp.squeeze(tm @ incoming.mu[..., None], -1)
            new_cov = tm @ incoming.cov @ jnp.swapaxes(tm, -1, -2)
            return ParameterBeam(
                new_mu,
                new_cov,
                incoming.energy,
                total_charge=incoming.total_charge,
                s=incoming.s + self.length,
                species=incoming.species,
            )
        elif isinstance(incoming, ParticleBeam):
            tm = self.first_order_transfer_map(incoming.energy, incoming.species)
            new_particles = incoming.particles @ jnp.swapaxes(tm, -1, -2)
            return ParticleBeam(
                new_particles,
                incoming.energy,
                particle_charges=incoming.particle_charges,
                survival_probabilities=incoming.survival_probabilities,
                s=incoming.s + self.length,
                species=incoming.species,
            )
        else:
            raise TypeError(f"Parameter incoming is of invalid type {type(incoming)}")

    def _track_second_order(self, incoming: Beam) -> Beam:
        """Second-order tracking via ``out_i = sum_jk T_ijk in_j in_k``
        (ref ``element.py:195-225``). For :class:`ParameterBeam` the Gaussian
        moments propagate exactly through the quadratic map via
        :func:`second_order_moment_transport` — the reference raises here."""
        T = self.second_order_transfer_map(incoming.energy, incoming.species)
        if isinstance(incoming, ParameterBeam):
            new_mu, new_cov = second_order_moment_transport(
                T, incoming.mu, incoming.cov
            )
            return ParameterBeam(
                new_mu,
                new_cov,
                incoming.energy,
                total_charge=incoming.total_charge,
                s=incoming.s + self.length,
                species=incoming.species,
            )
        assert isinstance(
            incoming, ParticleBeam
        ), f"Parameter incoming is of invalid type {type(incoming)}"

        outgoing_particles = apply_second_order_map(T, incoming.particles)

        return ParticleBeam(
            particles=outgoing_particles,
            energy=incoming.energy,
            particle_charges=incoming.particle_charges,
            survival_probabilities=incoming.survival_probabilities,
            s=incoming.s + self.length,
            species=incoming.species,
        )

    def _track_drift_kick_drift(self, incoming: Beam) -> Beam:
        raise NotImplementedError(
            f"{self.__class__.__name__} does not support drift-kick-drift tracking."
        )

    def __call__(self, incoming: Beam) -> Beam:
        return self.track(incoming)

    # ------------------------------------------------------------------
    # Structure
    # ------------------------------------------------------------------

    # NOTE: Elements with a physical length declare ``length`` as a pytree
    # leaf field; zero-length elements define a ``length`` property returning
    # a scalar zero (see :class:`ZeroLengthMixin`).

    @property
    def is_skippable(self) -> bool:
        """Whether the element's map can be fused with its neighbours'. Must
        be a function of static configuration only (see module docstring)."""
        raise NotImplementedError

    @property
    def defining_features(self) -> list[str]:
        """Features that define the element; used for equality, cloning and
        serialisation (ref ``element.py:299-312``)."""
        static = ["name"]
        if len(self.supported_tracking_methods) > 1:
            static.append("tracking_method")
        return static

    @property
    def defining_tensors(self) -> list[str]:
        """Subset of defining features that are arrays."""
        return [
            feature
            for feature in self.defining_features
            if isinstance(getattr(self, feature), (jnp.ndarray, float, int))
            and not isinstance(getattr(self, feature), bool)
        ]

    def clone(self) -> "Element":
        """Copy of the element (a new pytree object with the same leaves)."""
        import copy

        kwargs = {}
        for feature in self.defining_features:
            value = getattr(self, feature)
            kwargs[feature] = (
                copy.deepcopy(value) if isinstance(value, (dict, list)) else value
            )
        return self.__class__(
            **kwargs, metadata=copy.deepcopy(self.metadata), sanitize_name=False
        )

    def split(self, resolution: Array) -> list["Element"]:
        """Split the element into slices no longer than ``resolution`` m.
        Non-splittable elements return ``[self]`` (ref ``element.py:338-347``)."""
        return [self]

    def merge(self, other: "Element") -> "Element | None":
        """Attempt to merge with another element of the same type; ``None`` if
        unsupported (ref ``element.py:349-358``)."""
        return None

    def sanitize_name(self) -> None:
        """Make the element's name a valid Python identifier."""
        self.name = _sanitize(self.name)

    # ------------------------------------------------------------------
    # Visualisation
    # ------------------------------------------------------------------

    def plot(self, s, vector_idx: tuple | None = None, ax=None):
        """Draw a 1D cartoon of this element at position ``s`` (ref
        ``element.py:375-389``)."""
        from cheetah_tpu.plotting import plot_element

        return plot_element(self, s, vector_idx, ax)

    def to_mesh(
        self,
        cuteness: float | dict = 1.0,
        asset_version: str = "v1.2.0",
        show_download_progress: bool = True,
    ):
        """3D mesh representation of the element plus the transform aligning
        the next downstream mesh (ref ``element.py:391-483``). Requires the
        optional ``trimesh`` dependency; the mesh is ``None`` if the asset is
        unavailable."""
        try:
            import trimesh
        except ImportError:
            raise ImportError(
                "To use 3D visualisation, trimesh must be installed."
            )

        from cheetah_tpu.utils import assets
        from cheetah_tpu.utils.warnings import VisualizationWarning

        length = float(jnp.max(jnp.asarray(self.length)))
        output_transform = trimesh.transformations.translation_matrix(
            [0.0, 0.0, length]
        )

        snake_case = "".join(
            "_" + c.lower() if c.isupper() else c for c in type(self).__name__
        ).lstrip("_")
        mesh = assets.load_3d_asset(
            f"{snake_case}.glb",
            branch_or_tag=asset_version,
            show_download_progress=show_download_progress,
        )
        if mesh is None:
            warnings.warn(
                f"Could not load 3D mesh for element {self.name} of type "
                f"{type(self).__name__}. The element will not be visualised.",
                category=VisualizationWarning,
                stacklevel=2,
            )
            return None, output_transform

        # Scale to the physical length (meshes of thin elements keep their
        # default size, with a warning if a length was expected).
        if abs(length) > 0.0:
            _, _, mesh_length = mesh.extents
            mesh.apply_scale(length / mesh_length)
        elif "length" in self.defining_features:
            warnings.warn(
                f"Element {self.name} of type {type(self).__name__} has a "
                "length of zero. The mesh is therefore scaled to a default "
                "size and does not accurately represent the element's length.",
                category=VisualizationWarning,
                stacklevel=2,
            )

        if isinstance(cuteness, dict):
            cuteness = cuteness.get(
                self.name, cuteness.get(type(self), cuteness.get("*", 1.0))
            )
        mesh.apply_scale(cuteness)

        return mesh, output_transform

    def __eq__(self, other: object) -> bool:
        if type(self) is not type(other):
            return False
        for feature in self.defining_features:
            a, b = getattr(self, feature), getattr(other, feature)
            if feature == "name":
                continue
            if isinstance(a, jnp.ndarray) or isinstance(b, jnp.ndarray):
                a, b = jnp.asarray(a), jnp.asarray(b)
                if a.shape != b.shape or bool(jnp.any(a != b)):
                    return False
            elif isinstance(a, Element) or (
                isinstance(a, (list, tuple))
                and any(isinstance(item, Element) for item in a)
            ):
                if not tree_equal(a, b):
                    return False
            elif a != b:
                return False
        return True

    __hash__ = None

    def __repr__(self) -> str:
        feature_list = [
            f"{feature}={getattr(self, feature)!r}"
            for feature in self.defining_features
        ]
        return f"{self.__class__.__name__}({', '.join(feature_list)})"


class ZeroLengthMixin:
    """Mixin providing a constant zero ``length`` for thin elements."""

    @property
    def length(self) -> Array:
        return jnp.zeros(())


def validate_understood_kwargs(kwargs: dict[str, Any], understood: list[str]) -> None:
    """Raise on constructor kwargs that are not understood."""
    for key in kwargs:
        if key not in understood:
            raise TypeError(f"Unexpected keyword argument {key!r}")
