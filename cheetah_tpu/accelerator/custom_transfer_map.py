"""Element wrapping an arbitrary 7x7 transfer map
(ref ``cheetah/accelerator/custom_transfer_map.py:12-135``).

``from_merging_elements`` is the engine of lattice fusion: it folds a run of
skippable elements into one precomposed matrix, tracking a probe beam along to
capture energy dependence.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax import Array

from cheetah_tpu.accelerator.element import Element, sum_element_lengths
from cheetah_tpu.particles import Beam
from cheetah_tpu.particles.species import Species
from cheetah_tpu.utils.pytree import as_float_array, pytree_dataclass, static_field


def _group_key(element: Element):
    """Hashable structure key: elements sharing it can have their maps built
    in one ``vmap`` call. ``None`` opts the element out of batching (nested
    Segments, unhashable statics, non-array leaves)."""
    cls = type(element)
    leaf_fields = getattr(cls, "__pytree_leaf_fields__", None)
    static_fields = getattr(cls, "__pytree_static_fields__", None)
    if not leaf_fields or static_fields is None:
        # No array leaves (e.g. Marker): nothing for vmap to batch over —
        # and nothing to gain, the map is constant.
        return None
    try:
        statics = tuple(
            (name, getattr(element, name))
            for name in static_fields
            if name not in ("name", "metadata")
        )
        hash(statics)
        shapes = []
        for name in leaf_fields:
            leaf = getattr(element, name)
            if not isinstance(leaf, (jax.Array, float, int)) or isinstance(
                leaf, jax.core.Tracer
            ):
                return None
            arr = jnp.asarray(leaf)
            shapes.append((name, arr.shape, str(arr.dtype)))
        return (cls, statics, tuple(shapes))
    except TypeError:
        return None


@jax.jit
def _jitted_vmapped_transfer_map(batched_element, energy, species):
    """One compiled vmapped map constructor per element structure (the
    batched element's statics are normalised by the caller)."""
    return jax.vmap(
        lambda e: e.first_order_transfer_map(energy, species)
    )(batched_element)


def _next_pow2(n: int) -> int:
    return 1 << max(n - 1, 0).bit_length()


def _run_transfer_maps(elements: list[Element], energy, species):
    """First-order maps of every element at the shared incoming energy, as one
    ``(B, *batch, 7, 7)`` array with ``B = next_pow2(len(elements))`` and
    identity maps in the padding rows (so an ordered fold over all ``B`` rows
    equals the fold over the real ones).

    Eager-mode cost is the design constraint (this is a host-side lattice
    surgery pass): structure-sharing elements have their maps built in ONE
    jitted ``vmap`` call, all parameter leaves cross to the host in ONE
    batched ``device_get`` (a single sync instead of one per parameter on
    remote-attached devices), and every device-visible shape is padded to a
    power of two so the jit/eager op caches see a bounded set of shapes
    across lattice sizes.
    """
    n = len(elements)
    groups: dict = {}
    singles: list[int] = []
    for i, element in enumerate(elements):
        key = _group_key(element)
        if key is None:
            singles.append(i)
        else:
            groups.setdefault(key, []).append(i)

    grouped: list[tuple[list[int], list[Element]]] = []
    flat_leaves: list = []
    for key, idxs in list(groups.items()):
        if len(idxs) == 1:
            singles.append(idxs[0])
            continue
        members = [elements[i] for i in idxs]
        grouped.append((idxs, members))
        for member in members:
            for field in type(member).__pytree_leaf_fields__:
                flat_leaves.append(getattr(member, field))
    flat_host = iter(jax.device_get(flat_leaves))

    blocks: list[tuple[list[int], int, jax.Array]] = []  # (idxs, g, maps)
    for idxs, members in grouped:
        cls = type(members[0])
        fields = cls.__pytree_leaf_fields__
        host_leaves = [
            [next(flat_host) for _ in fields] for _ in members
        ]
        g = len(members)
        g_padded = _next_pow2(g)
        stacked_leaves = []
        for j in range(len(fields)):
            arr = np.stack([leaves[j] for leaves in host_leaves])
            if g_padded > g:
                # Repeat the last element's (valid) values: padding rows may
                # not produce non-finite maps, they are discarded on scatter.
                arr = np.concatenate(
                    [arr, np.repeat(arr[-1:], g_padded - g, axis=0)]
                )
            stacked_leaves.append(jnp.asarray(arr))
        treedef = jax.tree_util.tree_structure(members[0])
        batched = jax.tree_util.tree_unflatten(treedef, stacked_leaves)
        # Normalise per-element statics (name, metadata) so the jitted
        # constructor's cache key only sees the group structure — otherwise
        # every run of every lattice retraces.
        object.__setattr__(batched, "name", "_batched")
        object.__setattr__(batched, "metadata", None)
        maps = _jitted_vmapped_transfer_map(batched, energy, species)
        blocks.append((idxs, g, maps))
    for i in singles:
        blocks.append(
            ([i], 1, elements[i].first_order_transfer_map(energy, species)[None])
        )

    # Scatter-assemble the ordered padded array: two dispatches per structure
    # group instead of one slice + one broadcast per element. Group padding
    # rows scatter out of bounds and are dropped; fold padding rows stay
    # identity.
    batch_shape = jnp.broadcast_shapes(*(m.shape[1:-2] for _, _, m in blocks))
    dtype = jnp.result_type(*(m.dtype for _, _, m in blocks))
    n_padded = _next_pow2(n)
    out = jnp.broadcast_to(
        jnp.eye(7, dtype=dtype), (n_padded, *batch_shape, 7, 7)
    )
    for idxs, g, maps in blocks:
        g_padded = maps.shape[0]
        scatter_idx = np.full(g_padded, n_padded, dtype=np.int32)
        scatter_idx[:g] = np.asarray(idxs, dtype=np.int32)
        maps = jnp.broadcast_to(
            maps.astype(dtype), (g_padded, *batch_shape, 7, 7)
        )
        out = out.at[jnp.asarray(scatter_idx)].set(maps, mode="drop")
    return out


@jax.jit
def _fold_transfer_maps(maps):
    """Ordered product ``M_{n-1} @ ... @ M_0`` of ``(n, *batch, 7, 7)`` maps
    as one compiled scan (shape-keyed jit cache)."""

    def step(tm, m):
        return m @ tm, None

    init = jnp.broadcast_to(
        jnp.eye(7, dtype=maps.dtype), maps.shape[1:]
    )
    total, _ = jax.lax.scan(step, init, maps)
    return total


@pytree_dataclass(init=False)
class CustomTransferMap(Element):
    """An element representing an arbitrary first-order transfer map.

    :param predefined_transfer_map: Transfer map of shape ``(..., 7, 7)``. The
        bottom row must be ``[0, 0, 0, 0, 0, 0, 1]``.
    :param length: Length of the element in m (0 if not given).
    :param name: Unique identifier of the element.
    """

    predefined_transfer_map: Array
    length: Array
    name: str = static_field(None)
    metadata: dict = static_field(None)

    def __init__(
        self,
        predefined_transfer_map: Array,
        length: Array | None = None,
        name: str | None = None,
        sanitize_name: bool | None = None,
        metadata: dict | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        tm = as_float_array(predefined_transfer_map, dtype=dtype)
        assert tm.shape[-2:] == (7, 7)
        if not isinstance(tm, jax.core.Tracer):
            assert bool(jnp.all(tm[..., -1, :-2] == 0.0)) and bool(
                jnp.all(tm[..., -1, -1] == 1.0)
            ), "The seventh row of the transfer map must be [0, 0, 0, 0, 0, 0, 1]."
        self.predefined_transfer_map = tm
        self.length = as_float_array(
            length if length is not None else 0.0, dtype=tm.dtype
        )
        self._init_element(name, sanitize_name, metadata)

    @classmethod
    def from_merging_elements(
        cls, elements: list[Element], incoming_beam: Beam
    ) -> "CustomTransferMap":
        """Fold the transfer maps of consecutive skippable elements into one
        (ref ``custom_transfer_map.py:60-109``).

        Every map is evaluated at the *incoming* beam energy: a skippable
        element's map is affine and cannot change the reference energy (the
        same invariant fused ``Segment.track`` relies on), so the reference's
        track-along-while-merging is equivalent here and skipped.

        Eager-mode cost matters for big-lattice surgery: elements sharing a
        structure (same class, static config, parameter shapes) have their
        maps built in ONE ``vmap`` call, and the ordered product runs as one
        jitted ``lax.scan`` — ~100x fewer dispatches than per-element eager
        map construction on a multi-thousand-element lattice.

        :param incoming_beam: Beam entering the segment.
        """
        assert all(element.is_skippable for element in elements), (
            "Combining the elements in a Segment that is not skippable will "
            "result in incorrect tracking results."
        )

        energy = jnp.asarray(incoming_beam.energy)
        if not elements:
            # Identity-element semantics for the empty merge, as the
            # pre-batched implementation had.
            tm = jnp.broadcast_to(
                jnp.eye(7, dtype=energy.dtype), (*energy.shape, 7, 7)
            )
            return cls(
                tm,
                length=jnp.zeros((), energy.dtype),
                name="combined_",
                sanitize_name=False,
            )
        species = incoming_beam.species
        maps = _run_transfer_maps(elements, energy, species)
        tm = _fold_transfer_maps(maps)

        combined_length = sum_element_lengths(
            [element.length for element in elements]
        )
        combined_name = "combined_" + "_".join(element.name for element in elements)
        return cls(tm, length=combined_length, name=combined_name, sanitize_name=False)

    def first_order_transfer_map(self, energy: Array, species: Species) -> Array:
        return self.predefined_transfer_map

    @property
    def is_skippable(self) -> bool:
        return True

    @property
    def defining_features(self) -> list[str]:
        return super().defining_features + ["length", "predefined_transfer_map"]
