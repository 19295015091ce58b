"""Ahead-of-time export helpers (the deployment path; see
``docs/examples/deployment.md``).

``jax.export`` serialises a compiled tracking computation to a StableHLO
artifact. These helpers build the *abstract* (shape/dtype only) arguments
for shape-polymorphic exports, so ONE artifact serves any particle count.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


def abstract_like(tree: Any) -> Any:
    """ShapeDtypeStruct pytree mirroring ``tree`` exactly (static export)."""
    return jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), jnp.asarray(x).dtype), tree
    )


def symbolic_particle_beam(beam: Any, dim: str = "n") -> Any:
    """ShapeDtypeStruct pytree of ``beam`` with the particle axis symbolic.

    Pass to ``jax.export.export(step)(segment_abstract, symbolic_beam)`` to
    get one artifact that serves ANY particle count:

    .. code-block:: python

        from jax import export
        from cheetah_tpu.utils import aot

        exported = export.export(step)(
            aot.abstract_like(segment), aot.symbolic_particle_beam(beam)
        )
        exported.serialize()  # -> one artifact, any N at call time

    Every leaf axis whose size equals ``beam.num_particles`` is replaced by
    the symbolic dimension ``dim`` (particles, per-particle charges,
    survival probabilities). A leaf in which MORE than one axis matches is
    ambiguous (e.g. ``num_particles == 7`` colliding with the coordinate
    axis, or a batch dimension equal to the particle count) and raises —
    export from a beam whose particle count is unambiguous instead.

    :param beam: A ``ParticleBeam`` (or any pytree carrying a
        ``num_particles`` attribute).
    :param dim: Name of the symbolic dimension.
    """
    from jax import export as jax_export

    (sym,) = jax_export.symbolic_shape(dim)
    num_particles = int(beam.num_particles)

    def symbolize(x):
        x = jnp.asarray(x)
        if sum(axis_size == num_particles for axis_size in x.shape) > 1:
            raise ValueError(
                f"ambiguous particle axis: leaf shape {x.shape} has more "
                f"than one axis of size num_particles={num_particles} — "
                "export from a beam whose particle count differs from its "
                "other dimensions (coordinate axis 7, batch sizes)"
            )
        shape = tuple(
            sym if axis_size == num_particles else axis_size
            for axis_size in x.shape
        )
        return jax.ShapeDtypeStruct(shape, x.dtype)

    return jax.tree_util.tree_map(symbolize, beam)
