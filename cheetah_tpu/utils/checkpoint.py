"""Checkpointing of beams, lattices and arbitrary pytrees.

The reference persists state through ``nn.Module.state_dict()`` (SURVEY §5.4);
the pytree-native equivalent serialises any cheetah-tpu object (all leaves are
arrays, all aux data reconstructs the classes) to a single ``.npz`` file.
For large-scale training state prefer `orbax.checkpoint`; this module covers
the reference's model-persistence scope without extra dependencies.
"""

from __future__ import annotations

import json
from typing import Any

import jax
import numpy as np


def state_dict(obj: Any) -> dict[str, np.ndarray]:
    """Flatten a pytree into a ``{path: array}`` dict (the analogue of
    ``nn.Module.state_dict()``)."""
    flat, _ = jax.tree_util.tree_flatten_with_path(obj)
    return {
        jax.tree_util.keystr(path): np.asarray(leaf) for path, leaf in flat
    }


def load_state_dict(obj: Any, state: dict[str, np.ndarray]) -> Any:
    """Return a copy of ``obj`` with leaves replaced from ``state`` (keyed by
    pytree path). Missing keys keep the current value."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(obj)
    leaves = [
        state.get(jax.tree_util.keystr(path), leaf) for path, leaf in flat
    ]
    import jax.numpy as jnp

    return jax.tree_util.tree_unflatten(
        treedef, [jnp.asarray(leaf) for leaf in leaves]
    )


def save(obj: Any, path: str) -> None:
    """Save a pytree's arrays (and leaf paths) to an ``.npz`` file."""
    state = state_dict(obj)
    np.savez(
        path,
        __paths__=json.dumps(list(state.keys())),
        **{f"leaf_{i}": value for i, value in enumerate(state.values())},
    )


def load(obj: Any, path: str) -> Any:
    """Restore a pytree saved with :func:`save` into a template object with
    the same structure."""
    with np.load(path, allow_pickle=False) as data:
        paths = json.loads(str(data["__paths__"]))
        state = {p: data[f"leaf_{i}"] for i, p in enumerate(paths)}
    return load_state_dict(obj, state)


# ---------------------------------------------------------------------------
# Sharded (multi-host) checkpointing via orbax.
#
# The npz path above gathers every leaf to the host — fine for the
# reference's model-persistence scope, wrong for production state sharded
# over a Mesh (it would all-gather the particle array through one host).
# orbax writes each process's shards in parallel and restores arrays
# *directly into their shardings* — no host gather in either direction.
# ---------------------------------------------------------------------------


def save_sharded(obj: Any, path: str, overwrite: bool = False) -> None:
    """Save a pytree (beams, segments, optimiser state, ...) with
    ``orbax.checkpoint``, preserving device shardings.

    Safe for multi-host meshes: every process participates (call it on all
    hosts) and writes only its own shards. ``path`` is created as a
    checkpoint directory; it must not exist unless ``overwrite=True``.
    """
    import pathlib

    ocp = _require_orbax()
    with ocp.StandardCheckpointer() as checkpointer:
        checkpointer.save(pathlib.Path(path).resolve(), obj, force=overwrite)
        checkpointer.wait_until_finished()


def load_sharded(template: Any, path: str) -> Any:
    """Restore a :func:`save_sharded` checkpoint into ``template``'s
    structure, placing every leaf onto the sharding it carries in
    ``template`` (a committed ``jax.Array``'s sharding is reused; plain
    values restore as host arrays). The class instances themselves are
    rebuilt from the template's pytree structure, so static configuration
    (names, grid shapes) comes from the template, arrays from disk."""
    import pathlib

    import jax.numpy as jnp

    ocp = _require_orbax()

    def abstract(leaf):
        sharding = leaf.sharding if isinstance(leaf, jax.Array) else None
        return jax.ShapeDtypeStruct(
            jnp.shape(leaf), jnp.asarray(leaf).dtype, sharding=sharding
        )

    with ocp.StandardCheckpointer() as checkpointer:
        return checkpointer.restore(
            pathlib.Path(path).resolve(),
            jax.tree_util.tree_map(abstract, template),
        )


def _require_orbax():
    try:
        import orbax.checkpoint as ocp
    except ImportError as error:  # pragma: no cover - env always has orbax
        raise ImportError(
            "Sharded checkpointing needs orbax-checkpoint — install the "
            "'distributed' extra: pip install cheetah-tpu[distributed]"
        ) from error
    return ocp
