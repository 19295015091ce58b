"""PRNG key management.

JAX requires explicit PRNG keys. All stochastic constructors in this framework
accept a ``key`` argument; for reference-style ergonomics (global torch seed,
``cheetah tests/conftest.py:155-211``) a module-level key sequence provides
keys when none is passed. Call :func:`seed` for reproducibility.

In a multi-process run (``jax.process_count() > 1``) the sequence folds
``jax.process_index()`` into the seed, so hosts that rely on the default keys
(e.g. via :func:`cheetah_tpu.parallel.process_local_beam` without ``key=``)
draw *different* beams instead of silently identical "random" ones. Pass an
explicit ``key`` for draws that must match across hosts.
"""

from __future__ import annotations

import jax
from jax import Array

_state: dict = {"key": None}


def seed(value: int) -> None:
    """Seed the global key sequence.

    In multi-process runs the seed is folded with ``jax.process_index()``:
    same ``value`` on every host, different per-host streams.
    """
    key = jax.random.PRNGKey(value)
    if jax.process_count() > 1:
        key = jax.random.fold_in(key, jax.process_index())
    _state["key"] = key


def next_key() -> Array:
    """Return a fresh key from the global sequence (seeding with 0 if unset)."""
    if _state["key"] is None:
        seed(0)
    _state["key"], sub = jax.random.split(_state["key"])
    return sub


def ensure_key(key: Array | None) -> Array:
    """Return ``key`` if given, else draw from the global sequence."""
    return key if key is not None else next_key()
