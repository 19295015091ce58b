"""PRNG key management.

JAX requires explicit PRNG keys. All stochastic constructors in this framework
accept a ``key`` argument; for reference-style ergonomics (global torch seed,
``cheetah tests/conftest.py:155-211``) a module-level key sequence provides
keys when none is passed. Call :func:`seed` for reproducibility.

In a multi-process run (``jax.process_count() > 1``) the sequence folds
``jax.process_index()`` into the seed, so hosts that rely on the default keys
(e.g. via :func:`cheetah_tpu.parallel.process_local_beam` without ``key=``)
draw *different* beams instead of silently identical "random" ones. The fold
is (re-)applied lazily at draw time, so seeding *before*
``jax.distributed.initialize()`` still yields per-host streams afterwards.
Pass an explicit ``key`` for draws that must match across hosts.
"""

from __future__ import annotations

import jax
from jax import Array

_state: dict = {"seed": None, "key": None, "folded_count": None}


def seed(value: int) -> None:
    """Seed the global key sequence.

    In multi-process runs the seed is folded with ``jax.process_index()``:
    same ``value`` on every host, different per-host streams. The fold
    happens at draw time (see :func:`next_key`), so the order of ``seed()``
    vs ``jax.distributed.initialize()`` does not matter.
    """
    _state["seed"] = value
    _state["key"] = None
    _state["folded_count"] = None


def next_key() -> Array:
    """Return a fresh key from the global sequence (seeding with 0 if unset).

    The key chain is (re-)derived from the stored seed whenever
    ``jax.process_count()`` has changed since the last derivation — e.g. when
    ``jax.distributed.initialize()`` ran *after* :func:`seed` — so multi-host
    default-key draws are per-host regardless of initialisation order.
    (Re-derivation restarts the stream; keys drawn before initialisation were
    shared across hosts, keys drawn after are not.)
    """
    if _state["seed"] is None:
        _state["seed"] = 0
    process_count = jax.process_count()
    if _state["key"] is None or _state["folded_count"] != process_count:
        key = jax.random.PRNGKey(_state["seed"])
        if process_count > 1:
            key = jax.random.fold_in(key, jax.process_index())
        _state["key"] = key
        _state["folded_count"] = process_count
    _state["key"], sub = jax.random.split(_state["key"])
    return sub


def ensure_key(key: Array | None) -> Array:
    """Return ``key`` if given, else draw from the global sequence."""
    return key if key is not None else next_key()
