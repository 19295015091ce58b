"""Transfer-map caching (ref ``cheetah/utils/cache.py:6-68``).

The reference memoises per-element transfer maps keyed on tensor identity and
version, bypassed when gradients are required. Under JAX this machinery is
subsumed by ``jax.jit``: map construction happens once at trace time and XLA
constant-folds or fuses it; re-tracing only occurs when static configuration
changes. ``cache_transfer_map`` is therefore the identity decorator, kept so
reference-style code importing it keeps working.
"""

from __future__ import annotations

from typing import Callable, TypeVar

F = TypeVar("F", bound=Callable)


def cache_transfer_map(fn: F) -> F:
    """No-op decorator: ``jax.jit``'s trace cache plays this role."""
    return fn
