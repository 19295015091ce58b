"""Batched linspace between two arrays (ref ``cheetah/utils/elementwise_linspace.py``)."""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def elementwise_linspace(start: Array, end: Array, steps: int) -> Array:
    """Linspace along a new trailing axis between broadcastable endpoints.

    :param start: Start values of shape ``(...)``.
    :param end: End values of shape ``(...)``.
    :param steps: Number of samples.
    :return: Array of shape ``(..., steps)``.
    """
    start, end = jnp.broadcast_arrays(jnp.asarray(start), jnp.asarray(end))
    t = jnp.linspace(0.0, 1.0, steps, dtype=start.dtype)
    return start[..., None] + (end - start)[..., None] * t
