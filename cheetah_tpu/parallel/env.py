"""Vectorised lattice-tuning environments.

The reference's flagship ML workflow is reinforcement-learning magnet tuning
with thousands of lattice instances in lockstep (``README.md:18``, SURVEY
§2.9). This module packages that pattern TPU-natively: a batch of lattice
settings is a ``(num_instances, num_tunables)`` array sharded over the mesh's
data-parallel axis; one env step tracks the beam through the lattice with
per-instance settings, collects diagnostic readouts, and returns per-instance
observations/rewards — all inside one ``jit``, with XLA inserting the
cross-device collectives.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax
import jax.numpy as jnp
from jax import Array

from cheetah_tpu.accelerator import Segment
from cheetah_tpu.particles import Beam
from cheetah_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass(init=False)
class BatchedLatticeEnv:
    """A batch of lattice-tuning environments evaluated in lockstep.

    :param segment: Lattice to tune. Element topology is shared; the tuned
        parameters are set per instance.
    :param incoming: Beam entering the lattice (shared across instances).
    :param tunables: Sequence of ``(element_name, attribute)`` pairs, e.g.
        ``[("AREAMQZM1", "k1"), ("AREAMCHM1", "angle")]``.
    :param objective: Function ``(outgoing_beam, readings) -> (...,)`` reward
        per instance. Defaults to negative transverse beam size.
    :param moments_only: When ``True``, track with
        :meth:`Segment.track_moments` — the exact moments fast path (~40x
        cheaper than particle tracking on linear lattices, PERF_NOTES.md).
        The objective then receives a :class:`ParameterBeam` (same
        statistics surface) and ``readings`` is empty; use only when the
        reward is moment-based.
    """

    segment: Segment
    incoming: Beam
    tunables: tuple = static_field(())
    objective: Callable = static_field(None)
    moments_only: bool = static_field(False)

    def __init__(
        self,
        segment: Segment,
        incoming: Beam,
        tunables: Sequence[tuple[str, str]],
        objective: Callable | None = None,
        moments_only: bool = False,
    ) -> None:
        self.segment = segment
        self.incoming = incoming
        self.tunables = tuple((str(e), str(a)) for e, a in tunables)
        self.objective = objective
        self.moments_only = bool(moments_only)

    @property
    def num_tunables(self) -> int:
        return len(self.tunables)

    def _with_settings(self, settings: Array) -> Segment:
        """The segment with per-instance tunable values applied.

        ``settings`` has shape ``(..., num_tunables)``; leading dims become
        the vectorisation dims of the lattice parameters.
        """
        segment = jax.tree_util.tree_map(lambda leaf: leaf, self.segment)  # Copy
        for index, (element_name, attribute) in enumerate(self.tunables):
            element = getattr(segment, element_name)
            setattr(element, attribute, settings[..., index])
        return segment

    def step(self, settings: Array) -> tuple[Beam, dict[str, Array], Array]:
        """Evaluate one step: track with per-instance ``settings``.

        :return: ``(outgoing_beam, readings, reward)`` where reward has the
            settings' leading (instance) shape.
        """
        segment = self._with_settings(settings)
        if self.moments_only:
            outgoing, readings = segment.track_moments(self.incoming), {}
        else:
            outgoing, readings = segment.track_with_readings(self.incoming)
        if self.objective is not None:
            reward = self.objective(outgoing, readings)
        else:
            reward = -jnp.hypot(outgoing.sigma_x, outgoing.sigma_y)
        return outgoing, readings, reward

    def reward(self, settings: Array) -> Array:
        """Reward only (convenient for ``jax.grad``/``jax.vmap``)."""
        return self.step(settings)[2]

    def grad_step(
        self, settings: Array, learning_rate: float | Array
    ) -> tuple[Array, Array]:
        """One gradient-ascent update of all instances in lockstep.

        :return: ``(new_settings, reward)``.
        """
        def total_reward(settings):
            reward = self.reward(settings)
            return jnp.sum(reward), reward

        grads, reward = jax.grad(total_reward, has_aux=True)(settings)
        return settings + learning_rate * grads, reward
