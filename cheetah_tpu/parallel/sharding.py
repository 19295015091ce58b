"""Device-mesh sharding for beams and lattices.

The reference has no distributed layer (SURVEY §2.9: no torch.distributed /
NCCL anywhere); this module is the TPU-native first-class replacement. The
design follows the XLA SPMD recipe: build a ``jax.sharding.Mesh``, annotate
the *instance* axis (thousands of lattice settings in lockstep — the RL use
case) and/or the *particle* axis with ``NamedSharding``, and let XLA insert
the collectives under ``jit``:

- Instance-axis sharding is pure data parallelism; readout reductions
  (``mean`` over instances) become ``psum`` over ICI.
- Particle-axis sharding turns the CIC deposit's ``segment_sum`` into a
  cross-device grid all-reduce, and every beam statistic (weighted mean/std
  over particles) into a per-statistic ``psum`` — exactly the communication
  pattern the physics requires, derived by the compiler.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cheetah_tpu.particles import ParameterBeam, ParticleBeam


def make_mesh(
    axis_sizes: dict[str, int] | None = None, devices=None
) -> Mesh:
    """Build a device mesh.

    :param axis_sizes: Mapping of axis name to size, e.g.
        ``{"instances": 4, "particles": 2}``. Defaults to one
        ``"instances"`` axis over all devices.
    :param devices: Devices to use (defaults to all of ``jax.devices()``).
    """
    devices = list(devices if devices is not None else jax.devices())
    if axis_sizes is None:
        axis_sizes = {"instances": len(devices)}
    import numpy as np

    names = tuple(axis_sizes.keys())
    shape = tuple(axis_sizes.values())
    return Mesh(np.asarray(devices[: np.prod(shape)]).reshape(shape), names)


def beam_shardings(
    beam: ParticleBeam | ParameterBeam,
    mesh: Mesh,
    instance_axis: str | None = None,
    particle_axis: str | None = None,
) -> Any:
    """A pytree of ``NamedSharding``\\ s matching ``beam``'s structure.

    :param instance_axis: Mesh axis name over which to shard the *leading*
        vector dimension of every leaf (requires the beam to be vectorised).
    :param particle_axis: Mesh axis name over which to shard the particle
        dimension (``ParticleBeam`` only).
    """

    def leaf_spec(leaf: jnp.ndarray, trailing_dims: int) -> NamedSharding:
        # trailing_dims: number of trailing non-vector dims of this leaf;
        # the particle axis (if any) is the first trailing dim.
        spec = [None] * leaf.ndim
        if instance_axis is not None and leaf.ndim > trailing_dims:
            spec[0] = instance_axis
        if particle_axis is not None and trailing_dims >= 1:
            spec[leaf.ndim - trailing_dims] = particle_axis
        return NamedSharding(mesh, P(*spec))

    num_attr_dims = type(beam).UNVECTORIZED_NUM_ATTR_DIMS

    if isinstance(beam, ParticleBeam):
        dims = {
            "particles": num_attr_dims["particles"],
            "particle_charges": num_attr_dims["particle_charges"],
            "survival_probabilities": num_attr_dims["survival_probabilities"],
            "energy": 0,
            "s": 0,
        }
    else:
        dims = {"mu": 1, "cov": 2, "energy": 0, "total_charge": 0, "s": 0}
        assert particle_axis is None, "ParameterBeam has no particle axis."

    shardings = jax.tree_util.tree_map(lambda leaf: None, beam)
    for field, trailing in dims.items():
        leaf = getattr(beam, field)
        object.__setattr__(shardings, field, leaf_spec(jnp.asarray(leaf), trailing))
    # Species leaves are replicated.
    species_sharding = NamedSharding(mesh, P())
    object.__setattr__(
        shardings.species, "num_elementary_charges", species_sharding
    )
    object.__setattr__(shardings.species, "mass_eV", species_sharding)
    return shardings


def shard_beam(
    beam: ParticleBeam | ParameterBeam,
    mesh: Mesh,
    instance_axis: str | None = None,
    particle_axis: str | None = None,
) -> ParticleBeam | ParameterBeam:
    """Place a beam on the mesh with the requested axis shardings."""
    shardings = beam_shardings(beam, mesh, instance_axis, particle_axis)
    return jax.device_put(beam, shardings)


def shard_segment(segment, mesh: Mesh, instance_axis: str) -> Any:
    """Place a lattice on the mesh, sharding every *vectorised* element
    parameter (ndim >= 1) over the instance axis; scalars are replicated."""

    def leaf_sharding(leaf):
        leaf = jnp.asarray(leaf)
        if leaf.ndim >= 1 and leaf.shape[0] == mesh.shape[instance_axis]:
            return NamedSharding(mesh, P(instance_axis, *([None] * (leaf.ndim - 1))))
        return NamedSharding(mesh, P())

    shardings = jax.tree_util.tree_map(leaf_sharding, segment)
    return jax.device_put(segment, shardings)


def replicate(value: Any, mesh: Mesh) -> Any:
    """Replicate a pytree across the whole mesh."""
    return jax.device_put(
        value, jax.tree_util.tree_map(lambda _: NamedSharding(mesh, P()), value)
    )
