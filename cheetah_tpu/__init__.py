"""cheetah-tpu: a TPU-native differentiable beam-dynamics framework.

A from-scratch JAX/XLA implementation with the capabilities of desy-ml/cheetah
(the reference implementation cited throughout the docstrings), designed
TPU-first: beams and lattice elements are pytrees, tracking compiles to fused
batched matmuls under ``jax.jit``, gradients/vmap/sharding come from JAX
transformations, and collective-effect kernels target XLA/Pallas.
"""

from cheetah_tpu.accelerator import (
    BPM,
    Aperture,
    Cavity,
    CombinedCorrector,
    CustomTransferMap,
    Dipole,
    Drift,
    Element,
    HorizontalCorrector,
    Marker,
    Quadrupole,
    RBend,
    Screen,
    Segment,
    Sextupole,
    Solenoid,
    SpaceChargeKick,
    Superimposed,
    TransverseDeflectingCavity,
    Undulator,
    VerticalCorrector,
)
from cheetah_tpu import converters, latticejson
from cheetah_tpu.ops import transfer_maps as track_methods
from cheetah_tpu.particles import Beam, ParameterBeam, ParticleBeam, Species
from cheetah_tpu.utils.warnings import (
    DefaultParameterWarning,
    DirtyNameWarning,
    NoBeamPropertiesInLatticeWarning,
    NotUnderstoodPropertyWarning,
    PhysicsWarning,
    UnknownElementWarning,
    VisualizationWarning,
)

# Make every element/beam pytree serializable through jax.export (the AOT
# deployment path). Subpackages imported later (e.g. cheetah_tpu.parallel)
# register their own classes at their import; older jax without the export
# registry is tolerated — anything else propagates.
from cheetah_tpu.utils.pytree import register_export_serialization

try:
    from jax import export as _jax_export
except ImportError:  # pragma: no cover - older jax without jax.export
    _jax_export = None

if _jax_export is not None and hasattr(
    _jax_export, "register_pytree_node_serialization"
):
    register_export_serialization()

# Guarded against pyproject.toml drift by tests/test_packaging.py.
__version__ = "0.5.0"

__all__ = [
    "Aperture",
    "BPM",
    "Beam",
    "converters",
    "DefaultParameterWarning",
    "DirtyNameWarning",
    "latticejson",
    "NoBeamPropertiesInLatticeWarning",
    "NotUnderstoodPropertyWarning",
    "PhysicsWarning",
    "track_methods",
    "UnknownElementWarning",
    "VisualizationWarning",
    "Cavity",
    "CombinedCorrector",
    "CustomTransferMap",
    "Dipole",
    "Drift",
    "Element",
    "HorizontalCorrector",
    "Marker",
    "ParameterBeam",
    "ParticleBeam",
    "Quadrupole",
    "RBend",
    "Screen",
    "Segment",
    "Sextupole",
    "Solenoid",
    "SpaceChargeKick",
    "Species",
    "Superimposed",
    "TransverseDeflectingCavity",
    "Undulator",
    "VerticalCorrector",
]
