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
# deployment path). Older jax without the export registry is tolerated.
try:
    from cheetah_tpu.utils.pytree import register_export_serialization

    register_export_serialization()
except (ImportError, AttributeError):  # pragma: no cover
    pass

# Guarded against pyproject.toml drift by tests/test_packaging.py.
__version__ = "0.3.0"

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
