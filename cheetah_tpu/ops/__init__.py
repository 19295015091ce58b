from cheetah_tpu.ops.transfer_maps import (
    base_rmatrix,
    base_ttensor,
    combined_rotation_misalignment_matrix,
    drift_matrix,
    misalignment_matrix,
    rotation_matrix,
)

__all__ = [
    "base_rmatrix",
    "base_ttensor",
    "combined_rotation_misalignment_matrix",
    "drift_matrix",
    "misalignment_matrix",
    "rotation_matrix",
]
