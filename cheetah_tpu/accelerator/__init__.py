from cheetah_tpu.accelerator.correctors import (
    CombinedCorrector,
    HorizontalCorrector,
    VerticalCorrector,
)
from cheetah_tpu.accelerator.custom_transfer_map import CustomTransferMap
from cheetah_tpu.accelerator.drift import Drift
from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.accelerator.marker import Marker
from cheetah_tpu.accelerator.quadrupole import Quadrupole
from cheetah_tpu.accelerator.segment import Segment

__all__ = [
    "CombinedCorrector",
    "CustomTransferMap",
    "Drift",
    "Element",
    "HorizontalCorrector",
    "Marker",
    "Quadrupole",
    "Segment",
    "VerticalCorrector",
]
