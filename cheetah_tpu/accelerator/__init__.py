from cheetah_tpu.accelerator.aperture import Aperture
from cheetah_tpu.accelerator.bpm import BPM
from cheetah_tpu.accelerator.cavity import Cavity
from cheetah_tpu.accelerator.correctors import (
    CombinedCorrector,
    HorizontalCorrector,
    VerticalCorrector,
)
from cheetah_tpu.accelerator.custom_transfer_map import CustomTransferMap
from cheetah_tpu.accelerator.dipole import Dipole
from cheetah_tpu.accelerator.drift import Drift
from cheetah_tpu.accelerator.element import Element
from cheetah_tpu.accelerator.marker import Marker
from cheetah_tpu.accelerator.quadrupole import Quadrupole
from cheetah_tpu.accelerator.rbend import RBend
from cheetah_tpu.accelerator.screen import Screen
from cheetah_tpu.accelerator.segment import Segment
from cheetah_tpu.accelerator.sextupole import Sextupole
from cheetah_tpu.accelerator.space_charge_kick import SpaceChargeKick
from cheetah_tpu.accelerator.solenoid import Solenoid
from cheetah_tpu.accelerator.superimposed import Superimposed
from cheetah_tpu.accelerator.transverse_deflecting_cavity import (
    TransverseDeflectingCavity,
)
from cheetah_tpu.accelerator.undulator import Undulator

__all__ = [
    "Aperture",
    "BPM",
    "Cavity",
    "CombinedCorrector",
    "CustomTransferMap",
    "Dipole",
    "Drift",
    "Element",
    "HorizontalCorrector",
    "Marker",
    "Quadrupole",
    "RBend",
    "Screen",
    "Segment",
    "Sextupole",
    "Solenoid",
    "SpaceChargeKick",
    "Superimposed",
    "TransverseDeflectingCavity",
    "Undulator",
    "VerticalCorrector",
]
