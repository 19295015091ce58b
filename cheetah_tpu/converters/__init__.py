from cheetah_tpu.converters import astra, bmad, elegant, nxtables, ocelot
from cheetah_tpu.converters.expressions import evaluate_infix, evaluate_rpn

__all__ = [
    "astra",
    "bmad",
    "elegant",
    "evaluate_infix",
    "evaluate_rpn",
    "nxtables",
    "ocelot",
]
