"""NX Tables converter (ref ``cheetah/converters/nxtables.py:9-263``).

ARES-specific (DESY) CSV format: class-code -> element with centre-s
placement; drifts are inferred between elements. The class-code dispatch is a
declarative table rather than an if/elif chain.
"""

from __future__ import annotations

import csv
from pathlib import Path

import jax.numpy as jnp

import cheetah_tpu

# Class codes with no Cheetah representation (vacuum hardware etc.).
IGNORE_CLASSES = {
    "RSBG", "MSOB", "MSOH", "MSOG", "VVAG", "BSCL", "MIRA", "BAML", "SCRL",
    "TEMG", "FCNG", "SOLE", "EOLE", "MSOL", "BELS", "VVAF", "MIRM", "SCRY",
    "FPSA", "VPUL", "SOLC", "SCRE", "SOLX", "ICTB", "BSCS",
}

# Class codes converted to markers (monitoring / bookkeeping hardware).
MARKER_CLASSES = {
    "SOLG", "BCMG", "EOLG", "SOLS", "EOLS", "SOLA", "EOLA", "SOLT", "BSTB",
    "TORF", "EOLT", "SOLO", "EOLO", "SOLB", "EOLB", "ECHA", "MKBB", "MKBE",
    "MKPM", "EOLC", "SOLM", "EOLM", "SOLH", "BSCD", "STDE", "ECHS", "EOLH",
    "WINA", "LINA", "EOLX",
}

_SCREEN_HIGH_RES = dict(resolution=(2464, 2056), pixel_size=(3.43e-6, 2.47e-6))
_SCREEN_STANDARD = dict(resolution=(2448, 2040), pixel_size=(3.5488e-6, 2.5003e-6))
_SCREEN_LOW_RES = dict(resolution=(2464, 2056), pixel_size=(9.98e-6, 7.15e-6))


def _screen(spec):
    def build(name):
        return cheetah_tpu.Screen(
            name=name,
            resolution=spec["resolution"],
            pixel_size=jnp.asarray(spec["pixel_size"]),
            binning=1,
        )

    return build


def _aperture(shape):
    def build(name):
        return cheetah_tpu.Aperture(
            name=name,
            x_max=jnp.asarray(float("inf")),
            y_max=jnp.asarray(float("inf")),
            shape=shape,
        )

    return build


CLASS_BUILDERS = {
    "BSCX": _screen(_SCREEN_HIGH_RES),
    "BSCR": _screen(_SCREEN_STANDARD),
    "BSCM": _screen(_SCREEN_STANDARD),
    "BSCO": _screen(_SCREEN_STANDARD),
    "BSCA": _screen(_SCREEN_STANDARD),
    "BSCE": _screen(_SCREEN_LOW_RES),
    "SCRD": _screen(_SCREEN_LOW_RES),
    "BPMG": lambda name: cheetah_tpu.BPM(name=name),
    "BPML": lambda name: cheetah_tpu.BPM(name=name),
    "SLHG": _aperture("elliptical"),
    "SLHB": _aperture("rectangular"),
    "SLHS": _aperture("rectangular"),
    "MCHM": lambda name: cheetah_tpu.HorizontalCorrector(
        name=name, length=jnp.asarray(0.02)
    ),
    "MCVM": lambda name: cheetah_tpu.VerticalCorrector(
        name=name, length=jnp.asarray(0.02)
    ),
    "MBHL": lambda name: cheetah_tpu.Dipole(name=name, length=jnp.asarray(0.322)),
    "MBHB": lambda name: cheetah_tpu.Dipole(name=name, length=jnp.asarray(0.22)),
    "MBHO": lambda name: cheetah_tpu.Dipole(
        name=name,
        length=jnp.asarray(0.43852543421396856),
        angle=jnp.asarray(0.8203047484373349),
        dipole_e2=jnp.asarray(-0.7504915783575616),
    ),
    "MQZM": lambda name: cheetah_tpu.Quadrupole(
        name=name, length=jnp.asarray(0.122)
    ),
    "RSBL": lambda name: cheetah_tpu.Cavity(
        name=name,
        length=jnp.asarray(4.139),
        frequency=jnp.asarray(2.998e9),
        voltage=jnp.asarray(76e6),
    ),
    "RXBD": lambda name: cheetah_tpu.Cavity(
        name=name,
        length=jnp.asarray(1.0),
        frequency=jnp.asarray(11.9952e9),
        voltage=jnp.asarray(0.0),
    ),
    "UNDA": lambda name: cheetah_tpu.Undulator(
        name=name, length=jnp.asarray(0.25)
    ),
}


def translate_element(row: list[str], header: list[str]) -> dict | None:
    """Translate one NX Tables row into an element with its centre-s position;
    ``None`` for hardware with no simulation meaning."""
    class_name = row[header.index("CLASS")]
    name = row[header.index("NAME")]
    s_position = float(row[header.index("Z_beam")])

    if class_name in IGNORE_CLASSES:
        return None
    elif class_name == "MCXG":
        # Combined corrector coil pair named ...X...: split into H and V coils.
        assert name[6] == "X"
        element = cheetah_tpu.Segment(
            elements=[
                cheetah_tpu.HorizontalCorrector(
                    name=name[:6] + "H" + name[7:], length=jnp.asarray(5e-05)
                ),
                cheetah_tpu.VerticalCorrector(
                    name=name[:6] + "V" + name[7:], length=jnp.asarray(5e-05)
                ),
            ],
            name=name,
        )
    elif class_name in CLASS_BUILDERS:
        element = CLASS_BUILDERS[class_name](name)
    elif class_name in MARKER_CLASSES:
        element = cheetah_tpu.Marker(name=name)
    else:
        raise ValueError(f"Encountered unknown class {class_name} for element {name}")

    return {"element": element, "s_position": s_position}


def convert_lattice(filepath: Path) -> "cheetah_tpu.Element":
    """Read an NX Tables CSV file into a cheetah_tpu ``Segment``."""
    with open(filepath, "r") as csvfile:
        rows = list(csv.reader(csvfile, delimiter=","))
    header, rows = rows[0], rows[1:]

    translated = [translate_element(row, header) for row in rows]
    placed = sorted(
        (entry for entry in translated if entry is not None),
        key=lambda entry: entry["s_position"],
    )

    # Fill the gaps between centre-placed elements with drifts.
    with_drifts = [placed[0]["element"]]
    for previous, current in zip(placed[:-1], placed[1:]):
        previous_length = float(jnp.max(jnp.asarray(previous["element"].length)))
        current_length = float(jnp.max(jnp.asarray(current["element"].length)))
        gap = (
            current["s_position"]
            - previous["s_position"]
            - previous_length / 2
            - current_length / 2
        )
        assert gap >= -1e-12, (
            f"Elements {previous['element'].name} and {current['element'].name} "
            f"overlap by {gap}."
        )
        if gap > 1e-12:
            with_drifts.append(
                cheetah_tpu.Drift(
                    name=(
                        f"DRIFT_{previous['element'].name}_"
                        f"{current['element'].name}"
                    ),
                    length=jnp.asarray([gap]),
                )
            )
        with_drifts.append(current["element"])

    segment = cheetah_tpu.Segment(elements=with_drifts, name=filepath.stem)
    # Conversion produces nested segments (e.g. MCXG pairs); flatten them.
    return segment.flattened()
