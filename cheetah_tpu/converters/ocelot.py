"""Ocelot lattice converter (ref ``cheetah/converters/ocelot.py:9-219``).

Dispatches on the Ocelot element's *class name* (duck typing) rather than
``isinstance``, so it works with any Ocelot-compatible objects without
requiring the ocelot package to be importable.
"""

from __future__ import annotations

import warnings

import jax.numpy as jnp

import cheetah_tpu
from cheetah_tpu.utils.warnings import DefaultParameterWarning, UnknownElementWarning


def convert_element(
    element,
    sanitize_name: bool | None = None,
    dtype: jnp.dtype | None = None,
) -> "cheetah_tpu.Element":
    """Translate an Ocelot element to a cheetah_tpu element.

    NOTE: Objects not supported are translated to drift sections. ``Monitor``
    objects become Screens when "BSC" appears in their id (with default,
    ARES-specific screen properties) and BPMs when "BPM" appears; otherwise
    Markers.
    """
    a = lambda value: jnp.asarray(value, dtype)  # noqa: E731
    class_names = [cls.__name__ for cls in type(element).__mro__]
    name = element.id

    if "Quadrupole" in class_names:
        return cheetah_tpu.Quadrupole(
            length=a(element.l), k1=a(element.k1), name=name,
            sanitize_name=sanitize_name,
        )
    elif "Sextupole" in class_names:
        return cheetah_tpu.Sextupole(
            length=a(element.l), k2=a(element.k2), name=name,
            sanitize_name=sanitize_name,
        )
    elif "Solenoid" in class_names:
        return cheetah_tpu.Solenoid(
            length=a(element.l), k=a(element.k), name=name,
            sanitize_name=sanitize_name,
        )
    elif "Hcor" in class_names:
        return cheetah_tpu.HorizontalCorrector(
            length=a(element.l), angle=a(element.angle), name=name,
            sanitize_name=sanitize_name,
        )
    elif "Vcor" in class_names:
        return cheetah_tpu.VerticalCorrector(
            length=a(element.l), angle=a(element.angle), name=name,
            sanitize_name=sanitize_name,
        )
    elif "RBend" in class_names:
        return cheetah_tpu.RBend(
            length=a(element.l),
            angle=a(element.angle),
            rbend_e1=a(element.e1) - element.angle / 2,
            rbend_e2=a(element.e2) - element.angle / 2,
            tilt=a(element.tilt),
            fringe_integral=a(element.fint),
            fringe_integral_exit=a(element.fintx),
            gap=a(element.gap),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif "SBend" in class_names or "Bend" in class_names:
        return cheetah_tpu.Dipole(
            length=a(element.l),
            angle=a(element.angle),
            dipole_e1=a(element.e1),
            dipole_e2=a(element.e2),
            tilt=a(element.tilt),
            fringe_integral=a(element.fint),
            fringe_integral_exit=a(element.fintx),
            gap=a(element.gap),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif "TWCavity" in class_names:
        return cheetah_tpu.Cavity(
            length=a(element.l),
            voltage=a(element.v * 1e9),
            frequency=a(element.freq),
            phase=a(element.phi),
            cavity_type="traveling_wave",
            name=name,
            sanitize_name=sanitize_name,
        )
    elif "TDCavity" in class_names or "Cavity" in class_names:
        # NOTE: TDCavity currently falls back to a standing-wave Cavity (as in
        # the reference, ``ocelot.py:144-153``).
        return cheetah_tpu.Cavity(
            length=a(element.l),
            voltage=a(element.v * 1e9),
            frequency=a(element.freq),
            phase=a(element.phi),
            cavity_type="standing_wave",
            name=name,
            sanitize_name=sanitize_name,
        )
    elif "Monitor" in class_names:
        if "BSC" in name:
            # NOTE: Pattern specific to ARES; screen properties are defaults.
            warnings.warn(
                "Diagnostic screen was converted with default screen properties.",
                category=DefaultParameterWarning,
                stacklevel=2,
            )
            return cheetah_tpu.Screen(
                resolution=(2448, 2040),
                pixel_size=a([3.5488e-6, 2.5003e-6]),
                name=name,
                sanitize_name=sanitize_name,
            )
        elif "BPM" in name:
            return cheetah_tpu.BPM(name=name, sanitize_name=sanitize_name)
        else:
            return cheetah_tpu.Marker(name=name, sanitize_name=sanitize_name)
    elif "Marker" in class_names:
        return cheetah_tpu.Marker(name=name, sanitize_name=sanitize_name)
    elif "Undulator" in class_names:
        return cheetah_tpu.Undulator(
            length=a(element.l),
            period=a(element.lperiod),
            kx=a(element.Kx),
            ky=a(element.Ky),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif "Aperture" in class_names:
        shape_translation = {"rect": "rectangular", "elip": "elliptical"}
        return cheetah_tpu.Aperture(
            x_max=a(element.xmax),
            y_max=a(element.ymax),
            shape=shape_translation[element.type],
            is_active=True,
            name=name,
            sanitize_name=sanitize_name,
        )
    elif "Drift" in class_names:
        return cheetah_tpu.Drift(
            length=a(element.l), name=name, sanitize_name=sanitize_name
        )
    else:
        warnings.warn(
            f"Unknown element {name} of type {type(element)}, replacing with "
            "drift section.",
            category=UnknownElementWarning,
            stacklevel=2,
        )
        return cheetah_tpu.Drift(
            length=a(element.l), name=name, sanitize_name=sanitize_name
        )


def subcell_of_ocelot(cell: list, start: str, end: str) -> list:
    """Extract a subcell ``[start, end]`` from an Ocelot cell."""
    subcell = []
    is_in_subcell = False
    for element in cell:
        if element.id == start:
            is_in_subcell = True
        if is_in_subcell:
            subcell.append(element)
        if element.id == end:
            break
    return subcell
