"""Bmad lattice import (ref ``cheetah/converters/bmad.py:17-349``).

Table-driven element dispatch over the shared lattice-file engine.
"""

from __future__ import annotations

import math
import os
import warnings
from pathlib import Path

import jax.numpy as jnp

import cheetah_tpu
from cheetah_tpu.converters.lattice_files import (
    merge_delimiter_continued_lines,
    parse_lines,
    read_clean_lines,
    validate_understood_properties,
)
from cheetah_tpu.utils.warnings import UnknownElementWarning

SHARED_PROPERTIES = ["element_type", "alias", "type"]


def _drift_or_marker(name, parsed, dtype, sanitize_name):
    """Monitors/instruments: drift if they have a length, else marker."""
    if "l" in parsed:
        return cheetah_tpu.Drift(
            length=jnp.asarray(parsed["l"], dtype),
            name=name,
            sanitize_name=sanitize_name,
        )
    return cheetah_tpu.Marker(name=name, sanitize_name=sanitize_name)


def _collimator(shape):
    def build(name, parsed, dtype, sanitize_name):
        return cheetah_tpu.Segment(
            elements=[
                cheetah_tpu.Drift(
                    length=jnp.asarray(parsed.get("l", 0.0), dtype),
                    name=name + "_drift",
                    sanitize_name=sanitize_name,
                ),
                cheetah_tpu.Aperture(
                    x_max=jnp.asarray(parsed.get("x_limit", math.inf), dtype),
                    y_max=jnp.asarray(parsed.get("y_limit", math.inf), dtype),
                    shape=shape,
                    name=name + "_aperture",
                    sanitize_name=sanitize_name,
                ),
            ],
            name=name,
            sanitize_name=sanitize_name,
        )

    return build


def _convert_typed_element(name, parsed, dtype, sanitize_name):
    """Dispatch a parsed Bmad element dict to a cheetah_tpu element."""
    element_type = parsed["element_type"]
    asarr = lambda key, default=0.0: jnp.asarray(  # noqa: E731
        parsed.get(key, default), dtype
    )

    if element_type == "marker":
        validate_understood_properties(SHARED_PROPERTIES, parsed)
        return cheetah_tpu.Marker(name=name, sanitize_name=sanitize_name)
    elif element_type in ("monitor", "instrument"):
        validate_understood_properties(SHARED_PROPERTIES + ["l"], parsed)
        return _drift_or_marker(name, parsed, dtype, sanitize_name)
    elif element_type in ("pipe", "drift", "patch"):
        validate_understood_properties(SHARED_PROPERTIES + ["l", "descrip"], parsed)
        return cheetah_tpu.Drift(
            length=asarr("l"), name=name, sanitize_name=sanitize_name
        )
    elif element_type == "hkicker":
        validate_understood_properties(SHARED_PROPERTIES + ["kick"], parsed)
        return cheetah_tpu.HorizontalCorrector(
            length=asarr("l"), angle=asarr("kick"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "vkicker":
        validate_understood_properties(SHARED_PROPERTIES + ["kick"], parsed)
        return cheetah_tpu.VerticalCorrector(
            length=asarr("l"), angle=asarr("kick"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "sbend":
        validate_understood_properties(
            SHARED_PROPERTIES
            + ["hgap", "l", "angle", "e1", "e2", "fint", "fintx", "ref_tilt"],
            parsed,
        )
        return cheetah_tpu.Dipole(
            length=asarr("l"),
            gap=jnp.asarray(2 * parsed.get("hgap", 0.0), dtype),
            angle=asarr("angle"),
            dipole_e1=asarr("e1"),
            dipole_e2=asarr("e2"),
            tilt=asarr("ref_tilt"),
            fringe_integral=asarr("fint"),
            fringe_integral_exit=(
                jnp.asarray(parsed["fintx"], dtype) if "fintx" in parsed else None
            ),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "quadrupole":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "k1", "tilt"], parsed
        )
        return cheetah_tpu.Quadrupole(
            length=asarr("l"), k1=asarr("k1"), tilt=asarr("tilt"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "sextupole":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "k2", "tilt"], parsed
        )
        return cheetah_tpu.Sextupole(
            length=asarr("l"), k2=asarr("k2"), tilt=asarr("tilt"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "solenoid":
        validate_understood_properties(SHARED_PROPERTIES + ["l", "ks"], parsed)
        return cheetah_tpu.Solenoid(
            length=asarr("l"), k=asarr("ks"), name=name, sanitize_name=sanitize_name
        )
    elif element_type == "lcavity":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "rf_frequency", "voltage", "phi0"], parsed
        )
        return cheetah_tpu.Cavity(
            length=asarr("l"),
            voltage=asarr("voltage"),
            phase=jnp.rad2deg(
                -jnp.asarray(parsed.get("phi0", 0.0), dtype) * 2 * jnp.pi
            ),
            frequency=jnp.asarray(parsed["rf_frequency"], dtype),
            cavity_type=parsed.get("cavity_type", "standing_wave"),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "rcollimator":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "x_limit", "y_limit"], parsed
        )
        return _collimator("rectangular")(name, parsed, dtype, sanitize_name)
    elif element_type == "ecollimator":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "x_limit", "y_limit"], parsed
        )
        return _collimator("elliptical")(name, parsed, dtype, sanitize_name)
    elif element_type == "wiggler":
        validate_understood_properties(SHARED_PROPERTIES + ["l", "l_period"], parsed)
        return cheetah_tpu.Undulator(
            length=asarr("l"),
            period=jnp.asarray(parsed["l_period"], dtype),
            name=name,
            sanitize_name=sanitize_name,
        )
    else:
        warnings.warn(
            f"Element {name} of type {element_type} cannot be converted "
            "correctly. Using drift section instead.",
            category=UnknownElementWarning,
            stacklevel=2,
        )
        return cheetah_tpu.Drift(
            length=asarr("l"), name=name, sanitize_name=sanitize_name
        )


def convert_element(
    name: str,
    context: dict,
    sanitize_name: bool | None = None,
    dtype: jnp.dtype | None = None,
) -> "cheetah_tpu.Element":
    """Convert a parsed Bmad element or line to a cheetah_tpu element."""
    parsed = context[name]
    if isinstance(parsed, list):
        return cheetah_tpu.Segment(
            elements=[
                convert_element(element_name, context, sanitize_name, dtype)
                for element_name in parsed
            ],
            name=name,
            sanitize_name=sanitize_name,
        )
    elif isinstance(parsed, dict) and "element_type" in parsed:
        return _convert_typed_element(name, parsed, dtype, sanitize_name)
    else:
        raise ValueError(f"Unknown Bmad element type for name = {name!r}")


def convert_lattice(
    bmad_lattice_file_path: Path,
    environment_variables: dict | None = None,
    sanitize_names: bool | None = None,
    dtype: jnp.dtype | None = None,
) -> "cheetah_tpu.Element":
    """Convert a Bmad lattice file to a cheetah_tpu ``Segment``
    (ref ``bmad.py:280-349``)."""
    if environment_variables is not None:
        for key, value in environment_variables.items():
            os.environ[key] = value

    resolved = Path(
        *[
            os.environ[part[1:]] if part.startswith("$") else part
            for part in Path(bmad_lattice_file_path).parts
        ]
    )

    lines = read_clean_lines(resolved)
    merged = merge_delimiter_continued_lines(lines, "&", remove_delimiter=True)
    merged = merge_delimiter_continued_lines(merged, ",", remove_delimiter=False)
    merged = merge_delimiter_continued_lines(merged, "{", remove_delimiter=False)
    context = parse_lines(merged)

    return convert_element(context["__use__"], context, sanitize_names, dtype)
