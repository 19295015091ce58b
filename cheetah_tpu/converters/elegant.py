"""Elegant lattice and beam import (ref ``cheetah/converters/elegant.py:19-567``)."""

from __future__ import annotations

import math
import warnings
from pathlib import Path

import jax.numpy as jnp
import numpy as np
from jax import Array

import cheetah_tpu
from cheetah_tpu.constants import electron_mass_eV, speed_of_light
from cheetah_tpu.converters.lattice_files import (
    merge_delimiter_continued_lines,
    parse_lines,
    read_clean_lines,
    validate_understood_properties,
)
from cheetah_tpu.utils.warnings import (
    NoBeamPropertiesInLatticeWarning,
    UnknownElementWarning,
)

SHARED_PROPERTIES = ["element_type", "group"]


def _drift_with_aperture(shape):
    def build(name, parsed, dtype, sanitize_name):
        return cheetah_tpu.Segment(
            elements=[
                cheetah_tpu.Drift(
                    length=jnp.asarray(parsed.get("l", 0.0), dtype),
                    name=name + "_drift",
                    sanitize_name=sanitize_name,
                ),
                cheetah_tpu.Aperture(
                    x_max=jnp.asarray(parsed.get("x_max", math.inf), dtype),
                    y_max=jnp.asarray(parsed.get("y_max", math.inf), dtype),
                    shape=shape,
                    name=name + "_aperture",
                    sanitize_name=sanitize_name,
                ),
            ],
            name=name + "_segment",
            sanitize_name=sanitize_name,
        )

    return build


def _convert_typed_element(name, parsed, dtype, sanitize_name):
    element_type = parsed["element_type"]
    asarr = lambda key, default=0.0: jnp.asarray(  # noqa: E731
        parsed.get(key, default), dtype
    )

    if element_type == "sole":
        validate_understood_properties(SHARED_PROPERTIES + ["l"], parsed)
        return cheetah_tpu.Solenoid(
            length=asarr("l"), name=name, sanitize_name=sanitize_name
        )
    elif element_type in ("hkick", "hkic"):
        validate_understood_properties(SHARED_PROPERTIES + ["l", "kick"], parsed)
        return cheetah_tpu.HorizontalCorrector(
            length=asarr("l"), angle=asarr("kick"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("vkick", "vkic"):
        validate_understood_properties(SHARED_PROPERTIES + ["l", "kick"], parsed)
        return cheetah_tpu.VerticalCorrector(
            length=asarr("l"), angle=asarr("kick"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("kick", "kicker"):
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "hkick", "vkick"], parsed
        )
        return cheetah_tpu.CombinedCorrector(
            length=asarr("l"),
            horizontal_angle=asarr("hkick"),
            vertical_angle=asarr("vkick"),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("mark", "marker", "watch"):
        if element_type == "watch":
            validate_understood_properties(
                SHARED_PROPERTIES + ["filename"], parsed
            )
        else:
            validate_understood_properties(SHARED_PROPERTIES, parsed)
        return cheetah_tpu.Marker(name=name, sanitize_name=sanitize_name)
    elif element_type in ("drift", "drif", "csrdrift", "csrdrif", "lscdrift",
                          "lscdrif"):
        # CSR/LSC drifts are plain drifts (collective effects not imported).
        validate_understood_properties(SHARED_PROPERTIES + ["l"], parsed)
        return cheetah_tpu.Drift(
            length=asarr("l"), name=name, sanitize_name=sanitize_name
        )
    elif element_type == "ecol":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "x_max", "y_max"], parsed
        )
        return _drift_with_aperture("elliptical")(name, parsed, dtype, sanitize_name)
    elif element_type == "rcol":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "x_max", "y_max"], parsed
        )
        return _drift_with_aperture("rectangular")(name, parsed, dtype, sanitize_name)
    elif element_type in ("quad", "quadrupole", "kquad"):
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "k1", "tilt"], parsed
        )
        return cheetah_tpu.Quadrupole(
            length=asarr("l"), k1=asarr("k1"), tilt=asarr("tilt"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("sext", "sextupole"):
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "k2", "tilt"], parsed
        )
        return cheetah_tpu.Sextupole(
            length=asarr("l"), k2=asarr("k2"), tilt=asarr("tilt"), name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "moni":
        validate_understood_properties(SHARED_PROPERTIES + ["l"], parsed)
        if "l" in parsed:
            half = jnp.asarray(parsed.get("l", 0.0) / 2, dtype)
            return cheetah_tpu.Segment(
                elements=[
                    cheetah_tpu.Drift(
                        length=half, name=name + "_predrift",
                        sanitize_name=sanitize_name,
                    ),
                    cheetah_tpu.BPM(name=name, sanitize_name=sanitize_name),
                    cheetah_tpu.Drift(
                        length=half, name=name + "_postdrift",
                        sanitize_name=sanitize_name,
                    ),
                ],
                name=name + "_segment",
                sanitize_name=sanitize_name,
            )
        return cheetah_tpu.BPM(name=name, sanitize_name=sanitize_name)
    elif element_type == "ematrix":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "order", "c[1-6]", "r[1-6][1-6]"], parsed
        )
        if parsed.get("order", 1) != 1:
            raise ValueError("Only first order modelling is supported")

        # Elegant initialises the matrix to zero by convention.
        R = np.zeros((7, 7))
        for i in range(6):
            for j in range(6):
                R[i, j] = parsed.get(f"r{i + 1}{j + 1}", 0.0)
            R[i, 6] = parsed.get(f"c{i + 1}", 0.0)
        R[6, 6] = 1.0
        return cheetah_tpu.CustomTransferMap(
            length=asarr("l"),
            predefined_transfer_map=jnp.asarray(R, dtype),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("rfca", "rfcw"):
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "phase", "volt", "freq"], parsed
        )
        return cheetah_tpu.Cavity(
            length=asarr("l"),
            # Elegant's phase of maximum acceleration is 90 deg, cheetah's 0.
            phase=jnp.asarray(parsed.get("phase", 0.0) - 90, dtype),
            voltage=asarr("volt"),
            frequency=asarr("freq", 500e6),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "rfdf":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "phase", "voltage", "freq"], parsed
        )
        return cheetah_tpu.TransverseDeflectingCavity(
            length=asarr("l"),
            phase=jnp.asarray(parsed.get("phase", 0.0) - 90, dtype),
            voltage=asarr("voltage"),
            frequency=asarr("freq", 2.856e9),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("sben", "csbend", "csrcsben", "csrcsbend"):
        validate_understood_properties(
            SHARED_PROPERTIES
            + ["l", "angle", "k1", "e1", "e2", "tilt", "hgap", "fint"],
            parsed,
        )
        return cheetah_tpu.Dipole(
            length=asarr("l"),
            angle=asarr("angle"),
            k1=asarr("k1"),
            dipole_e1=asarr("e1"),
            dipole_e2=asarr("e2"),
            tilt=asarr("tilt"),
            gap=jnp.asarray(2.0 * parsed.get("hgap", 0.0), dtype),
            fringe_integral=asarr("fint", 0.5),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "rben":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "angle", "e1", "e2", "tilt"], parsed
        )
        return cheetah_tpu.RBend(
            length=asarr("l"),
            angle=asarr("angle"),
            rbend_e1=asarr("e1"),
            rbend_e2=asarr("e2"),
            tilt=asarr("tilt"),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type == "wiggler":
        validate_understood_properties(
            SHARED_PROPERTIES + ["l", "k", "poles"], parsed
        )
        length = parsed.get("l", 0.0)
        period = 2.0 * length / parsed["poles"] if "poles" in parsed else 0.0
        return cheetah_tpu.Undulator(
            length=jnp.asarray(length, dtype),
            period=jnp.asarray(period, dtype),
            kx=asarr("k"),
            name=name,
            sanitize_name=sanitize_name,
        )
    elif element_type in ("charge", "wake"):
        warnings.warn(
            f"Information provided in element {name} of type {element_type} "
            "cannot be imported automatically. Consider manually providing the "
            "correct information.",
            category=NoBeamPropertiesInLatticeWarning,
            stacklevel=2,
        )
        return cheetah_tpu.Marker(name=name, sanitize_name=sanitize_name)
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
    """Convert a parsed Elegant element or line (``-name`` reverses a line)."""
    is_reversed = name.startswith("-")
    name = name.removeprefix("-")
    parsed = context[name]

    if isinstance(parsed, list):
        segment = cheetah_tpu.Segment(
            elements=[
                convert_element(element_name, context, sanitize_name, dtype)
                for element_name in parsed
            ],
            name=name,
            sanitize_name=sanitize_name,
        )
        return segment.reversed() if is_reversed else segment
    elif isinstance(parsed, dict) and "element_type" in parsed:
        return _convert_typed_element(name, parsed, dtype, sanitize_name)
    else:
        raise ValueError(f"Unknown Elegant element type for name = {name!r}")


def convert_lattice(
    elegant_lattice_file_path: Path,
    name: str,
    sanitize_names: bool | None = None,
    dtype: jnp.dtype | None = None,
) -> "cheetah_tpu.Element":
    """Convert an Elegant lattice file to a cheetah_tpu ``Segment``
    (ref ``elegant.py:403-448``)."""
    lines = read_clean_lines(Path(elegant_lattice_file_path))
    merged = merge_delimiter_continued_lines(lines, "&", remove_delimiter=True)
    merged = merge_delimiter_continued_lines(merged, ",", remove_delimiter=False)
    merged = merge_delimiter_continued_lines(merged, "{", remove_delimiter=False)
    context = parse_lines(merged)
    return convert_element(name, context, sanitize_names, dtype)


def convert_beam(
    file_path: Path, dtype: jnp.dtype | None = None
) -> tuple[Array, Array, Array]:
    """Read a beam distribution from an Elegant SDDS file
    (ref ``elegant.py:451-520``).

    Uses the ``sdds`` package if installed, otherwise falls back to the
    built-in ASCII SDDS reader.

    :return: ``(particles (..., N, 7), reference energy in eV, charges)``.
    """
    try:
        import sdds

        sdds_data = sdds.load(str(file_path))
        column_names = sdds_data.columnName
        column_data = sdds_data.columnData
        p_central_values = (
            sdds_data.getParameterValueList("pCentral")
            if "pCentral" in sdds_data.parameterName
            else None
        )
        charge_columns = (
            sdds_data.getColumnValueLists("q") if "q" in column_names else None
        )
    except ImportError:
        column_names, column_data, parameters = _read_ascii_sdds(file_path)
        p_central_values = parameters.get("pcentral")
        charge_columns = (
            column_data[column_names.index("q")] if "q" in column_names else None
        )

    is_elegant = column_names[:6] == ["x", "xp", "y", "yp", "t", "p"]
    is_spiffe = column_names[:6] == ["r", "pz", "pr", "pphi", "t", "q"]
    if is_spiffe:
        raise ValueError(
            "The beam distribution is stored in the spiffe format, which is not "
            "currently supported. Use spiffe2elegant to convert the beam first."
        )
    elif not is_elegant:
        raise ValueError(
            "The first six columns of the SDDS file do not match the expected "
            "Elegant beam convention."
        )

    # (6, num_pages, num_particles) -> (num_pages, num_particles, 6)
    elegant_coordinates = jnp.moveaxis(
        jnp.asarray(np.asarray(column_data[:6], dtype=float), dtype), 0, -1
    )
    p_central = (
        jnp.asarray(np.asarray(p_central_values, dtype=float), dtype)
        if p_central_values is not None
        else elegant_coordinates[..., 0, 5]
    )
    reference_momentum_eV = p_central * electron_mass_eV
    reference_energy_eV = jnp.sqrt(
        reference_momentum_eV**2 + electron_mass_eV**2
    )

    cheetah_coordinates = elegant_to_cheetah_coordinates(
        elegant_coordinates, p_central
    )
    particle_charges = (
        jnp.asarray(np.asarray(charge_columns, dtype=float), dtype)
        if charge_columns is not None
        else jnp.ones(cheetah_coordinates.shape[:-1], dtype)
    )
    return cheetah_coordinates, reference_energy_eV, particle_charges


def _read_ascii_sdds(file_path: Path) -> tuple[list[str], list, dict]:
    """Minimal self-contained reader for ASCII-mode SDDS files.

    :return: ``(column_names, column_data (cols, pages, rows), parameters)``.
    """
    import re

    with open(file_path) as f:
        text = f.read()
    lines = [line for line in text.splitlines()]
    assert lines and lines[0].startswith("SDDS"), "Not an SDDS file."

    column_names: list[str] = []
    parameter_names: list[str] = []
    mode = "ascii"
    body_start = None
    i = 1
    while i < len(lines):
        line = lines[i].strip()
        if line.startswith("&column"):
            match = re.search(r"name\s*=\s*([\w\.]+)", line)
            column_names.append(match.group(1).lower())
        elif line.startswith("&parameter"):
            match = re.search(r"name\s*=\s*([\w\.]+)", line)
            parameter_names.append(match.group(1).lower())
        elif line.startswith("&data"):
            mode_match = re.search(r"mode\s*=\s*(\w+)", line)
            if mode_match:
                mode = mode_match.group(1)
            body_start = i + 1
            break
        i += 1
    if mode != "ascii":
        raise ValueError(
            "Binary SDDS files require the `sdds` package "
            "(pip install soliday.sdds)."
        )

    # Pages: each page is parameter values (one per line), a row count, then
    # that many rows.
    parameters: dict = {name: [] for name in parameter_names}
    pages = []
    pos = body_start
    data_lines = [
        line.strip()
        for line in lines[pos:]
        if line.strip() and not line.strip().startswith("!")
    ]
    cursor = 0
    while cursor < len(data_lines):
        for name in parameter_names:
            try:
                parameters[name].append(float(data_lines[cursor]))
            except ValueError:
                parameters[name].append(data_lines[cursor])
            cursor += 1
        if cursor >= len(data_lines):
            break
        num_rows = int(data_lines[cursor])
        cursor += 1
        rows = [
            [float(value) for value in data_lines[cursor + r].split()]
            for r in range(num_rows)
        ]
        cursor += num_rows
        pages.append(rows)

    column_data = [
        [[row[c] for row in page] for page in pages]
        for c in range(len(column_names))
    ]
    return column_names, column_data, parameters


def elegant_to_cheetah_coordinates(
    elegant_coordinates: Array, p_central: Array
) -> Array:
    r"""Convert Elegant ``[x, x', y, y', t, p]`` coordinates to cheetah 7D
    coordinates (ref ``elegant.py:523-567``)."""
    reference_momentum_eV = p_central * electron_mass_eV
    reference_energy_eV = jnp.sqrt(reference_momentum_eV**2 + electron_mass_eV**2)

    momentum_eV = elegant_coordinates[..., 5] * electron_mass_eV
    energy_eV = jnp.sqrt(momentum_eV**2 + electron_mass_eV**2)
    delta_p = (
        elegant_coordinates[..., 5] - p_central[..., None]
    ) / p_central[..., None]

    x_prime = elegant_coordinates[..., 1]
    y_prime = elegant_coordinates[..., 3]
    slope_norm = jnp.sqrt(1.0 + jnp.square(x_prime) + jnp.square(y_prime))

    return jnp.stack(
        [
            elegant_coordinates[..., 0],
            x_prime * (1.0 + delta_p) / slope_norm,
            elegant_coordinates[..., 2],
            y_prime * (1.0 + delta_p) / slope_norm,
            elegant_coordinates[..., 4] * speed_of_light,
            (energy_eV - reference_energy_eV[..., None])
            / reference_momentum_eV[..., None],
            jnp.ones_like(elegant_coordinates[..., 0]),
        ],
        axis=-1,
    )
