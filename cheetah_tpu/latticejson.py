"""LatticeJSON save/load (ref ``cheetah/latticejson.py:26-260``).

Native serialisation of a ``Segment`` to the nobeam/latticejson-style dialect:
an ``elements`` dict of ``[class, params]``, a ``lattices`` dict of cells, and
a root pointer. Round-trips array leaves to plain lists.
"""

from __future__ import annotations

import json
from typing import Any

import jax.numpy as jnp
import numpy as np


def feature_to_plain(value: Any) -> Any:
    """Convert an array-valued feature to a JSON-serialisable value."""
    if isinstance(value, (jnp.ndarray, np.ndarray)):
        return np.asarray(value).tolist()
    return value


def plain_to_feature(value: Any, dtype=None) -> Any:
    """Convert a JSON value back to an array where appropriate. Strings,
    bools, ints, dicts and lists of those stay as they are (element
    constructors expect them plain)."""
    if (
        value is None
        or isinstance(value, (str, bool, int, dict))
        or (
            isinstance(value, (tuple, list))
            and all(isinstance(entry, (str, bool, int)) for entry in value)
        )
    ):
        return value
    return jnp.asarray(value, dtype)


def convert_element(element, elements_dict: dict | None = None):
    """Deconstruct an element into (name, class name, params); sub-elements
    are recursively added to ``elements_dict``."""
    import cheetah_tpu

    if elements_dict is None:
        elements_dict = {}

    params = {}
    for feature in element.defining_features:
        if feature == "name":
            continue
        value = getattr(element, feature)
        if isinstance(value, cheetah_tpu.Element):
            sub_name, sub_class, sub_params = convert_element(value, elements_dict)
            elements_dict[sub_name] = [sub_class, sub_params]
            params[feature] = sub_name
        else:
            params[feature] = feature_to_plain(value)

    # metadata is not a defining feature (it does not affect the simulation)
    # but should still round-trip.
    params["metadata"] = element.metadata

    return element.name, element.__class__.__name__, params


def convert_segment(segment) -> tuple[dict, dict]:
    """Deconstruct a segment into elements and lattices dicts."""
    import cheetah_tpu

    elements: dict = {}
    lattices: dict = {}
    cell = []

    for element in segment.elements:
        if isinstance(element, cheetah_tpu.Segment):
            sub_elements, sub_lattices = convert_segment(element)
            elements.update(sub_elements)
            lattices.update(sub_lattices)
        else:
            _, element_class, element_params = convert_element(element, elements)
            elements[element.name] = [element_class, element_params]
        cell.append(element.name)

    lattices[segment.name] = cell
    return elements, lattices


class CompactJSONEncoder(json.JSONEncoder):
    """JSON encoder indenting only the first two levels (latticejson style)."""

    def encode(self, obj, level: int = 0) -> str:
        if isinstance(obj, dict) and level < 2:
            item_indent = (level + 1) * self.indent * " "
            items = ",\n".join(
                f"{item_indent}{json.dumps(key)}: "
                f"{self.encode(value, level=level + 1)}"
                for key, value in obj.items()
            )
            closing_indent = level * self.indent * " "
            newline = "\n" if level == 0 else ""
            return f"{{\n{items}\n{closing_indent}}}{newline}"
        return json.dumps(obj)


def save_cheetah_model(
    segment,
    filename: str,
    title: str | None = None,
    info: str = "This is a placeholder lattice description",
) -> None:
    """Save a ``Segment`` to a LatticeJSON file."""
    if title is None:
        title = segment.name if segment.name is not None else "Unnamed Lattice"

    lattice_dict = {
        "version": "cheetah-tpu-0.1",
        "title": title,
        "info": info,
        "root": segment.name if segment.name is not None else "cell",
    }
    elements, lattices = convert_segment(segment)
    lattice_dict["elements"] = elements
    lattice_dict["lattices"] = lattices

    with open(filename, "w") as f:
        f.write(json.dumps(lattice_dict, cls=CompactJSONEncoder, indent=4))


def parse_element(name: str, lattice_dict: dict, dtype=None):
    """Instantiate the element named ``name`` from a lattice dict."""
    import cheetah_tpu

    element_class = getattr(cheetah_tpu, lattice_dict["elements"][name][0])
    params = lattice_dict["elements"][name][1]

    converted = {
        key: (
            parse_element(value, lattice_dict, dtype)
            if isinstance(value, str) and value in lattice_dict["elements"]
            else plain_to_feature(value, dtype)
        )
        for key, value in params.items()
    }
    return element_class(name=name, **converted)


def parse_segment(name: str, lattice_dict: dict, dtype=None):
    """Instantiate the segment named ``name`` from a lattice dict."""
    import cheetah_tpu

    elements = [
        (
            parse_segment(element_name, lattice_dict, dtype)
            if element_name in lattice_dict["lattices"]
            else parse_element(element_name, lattice_dict, dtype)
        )
        for element_name in lattice_dict["lattices"][name]
    ]
    return cheetah_tpu.Segment(elements=elements, name=name)


def load_cheetah_model(filename: str, dtype=None):
    """Load a ``Segment`` from a LatticeJSON file."""
    with open(filename, "r") as f:
        lattice_dict = json.load(f)
    return parse_segment(lattice_dict["root"], lattice_dict, dtype)
