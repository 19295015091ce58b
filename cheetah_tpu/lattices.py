"""Built-in example lattices used by benchmarks and the graft entry point.

The ARES Experimental Area (EA) subcell mirrors the structure of the
reference's benchmark lattice (``tests/test_speed.py:14-35``: drifts + 3
quadrupoles + 2 correctors + screen): the section from AREASOLA1 to AREABSCR1
of the ARES accelerator at DESY (``tests/resources/ARESlatticeStage3v1_9.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from cheetah_tpu.accelerator import (
    Drift,
    HorizontalCorrector,
    Marker,
    Quadrupole,
    Segment,
    VerticalCorrector,
)


def ares_ea_subcell(dtype=jnp.float32, screen: bool = False) -> Segment:
    """ARES EA quadrupole-triplet subcell (AREASOLA1 -> AREABSCR1).

    Element lengths follow the ARES lattice (drift lengths between the EA
    magnets, 0.122 m quadrupoles, 0.02 m corrector coils).

    :param screen: Append the AREABSCR1 screen if available.
    """
    a = lambda value: jnp.asarray(value, dtype)  # noqa: E731
    elements = [
        Marker(name="AREASOLA1"),
        Drift(a(0.17504), name="Drift_AREASOLA1"),
        Quadrupole(a(0.122), k1=a(10.0), name="AREAMQZM1"),
        Drift(a(0.428), name="Drift_AREAMQZM1"),
        Quadrupole(a(0.122), k1=a(-9.0), name="AREAMQZM2"),
        Drift(a(0.204), name="Drift_AREAMQZM2"),
        VerticalCorrector(a(0.02), angle=a(1e-4), name="AREAMCVM1"),
        Drift(a(0.204), name="Drift_AREAMCVM1"),
        Quadrupole(a(0.122), k1=a(-8.0), name="AREAMQZM3"),
        Drift(a(0.179), name="Drift_AREAMQZM3"),
        HorizontalCorrector(a(0.02), angle=a(-1e-4), name="AREAMCHM1"),
        Drift(a(0.45), name="Drift_AREAMCHM1"),
    ]
    if screen:
        from cheetah_tpu.accelerator.screen import Screen

        elements.append(
            Screen(
                resolution=(2448, 2040),
                pixel_size=a((3.3198e-6, 2.4469e-6)),
                binning=1,
                is_active=True,
                name="AREABSCR1",
            )
        )
    else:
        elements.append(Marker(name="AREABSCR1"))
    return Segment(elements, name="ARES_EA")


def ares_stage3(dtype=jnp.float32) -> Segment:
    """The complete 195-element ARES linear accelerator (stage 3) at DESY.

    Vendored as a LatticeJSON in ``cheetah_tpu/resources`` (converted from
    the public ``ARESlatticeStage3v1_9`` Ocelot description with this
    package's Ocelot importer; ref ``tests/resources/ARESlatticeStage3v1_9.py``).
    Matches the reference's benchmark lattice
    (``tests/test_benchmark.py:29-36``) element for element.
    """
    import pathlib

    path = pathlib.Path(__file__).parent / "resources" / "ares_stage3.json"
    return Segment.from_lattice_json(str(path), dtype=dtype)
