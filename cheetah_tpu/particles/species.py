"""Particle species (ref ``cheetah/particles/species.py:12-149``).

A species is a small pytree: the name is static configuration, charge and mass
are array leaves so they can be traced / differentiated / vmapped like any
other physical parameter.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array

from cheetah_tpu import constants
from cheetah_tpu.utils.pytree import pytree_dataclass, static_field


@pytree_dataclass(init=False)
class Species:
    """Named particle species defined by charge and mass.

    :param name: Name of the particle species. For species in ``Species.known``,
        charge and mass are populated automatically. Custom species (e.g. ions)
        can be defined by providing charge and mass.
    :param num_elementary_charges: Charge in units of elementary charge e.
    :param charge_coulomb: Charge in Coulombs (alternative to
        ``num_elementary_charges``).
    :param mass_eV: Mass in eV (alternative to ``mass_kg``).
    :param mass_kg: Mass in kg.
    """

    num_elementary_charges: Array
    mass_eV: Array
    name: str = static_field()

    known = {
        "electron": {"num_elementary_charges": -1, "mass_eV": constants.electron_mass_eV},
        "positron": {"num_elementary_charges": 1, "mass_eV": constants.electron_mass_eV},
        "proton": {"num_elementary_charges": 1, "mass_eV": constants.proton_mass_eV},
        "antiproton": {"num_elementary_charges": -1, "mass_eV": constants.proton_mass_eV},
        "deuteron": {"num_elementary_charges": 1, "mass_eV": constants.deuteron_mass_eV},
    }

    def __init__(
        self,
        name: str,
        num_elementary_charges: Array | float | None = None,
        charge_coulomb: Array | float | None = None,
        mass_eV: Array | float | None = None,
        mass_kg: Array | float | None = None,
        dtype: jnp.dtype | None = None,
    ) -> None:
        if name in self.known:
            assert all(
                value is None
                for value in (num_elementary_charges, charge_coulomb, mass_eV, mass_kg)
            ), "Known particle species should not have charge and mass provided."
            num_elementary_charges = self.known[name]["num_elementary_charges"]
            mass_eV = self.known[name]["mass_eV"]
        else:
            assert (
                num_elementary_charges is not None or charge_coulomb is not None
            ) and (
                mass_eV is not None or mass_kg is not None
            ), "Custom particle species should have charge and mass provided."
            assert num_elementary_charges is None or charge_coulomb is None, (
                "Only one of num_elementary_charges and charge_coulomb should be "
                "provided."
            )
            assert (
                mass_eV is None or mass_kg is None
            ), "Only one of mass_eV and mass_kg should be provided."
            if num_elementary_charges is None:
                num_elementary_charges = (
                    jnp.asarray(charge_coulomb) / constants.elementary_charge
                )
            if mass_eV is None:
                mass_eV = jnp.asarray(mass_kg) / constants.eV_to_kg

        self.name = name
        self.num_elementary_charges = jnp.asarray(num_elementary_charges, dtype=dtype)
        self.mass_eV = jnp.asarray(mass_eV, dtype=dtype)

    @property
    def mass_kg(self) -> Array:
        """Mass of the particle species in kg."""
        return self.mass_eV * constants.eV_to_kg

    @property
    def charge_coulomb(self) -> Array:
        """Charge of the particle species in Coulombs."""
        return self.num_elementary_charges * constants.elementary_charge

    def clone(self) -> "Species":
        return Species.__new__(Species)._init_from(
            self.name, self.num_elementary_charges, self.mass_eV
        )

    def _init_from(self, name, charges, mass) -> "Species":
        self.name = name
        self.num_elementary_charges = jnp.asarray(charges)
        self.mass_eV = jnp.asarray(mass)
        return self

    def __eq__(self, other: object) -> bool:
        return (
            isinstance(other, Species)
            and self.name == other.name
            and bool(
                jnp.all(self.num_elementary_charges == other.num_elementary_charges)
            )
            and bool(jnp.all(self.mass_eV == other.mass_eV))
        )

    __hash__ = None
