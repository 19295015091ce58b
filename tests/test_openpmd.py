"""openPMD beam I/O (ref ``tests/test_openpmd_conversion.py``).

``pmd_beamphysics`` is not installed here (it is not installable in this
environment), so these tests exercise the native h5py implementation in
``cheetah_tpu/converters/openpmd.py`` — the same schema
(openPMD 2.0.0 + BeamPhysics extension, flat layout) that
``pmd_beamphysics.ParticleGroup.write`` produces — plus the duck-typed
``from_openpmd_particlegroup`` entry point the reference exposes
(ref ``particle_beam.py:926-973``).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import cheetah_tpu as ct

F64 = jnp.float64


@pytest.fixture
def beam() -> ct.ParticleBeam:
    # Mirrors the reference's test beam (test_openpmd_conversion.py:11-23).
    return ct.ParticleBeam.from_parameters(
        num_particles=10_000,
        mu_x=jnp.asarray(1e-4, F64),
        sigma_x=jnp.asarray(2e-5, F64),
        mu_y=jnp.asarray(1e-4, F64),
        sigma_y=jnp.asarray(2e-5, F64),
        sigma_p=jnp.asarray(1e-4, F64),
        energy=jnp.asarray(1e6, F64),
        total_charge=jnp.asarray(1e-9, F64),
        dtype=F64,
    )


def test_particlebeam_to_and_from_particlegroup(beam):
    """Round trip through a particle-group object (the reference's first
    test, with the native ``ParticleGroupData`` standing in for
    ``pmd_beamphysics.ParticleGroup``)."""
    from cheetah_tpu.converters.openpmd import ParticleGroupData

    reference_energy = jnp.asarray(1e6, F64)
    group = ParticleGroupData(beam._to_openpmd_data())
    loaded = ct.ParticleBeam.from_openpmd_particlegroup(
        group, energy=reference_energy, dtype=F64
    )

    assert loaded.num_particles == beam.num_particles
    np.testing.assert_allclose(
        np.asarray(loaded.particles),
        np.asarray(beam.particles),
        rtol=1e-9,
        atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(loaded.particle_charges),
        np.asarray(beam.particle_charges),
        rtol=1e-12,
    )
    assert loaded.species.name == beam.species.name


def test_particlebeam_to_and_from_openpmd_h5(beam, tmp_path):
    """Round trip through an HDF5 file (the reference's second test)."""
    reference_energy = jnp.asarray(1e6, F64)
    path = tmp_path / "particlegroup.h5"
    beam.save_as_openpmd_h5(path)
    loaded = ct.ParticleBeam.from_openpmd_file(
        path, energy=reference_energy, dtype=F64
    )

    assert loaded.num_particles == beam.num_particles
    np.testing.assert_allclose(
        np.asarray(loaded.particles),
        np.asarray(beam.particles),
        rtol=1e-9,
        atol=1e-14,
    )
    np.testing.assert_allclose(
        np.asarray(loaded.particle_charges),
        np.asarray(beam.particle_charges),
        rtol=1e-12,
    )


def test_openpmd_h5_schema(beam, tmp_path):
    """The written file carries the openPMD BeamPhysics structure: root
    attributes, record groups, and SI unit scales."""
    h5py = pytest.importorskip("h5py")
    from cheetah_tpu import constants

    path = tmp_path / "schema.h5"
    beam.save_as_openpmd_h5(path)
    with h5py.File(path, "r") as h5:
        assert h5.attrs["openPMD"] == b"2.0.0"
        assert b"BeamPhysics" in h5.attrs["openPMDextension"]
        assert h5.attrs["basePath"] == b"/"
        assert h5.attrs["particlesPath"] == b"."
        assert h5.attrs["speciesType"] == b"electron"
        assert h5.attrs["numParticles"] == beam.num_particles
        np.testing.assert_allclose(
            h5.attrs["totalCharge"], float(beam.total_charge), rtol=1e-12
        )
        for record in ("position/x", "position/y", "position/z"):
            assert h5[record].attrs["unitSI"] == 1.0
            assert h5[record].shape == (beam.num_particles,)
        ev_per_c = constants.elementary_charge / constants.speed_of_light
        for record in ("momentum/x", "momentum/y", "momentum/z"):
            np.testing.assert_allclose(
                h5[record].attrs["unitSI"], ev_per_c, rtol=1e-12
            )
        assert "time" in h5 and "weight" in h5 and "particleStatus" in h5


def test_openpmd_reader_handles_iteration_layout(beam, tmp_path):
    """Files using the series layout (``basePath='/data/%T/'``) read back
    identically — the layout openPMD simulations write."""
    h5py = pytest.importorskip("h5py")
    from cheetah_tpu.converters.openpmd import read_particle_group_h5

    flat = tmp_path / "flat.h5"
    beam.save_as_openpmd_h5(flat)

    nested = tmp_path / "series.h5"
    with h5py.File(flat, "r") as src, h5py.File(nested, "w") as dst:
        dst.attrs["openPMD"] = np.bytes_("2.0.0")
        dst.attrs["openPMDextension"] = np.bytes_("BeamPhysics;SpeciesType")
        dst.attrs["basePath"] = np.bytes_("/data/%T/")
        dst.attrs["particlesPath"] = np.bytes_("particles/")
        group = dst.create_group("data/100/particles")
        for key in ("position", "momentum", "time", "weight", "particleStatus"):
            src.copy(key, group)
        group.attrs["speciesType"] = src.attrs["speciesType"]

    flat_group = read_particle_group_h5(flat)
    nested_group = read_particle_group_h5(nested)
    for attr in ("x", "y", "z", "px", "py", "pz", "t", "weight", "status"):
        np.testing.assert_array_equal(
            getattr(nested_group, attr), getattr(flat_group, attr)
        )
    assert nested_group.species == flat_group.species


def test_openpmd_momentum_conversion_against_oracle_formulas(beam):
    """The exported momenta and derived per-particle energy satisfy the
    relativistic identities the reference relies on (ref
    ``particle_beam.py:1013-1016``): p_total^2 = E^2 - m^2 and
    energy == reference p0c * delta + reference energy."""
    from cheetah_tpu.converters.openpmd import ParticleGroupData

    group = ParticleGroupData(beam._to_openpmd_data())
    m = float(beam.species.mass_eV)
    energies = np.asarray(beam.energies)
    np.testing.assert_allclose(
        group.energy, energies, rtol=1e-12, err_msg="E^2 = p^2 + m^2"
    )
    p_total = np.sqrt(energies**2 - m**2)
    np.testing.assert_allclose(group.p, p_total, rtol=1e-12)


def test_openpmd_dead_particles_round_trip(tmp_path):
    """Survival probabilities threshold into status flags and back."""
    beam = ct.ParticleBeam.from_parameters(
        num_particles=100, energy=jnp.asarray(1e8, F64), dtype=F64
    )
    survival = np.ones(100)
    survival[10:20] = 0.0
    survival[20:25] = 0.3  # below threshold -> dead
    beam.survival_probabilities = jnp.asarray(survival, F64)

    path = tmp_path / "dead.h5"
    beam.save_as_openpmd_h5(path)
    loaded = ct.ParticleBeam.from_openpmd_file(
        path, energy=jnp.asarray(1e8, F64), dtype=F64
    )
    expected_status = (survival > 0.5).astype(float)
    np.testing.assert_array_equal(
        np.asarray(loaded.survival_probabilities), expected_status
    )


def test_openpmd_vectorised_beam_raises():
    beam = ct.ParticleBeam.from_parameters(
        num_particles=10,
        energy=jnp.asarray(1e8, F64),
        sigma_x=jnp.asarray([1e-4, 2e-4], F64),
        dtype=F64,
    )
    with pytest.raises(ValueError, match="non-vectorised"):
        beam._to_openpmd_data()


def test_openpmd_proton_species_round_trip(tmp_path):
    beam = ct.ParticleBeam.from_parameters(
        num_particles=50,
        energy=jnp.asarray(2e9, F64),
        species=ct.Species("proton"),
        dtype=F64,
    )
    path = tmp_path / "proton.h5"
    beam.save_as_openpmd_h5(path)
    loaded = ct.ParticleBeam.from_openpmd_file(
        path, energy=jnp.asarray(2e9, F64), dtype=F64
    )
    assert loaded.species.name == "proton"
    np.testing.assert_allclose(
        np.asarray(loaded.particles), np.asarray(beam.particles),
        rtol=1e-9, atol=1e-14,
    )


def test_openpmd_iteration_order_is_numeric(beam, tmp_path):
    """/data/%T/ iterations are ordered numerically: '2' loads before '10'."""
    h5py = pytest.importorskip("h5py")
    from cheetah_tpu.converters.openpmd import read_particle_group_h5

    flat = tmp_path / "flat.h5"
    beam.save_as_openpmd_h5(flat)
    series = tmp_path / "series.h5"
    with h5py.File(flat, "r") as src, h5py.File(series, "w") as dst:
        dst.attrs["openPMD"] = np.bytes_("2.0.0")
        dst.attrs["basePath"] = np.bytes_("/data/%T/")
        dst.attrs["particlesPath"] = np.bytes_("particles/")
        for iteration, scale in (("10", 2.0), ("2", 1.0)):
            group = dst.create_group(f"data/{iteration}/particles")
            for key in ("position", "momentum", "time", "weight", "particleStatus"):
                src.copy(key, group)
            group.attrs["speciesType"] = src.attrs["speciesType"]
            # Make iteration 10 distinguishable.
            group["position/x"][...] = group["position/x"][...] * scale

    first = read_particle_group_h5(series)
    flat_group = read_particle_group_h5(flat)
    np.testing.assert_array_equal(first.x, flat_group.x)  # iteration 2
