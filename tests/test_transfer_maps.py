"""Transfer-map parity against the torch reference at float64."""

import jax.numpy as jnp
import numpy as np
import pytest
from reference_oracle import ref, to_numpy, to_torch, torch

import cheetah_tpu.ops.transfer_maps as tmaps
from cheetah_tpu import Species

import cheetah.track_methods as ref_tmaps  # noqa: E402  (import after oracle)

ENERGY = 1.5e8

CASES = [
    # (length, k1, hx)
    (0.3, 4.2, 0.0),
    (0.3, -4.2, 0.0),
    (0.25, 0.0, 0.0),
    (0.5, 2.0, 0.1),
    (0.5, -2.0, -0.1),
    (0.4, 0.0, 0.2),
    (0.0, 3.0, 0.0),
]


@pytest.mark.parametrize("length,k1,hx", CASES)
def test_base_rmatrix_parity(length, k1, hx):
    R = tmaps.base_rmatrix(
        jnp.array(length, jnp.float64),
        jnp.array(k1, jnp.float64),
        jnp.array(hx, jnp.float64),
        Species("electron"),
        jnp.array(ENERGY, jnp.float64),
    )
    R_ref = ref_tmaps.base_rmatrix(
        torch.tensor(length),
        torch.tensor(k1),
        torch.tensor(hx),
        ref.Species("electron"),
        torch.tensor(ENERGY),
    )
    np.testing.assert_allclose(R, to_numpy(R_ref), rtol=1e-12, atol=1e-14)


@pytest.mark.parametrize("length,k1,hx", CASES)
@pytest.mark.parametrize("k2", [0.0, 30.0, -12.5])
def test_base_ttensor_parity(length, k1, hx, k2):
    T = tmaps.base_ttensor(
        jnp.array(length, jnp.float64),
        jnp.array(k1, jnp.float64),
        jnp.array(k2, jnp.float64),
        jnp.array(hx, jnp.float64),
        Species("electron"),
        jnp.array(ENERGY, jnp.float64),
    )
    T_ref = ref_tmaps.base_ttensor(
        torch.tensor(length),
        torch.tensor(k1),
        torch.tensor(k2),
        torch.tensor(hx),
        ref.Species("electron"),
        torch.tensor(ENERGY),
    )
    np.testing.assert_allclose(T, to_numpy(T_ref), rtol=1e-10, atol=1e-12)


def test_drift_matrix_parity():
    R = tmaps.drift_matrix(
        jnp.array(1.7, jnp.float64), jnp.array(ENERGY, jnp.float64), Species("electron")
    )
    R_ref = ref_tmaps.drift_matrix(
        torch.tensor(1.7), torch.tensor(ENERGY), ref.Species("electron")
    )
    np.testing.assert_allclose(R, to_numpy(R_ref), rtol=1e-12, atol=1e-15)


def test_rotation_matrix_parity():
    R = tmaps.rotation_matrix(jnp.array(0.37, jnp.float64))
    R_ref = ref_tmaps.rotation_matrix(torch.tensor(0.37))
    np.testing.assert_allclose(R, to_numpy(R_ref), rtol=1e-12, atol=1e-15)


def test_misalignment_matrix_parity():
    mis = jnp.array([1e-4, -2e-4], jnp.float64)
    R_entry, R_exit = tmaps.misalignment_matrix(mis)
    R_entry_ref, R_exit_ref = ref_tmaps.misalignment_matrix(to_torch(mis))
    np.testing.assert_allclose(R_entry, to_numpy(R_entry_ref), atol=1e-15)
    np.testing.assert_allclose(R_exit, to_numpy(R_exit_ref), atol=1e-15)


def test_combined_rotation_misalignment_parity():
    mis = jnp.array([1e-4, -2e-4], jnp.float64)
    angle = jnp.array(0.21, jnp.float64)
    R_entry, R_exit = tmaps.combined_rotation_misalignment_matrix(angle, mis)
    R_entry_ref, R_exit_ref = ref_tmaps.combined_rotation_misalignment_matrix(
        torch.tensor(0.21), to_torch(mis)
    )
    np.testing.assert_allclose(R_entry, to_numpy(R_entry_ref), atol=1e-15)
    np.testing.assert_allclose(R_exit, to_numpy(R_exit_ref), atol=1e-15)


def test_base_rmatrix_vectorized_shapes():
    """Leading vector dims broadcast through map construction."""
    R = tmaps.base_rmatrix(
        jnp.array(0.3, jnp.float64),
        jnp.linspace(-5.0, 5.0, 4, dtype=jnp.float64),
        jnp.array(0.0, jnp.float64),
        Species("electron"),
        jnp.array(ENERGY, jnp.float64),
    )
    assert R.shape == (4, 7, 7)
    R2 = tmaps.base_rmatrix(
        jnp.full((3, 1), 0.3, jnp.float64),
        jnp.linspace(-5.0, 5.0, 4, dtype=jnp.float64),
        jnp.array(0.0, jnp.float64),
        Species("electron"),
        jnp.array(ENERGY, jnp.float64),
    )
    assert R2.shape == (3, 4, 7, 7)
