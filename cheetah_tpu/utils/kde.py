"""Differentiable Gaussian-KDE histograms (ref ``cheetah/utils/kde.py:6-204``).

The joint 2D pdf is formed as a batched matmul of per-dimension kernel-value
matrices (``K1^T @ K2``) — an MXU-friendly formulation.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def _kde_marginal_pdf(
    values: Array,
    bins: Array,
    sigma: Array,
    weights: Array | None = None,
    epsilon: float = 1e-10,
) -> tuple[Array, Array]:
    """Per-dimension KDE kernel values and marginal pdf.

    :param values: Samples of shape ``(..., N)``.
    :param bins: Bin centres of shape ``(num_bins,)``.
    :param sigma: Gaussian bandwidth (scalar).
    :param weights: Optional sample weights of shape ``(..., N)``.
    :return: ``(pdf (..., num_bins), kernel_values (..., N, num_bins))``.
    """
    values = values[..., None]
    if weights is None:
        weights = jnp.ones_like(values)
    else:
        weights = weights[..., None]

    residuals = values - bins
    kernel_values = (
        weights
        * jnp.exp(-0.5 * jnp.square(residuals / sigma))
        / jnp.sqrt(2 * jnp.pi * jnp.square(sigma))
    )
    clamped = jnp.clip(kernel_values, min=jnp.finfo(kernel_values.dtype).tiny)

    probability_mass = jnp.sum(clamped, axis=-2)
    normalization = jnp.sum(probability_mass, axis=-1, keepdims=True) + epsilon
    return probability_mass / normalization, clamped


def kde_histogram_1d(
    x: Array,
    bins: Array,
    bandwidth: Array,
    weights: Array | None = None,
    epsilon: float = 1e-10,
) -> Array:
    """Differentiable 1D histogram via KDE (ref ``kde.py:116-152``)."""
    pdf, _ = _kde_marginal_pdf(x, bins, bandwidth, weights, epsilon)
    return pdf


def kde_histogram_2d(
    x1: Array,
    x2: Array,
    bins1: Array,
    bins2: Array,
    bandwidth: Array,
    weights: Array | None = None,
    epsilon: float = 1e-10,
) -> Array:
    """Differentiable 2D histogram via KDE (ref ``kde.py:155-204``).

    :return: Joint pdf of shape ``(..., num_bins1, num_bins2)``.
    """
    _, kernel_values1 = _kde_marginal_pdf(x1, bins1, bandwidth, weights)
    _, kernel_values2 = _kde_marginal_pdf(x2, bins2, bandwidth, None)
    joint = jnp.swapaxes(kernel_values1, -1, -2) @ kernel_values2
    normalization = jnp.sum(joint, axis=(-2, -1))[..., None, None] + epsilon
    return joint / normalization
