"""Weighted statistics and exact moment matching.

TPU-native equivalents of ``cheetah/utils/statistics.py:4-143``. All functions
operate over the last axis (the particle axis) and broadcast over arbitrary
leading vector dimensions; the covariance matrix uses a single batched matmul
so it lands on the MXU.
"""

from __future__ import annotations

import jax.numpy as jnp
from jax import Array


def unbiased_weighted_covariance(
    inputs1: Array, inputs2: Array, weights: Array, axis: int = -1
) -> Array:
    """Unbiased weighted covariance of two samples along ``axis``."""
    total_weight = jnp.sum(weights, axis=axis)
    mean1 = jnp.sum(inputs1 * weights, axis=axis) / total_weight
    mean2 = jnp.sum(inputs2 * weights, axis=axis) / total_weight
    correction = total_weight - jnp.sum(jnp.square(weights), axis=axis) / total_weight
    centered = (inputs1 - jnp.expand_dims(mean1, axis)) * (
        inputs2 - jnp.expand_dims(mean2, axis)
    )
    return jnp.sum(weights * centered, axis=axis) / correction


def unbiased_weighted_variance(inputs: Array, weights: Array, axis: int = -1) -> Array:
    """Unbiased weighted variance along ``axis``."""
    total_weight = jnp.sum(weights, axis=axis)
    mean = jnp.sum(inputs * weights, axis=axis) / total_weight
    correction = total_weight - jnp.sum(jnp.square(weights), axis=axis) / total_weight
    centered = jnp.square(inputs - jnp.expand_dims(mean, axis))
    return jnp.sum(weights * centered, axis=axis) / correction


def unbiased_weighted_std(inputs: Array, weights: Array, axis: int = -1) -> Array:
    """Unbiased weighted standard deviation along ``axis``."""
    return jnp.sqrt(unbiased_weighted_variance(inputs, weights, axis=axis))


def unbiased_weighted_covariance_matrix(inputs: Array, weights: Array) -> Array:
    """Unbiased weighted covariance matrix.

    :param inputs: Samples of shape ``(..., num_samples, num_features)``.
    :param weights: Weights of shape ``(..., num_samples)``.
    :return: Covariance matrix of shape ``(..., num_features, num_features)``.
    """
    normalized = weights / jnp.sum(weights, axis=-1, keepdims=True)
    correction = 1.0 - jnp.sum(jnp.square(normalized), axis=-1)
    means = jnp.sum(inputs * normalized[..., None], axis=-2, keepdims=True)
    centered = inputs - means
    cov = jnp.matmul(
        jnp.swapaxes(normalized[..., None] * centered, -1, -2), centered
    )
    return cov / correction[..., None, None]


def match_distribution_moments(
    samples: Array,
    target_mu: Array,
    target_cov: Array,
    weights: Array | None = None,
) -> Array:
    """Affinely transform ``samples`` to have *exactly* the target moments.

    Whiten with the inverse Cholesky factor of the sample covariance, then
    recolour with the Cholesky factor of the target covariance (ref
    ``cheetah/utils/statistics.py:91-143``). Gradients flow through both the
    samples and the targets.

    :param samples: Samples of shape ``(..., num_samples, num_features)``.
    :param target_mu: Target mean of shape ``(..., num_features)``.
    :param target_cov: Target covariance of shape ``(..., num_features,
        num_features)``.
    :param weights: Optional sample weights of shape ``(..., num_samples)``.
    """
    import jax

    num_features = samples.shape[-1]

    if weights is None:
        weights = jnp.ones_like(samples[..., 0])
    sample_cov = unbiased_weighted_covariance_matrix(samples, weights)
    sample_mu = jnp.sum(samples * weights[..., None], axis=-2) / jnp.sum(
        weights, axis=-1, keepdims=True
    )

    chol_sample = jnp.linalg.cholesky(sample_cov)
    eye = jnp.eye(num_features, dtype=samples.dtype)
    inv_sqrt_sample = jax.scipy.linalg.solve_triangular(
        chol_sample, jnp.broadcast_to(eye, chol_sample.shape), lower=True
    )

    chol_target = jnp.linalg.cholesky(target_cov)

    vector_shape = jnp.broadcast_shapes(target_mu.shape[:-1], target_cov.shape[:-2])
    transform = jnp.swapaxes(
        chol_target @ jnp.broadcast_to(
            inv_sqrt_sample, (*vector_shape, num_features, num_features)
        ),
        -1,
        -2,
    )
    centered = samples - sample_mu[..., None, :]
    return centered @ transform + target_mu[..., None, :]
