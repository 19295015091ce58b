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
    chunk_size: int = 4096,
    window: int | None = None,
) -> Array:
    """Differentiable 2D histogram via KDE (ref ``kde.py:155-204``).

    The joint pdf ``K1^T @ K2`` is accumulated over particle chunks with
    ``lax.scan`` so the per-particle kernel matrices (``O(N x num_bins)``,
    ~1 GB for 100k particles on a megapixel screen if materialised at once)
    never exceed ``O(chunk_size x num_bins)`` of live memory.

    ``window`` (opt-in) evaluates the kernels only on a ``window``-bins
    bounding box around the samples and places the result with one
    ``dynamic_update_slice`` — the dense ``O(N x num_bins1 x num_bins2)``
    matmul shrinks by the grid/window area ratio on megapixel grids. The
    window includes a 10-bandwidth margin (truncating kernel tails below
    ``exp(-50) ~ 2e-22`` of peak, far under float32 resolution); a runtime
    ``lax.cond`` falls back to the full evaluation when the samples plus
    margin span more than the window. Requires uniformly spaced bins and
    unbatched samples; ignored otherwise.

    :return: Joint pdf of shape ``(..., num_bins1, num_bins2)``.
    """
    import jax

    if (
        window is not None
        and x1.ndim == 1
        and window < bins1.shape[0]
        and window < bins2.shape[0]
        and _bins_uniform_if_concrete(bins1)
        and _bins_uniform_if_concrete(bins2)
    ):
        return _kde_histogram_2d_windowed(
            x1, x2, bins1, bins2, bandwidth, weights,
            epsilon, chunk_size, window,
        )

    num_particles = x1.shape[-1]
    if num_particles <= chunk_size:
        _, kernel_values1 = _kde_marginal_pdf(x1, bins1, bandwidth, weights)
        _, kernel_values2 = _kde_marginal_pdf(x2, bins2, bandwidth, None)
        joint = jnp.swapaxes(kernel_values1, -1, -2) @ kernel_values2
    else:
        num_chunks = -(-num_particles // chunk_size)
        pad = num_chunks * chunk_size - num_particles
        if weights is None:
            weights = jnp.ones_like(x1)
        # Padded samples carry zero weight, so they contribute nothing.
        x1p = jnp.pad(x1, [(0, 0)] * (x1.ndim - 1) + [(0, pad)])
        x2p = jnp.pad(x2, [(0, 0)] * (x2.ndim - 1) + [(0, pad)])
        wp = jnp.pad(weights, [(0, 0)] * (weights.ndim - 1) + [(0, pad)])

        def split(values):
            reshaped = values.reshape(*values.shape[:-1], num_chunks, chunk_size)
            return jnp.moveaxis(reshaped, -2, 0)

        def body(joint, sl):
            x1c, x2c, wc = sl
            _, k1 = _kde_marginal_pdf(x1c, bins1, bandwidth, wc)
            _, k2 = _kde_marginal_pdf(x2c, bins2, bandwidth, None)
            return joint + jnp.swapaxes(k1, -1, -2) @ k2, None

        joint_shape = (*x1.shape[:-1], bins1.shape[0], bins2.shape[0])
        joint, _ = jax.lax.scan(
            body, jnp.zeros(joint_shape, x1.dtype), (split(x1p), split(x2p), split(wp))
        )

    normalization = jnp.sum(joint, axis=(-2, -1))[..., None, None] + epsilon
    return joint / normalization


def _bins_uniform_if_concrete(bins: Array) -> bool:
    """True when the bins are uniformly spaced, or traced (the windowed
    caller — the Screen — builds them with linspace by construction; a
    traced non-uniform grid is the caller's contract violation)."""
    import jax
    import numpy as np

    if isinstance(bins, jax.core.Tracer):
        return True
    if bins.shape[0] < 2:
        return False
    steps = np.diff(np.asarray(bins))
    return bool(np.allclose(steps, steps[0], rtol=1e-9, atol=0.0))


def _kde_histogram_2d_windowed(
    x1, x2, bins1, bins2, bandwidth, weights,
    epsilon, chunk_size, window,
):
    """Bounding-box windowed 2D KDE (see :func:`kde_histogram_2d`)."""
    import jax

    nb1, nb2 = bins1.shape[0], bins2.shape[0]
    step1 = bins1[1] - bins1[0]
    step2 = bins2[1] - bins2[0]
    # Sample bounding box in bin space, clipped to the grid (off-grid
    # samples only reach edge bins, which the clip keeps in the window).
    margin1 = jnp.ceil(10.0 * bandwidth / step1).astype(jnp.int32)
    margin2 = jnp.ceil(10.0 * bandwidth / step2).astype(jnp.int32)

    def axis_window(x, bins, num_bins, step, margin, tile):
        s = jnp.clip((x - bins[0]) / step, 0.0, num_bins - 1.0)
        lo = jnp.floor(jnp.min(s)).astype(jnp.int32) - margin
        # Clip the margin to the grid on BOTH sides: bins beyond the border
        # don't exist, so a beam flush against the max edge must not be
        # pushed into the fallback by phantom margin bins.
        hi = jnp.minimum(
            jnp.ceil(jnp.max(s)).astype(jnp.int32) + margin, num_bins - 1
        )
        offset = jnp.clip(lo, 0, num_bins - tile)
        fits = hi - offset <= tile - 1
        return offset, fits

    offset1, fits1 = axis_window(x1, bins1, nb1, step1, margin1, window)
    offset2, fits2 = axis_window(x2, bins2, nb2, step2, margin2, window)

    def windowed(_):
        # Slice the actual bin centers (bit-identical to the full path's
        # bins at the same indices, unlike recomputing bins[0] + k*step).
        wbins1 = jax.lax.dynamic_slice(bins1, (offset1,), (window,))
        wbins2 = jax.lax.dynamic_slice(bins2, (offset2,), (window,))
        joint = kde_histogram_2d(
            x1, x2, wbins1, wbins2, bandwidth, weights,
            epsilon=epsilon, chunk_size=chunk_size, window=None,
        )
        full = jnp.zeros((nb1, nb2), joint.dtype)
        return jax.lax.dynamic_update_slice(full, joint, (offset1, offset2))

    def fallback(_):
        return kde_histogram_2d(
            x1, x2, bins1, bins2, bandwidth, weights,
            epsilon=epsilon, chunk_size=chunk_size, window=None,
        )

    return jax.lax.cond(fits1 & fits2, windowed, fallback, None)
