"""Differentiable Cloud-in-Cell (CIC) charge deposition.

TPU-native counterpart of ``cheetah/utils/cloud_in_cell.py:8-451``. The
reference scatter-adds into the grid with ``Tensor.scatter_add_``; on TPU the
equivalent is a flat ``segment_sum`` over a global (batch, cell) index — XLA
lowers this to an efficient sorted scatter, and it is differentiable in both
the charges and (through the fractional weights) the positions.

One generic n-D implementation covers the reference's specialised 1D/2D/3D
fast paths (``cloud_in_cell.py:67-384``) — on TPU the corner loop is unrolled
at trace time, so there is nothing to specialise.
"""

from __future__ import annotations

import itertools
import math
from typing import Sequence

import jax
import jax.numpy as jnp
from jax import Array


def cloud_in_cell_charge_deposition(
    positions: Array,
    bins: int | Sequence[int],
    extent: Array | None = None,
    charges: Array | None = None,
) -> Array:
    """Deposit particle charges onto a regular grid with trilinear (CIC)
    weighting.

    :param positions: Particle positions of shape
        ``(..., num_particles, num_hist_dims)``.
    :param bins: Number of bins per spatial dimension (int or sequence;
        static).
    :param extent: Grid extent of shape ``(..., num_hist_dims, 2)`` (leftmost
        and rightmost bin edges). If ``None``, inferred from the positions.
        Particles outside the extent contribute zero charge.
    :param charges: Particle charges of shape ``(..., num_particles)``;
        defaults to 1.
    :return: Charge grid of shape ``(..., *bins)``.
    """
    if extent is None:
        extent = jnp.stack(
            [jnp.min(positions, axis=-2), jnp.max(positions, axis=-2)], axis=-1
        )
    if charges is None:
        charges = jnp.ones_like(positions[..., 0])

    num_hist_dims = positions.shape[-1]
    histogram_shape = (
        [bins] * num_hist_dims if isinstance(bins, int) else list(bins)
    )
    assert (
        len(histogram_shape) == num_hist_dims
    ), "Number of bin values must match number of position dimensions."

    # Broadcast batch dims across positions/extent/charges and flatten them.
    vector_shape = jnp.broadcast_shapes(
        positions.shape[:-2], extent.shape[:-2], charges.shape[:-1]
    )
    num_particles = positions.shape[-2]
    positions = jnp.broadcast_to(
        positions, (*vector_shape, num_particles, num_hist_dims)
    ).reshape(-1, num_particles, num_hist_dims)
    extent = jnp.broadcast_to(
        extent, (*vector_shape, num_hist_dims, 2)
    ).reshape(-1, num_hist_dims, 2)
    charges = jnp.broadcast_to(charges, (*vector_shape, num_particles)).reshape(
        -1, num_particles
    )
    batch = positions.shape[0]

    num_cells = math.prod(histogram_shape)

    # Per-dimension bin-space decomposition (ref ``cloud_in_cell.py:408-428``).
    in_extent = jnp.ones(charges.shape, dtype=bool)
    int_components = []
    frac_components = []
    for d in range(num_hist_dims):
        coord = positions[..., d]
        left = extent[:, d, 0][..., None]
        right = extent[:, d, 1][..., None]
        in_extent = in_extent & (coord >= left) & (coord <= right)
        bin_width = (right - left) / histogram_shape[d]
        in_bin_space = (coord - left) / bin_width - 0.5
        int_part = jnp.floor(in_bin_space).astype(jnp.int32)
        int_components.append(int_part)
        frac_components.append(in_bin_space - int_part)

    masked_charges = charges * in_extent

    strides = [math.prod(histogram_shape[d + 1 :]) for d in range(num_hist_dims)]

    # Accumulate all 2^d corner contributions into one (segment_ids, weights)
    # scatter: global index = batch * num_cells + flat cell index.
    batch_offset = (
        jnp.arange(batch, dtype=jnp.int32)[:, None] * num_cells
    )

    all_ids = []
    all_weights = []
    for corner in itertools.product([0, 1], repeat=num_hist_dims):
        corner_idx = jnp.zeros_like(int_components[0])
        corner_weight = masked_charges
        for d in range(num_hist_dims):
            idx = int_components[d] + corner[d]
            clamped = jnp.clip(idx, 0, histogram_shape[d] - 1)
            corner_idx = corner_idx + clamped * strides[d]
            mask = (idx >= 0) & (idx < histogram_shape[d])
            factor = frac_components[d] if corner[d] else (1.0 - frac_components[d])
            corner_weight = corner_weight * (factor * mask)
        all_ids.append(batch_offset + corner_idx)
        all_weights.append(corner_weight)

    segment_ids = jnp.stack(all_ids, axis=0).reshape(-1)
    weights = jnp.stack(all_weights, axis=0).reshape(-1)

    flat_grid = jax.ops.segment_sum(
        weights, segment_ids, num_segments=batch * num_cells
    )
    return flat_grid.reshape(*vector_shape, *histogram_shape)
