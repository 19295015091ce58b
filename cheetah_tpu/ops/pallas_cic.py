"""Pallas TPU kernels for the two-hot cloud-in-cell deposit and gather.

The XLA formulation in :mod:`cheetah_tpu.ops.cloud_in_cell` materialises the
``(chunk, nx*ny)`` two-hot matrix in HBM because XLA does not fuse elementwise
producers into matmul *operands*. This kernel builds the two-hot tiles
directly in VMEM and feeds the MXU, so HBM traffic drops to the particle
positions/charges plus one grid write — the deposit becomes compute-bound
instead of bandwidth-bound.

Layout (per batch instance, handled by ``jax.vmap`` outside):

- positions arrive pre-normalised to bin space as ``(3, N)`` (x, y, t rows),
- charges as ``(1, N)`` (already masked to zero outside the grid extent),
- the output is ``(nt, nx*ny)``, transposed/reshaped to ``(nx, ny, nt)`` by
  the caller.

The grid iterates sequentially over particle chunks (TPU grid order), so the
output block acts as a VMEM accumulator: zero-initialised at program 0 and
revisited by every subsequent program.

Used by ``SpaceChargeKick`` via the dispatch in ``cloud_in_cell.py`` when
running on the TPU backend (ref behaviour: ``cheetah/utils/cloud_in_cell.py``
scatter-add deposit).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Keep the (nx*ny, chunk) lead tile at or under ~4 MB of VMEM.
_LEAD_TILE_BYTES = 4 * 1024 * 1024

# Escape hatch: set False to force the XLA two-hot path everywhere (e.g. to
# rule the kernels out while debugging). On multi-chip meshes the GSPMD
# partitioner treats pallas_call as an opaque custom call — use
# ``SpaceChargeKick(particle_axis=...)`` inside ``shard_map`` there (the
# kick's explicit-collective mode), or disable this. Single-chip behaviour
# is identical either way up to f32 accumulation order.
ENABLED = True


def _chunk_for(num_lead_cells: int) -> int:
    chunk = _LEAD_TILE_BYTES // (4 * num_lead_cells)
    return max(128, min(1024, (chunk // 128) * 128))


def _two_hot_t(bin_positions: Array, num_bins: int, chunk: int) -> Array:
    """Transposed two-hot factor ``(num_bins, chunk)`` from bin-space
    positions ``(1, chunk)``: weight ``1-f`` at row ``i0``, ``f`` at
    ``i0+1``. Out-of-range corners vanish because no row index matches."""
    bins = jax.lax.broadcasted_iota(jnp.int32, (num_bins, chunk), 0)
    i0 = jnp.floor(bin_positions).astype(jnp.int32)
    frac = (bin_positions - jnp.floor(bin_positions)).astype(jnp.float32)
    return jnp.where(bins == i0, 1.0 - frac, 0.0) + jnp.where(
        bins == i0 + 1, frac, 0.0
    )


def _deposit_kernel(pos_ref, q_ref, out_ref, *, nx, ny, nt, chunk):
    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ux_t = _two_hot_t(pos_ref[0:1, :], nx, chunk)  # (nx, chunk)
    uy_t = _two_hot_t(pos_ref[1:2, :], ny, chunk)  # (ny, chunk)
    ut_t = _two_hot_t(pos_ref[2:3, :], nt, chunk)  # (nt, chunk)

    lead_t = (ux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk)
    ut_q = ut_t * q_ref[0:1, :].astype(jnp.float32)

    # (nt, chunk) x (nx*ny, chunk) -> (nt, nx*ny) on the MXU.
    out_ref[:] += jax.lax.dot_general(
        ut_q,
        lead_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("histogram_shape", "interpret"))
def deposit_3d_pallas(
    positions: Array,
    charges: Array,
    histogram_shape: tuple[int, int, int],
    extent: Array,
    interpret: bool = False,
) -> Array:
    """Pallas CIC deposit: ``positions (B, N, 3)``, ``charges (B, N)``,
    ``extent (B, 3, 2)`` -> charge grid ``(B, nx, ny, nt)`` (float32).

    Semantics identical to ``_deposit_tensor_product`` /
    ``cloud_in_cell_charge_deposition``.
    """
    nx, ny, nt = histogram_shape
    num_lead = nx * ny
    chunk = _chunk_for(num_lead)

    batch, num_particles, _ = positions.shape
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles
    if pad:
        positions = jnp.pad(positions, ((0, 0), (0, pad), (0, 0)))
        charges = jnp.pad(charges, ((0, 0), (0, pad)))

    left = extent[:, None, :, 0]
    right = extent[:, None, :, 1]
    nb = jnp.asarray(histogram_shape, positions.dtype)
    in_bin_space = (positions - left) / ((right - left) / nb) - 0.5
    in_extent = jnp.all((positions >= left) & (positions <= right), axis=-1)
    masked_charges = charges * in_extent
    # Park padded/out-of-extent particles at -2 so neither two-hot row
    # matches even after the +1 corner (charge is already zero; this also
    # protects against NaN positions poisoning the iota comparison).
    safe = jnp.where(
        in_extent[..., None], in_bin_space, jnp.asarray(-2.0, positions.dtype)
    )

    pos_t = jnp.swapaxes(safe, -1, -2).astype(jnp.float32)  # (B, 3, Np)
    q_row = masked_charges[:, None, :].astype(jnp.float32)  # (B, 1, Np)

    call = pl.pallas_call(
        functools.partial(_deposit_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((nt, num_lead), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nt, num_lead), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    grids = jax.vmap(call)(pos_t, q_row)  # (B, nt, nx*ny)
    return (
        jnp.swapaxes(grids, -1, -2).reshape(batch, nx, ny, nt)
    )


def _gather_kernel(pos_ref, g_ref, out_ref, *, nx, ny, nt, chunk):
    ux_t = _two_hot_t(pos_ref[0:1, :], nx, chunk)  # (nx, chunk)
    uy_t = _two_hot_t(pos_ref[1:2, :], ny, chunk)  # (ny, chunk)
    ut_t = _two_hot_t(pos_ref[2:3, :], nt, chunk)  # (nt, chunk)

    lead_t = (ux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk)

    # (C*nt, nx*ny) x (nx*ny, chunk) -> (C*nt, chunk) on the MXU, then
    # contract the t axis elementwise against the particle t-two-hot.
    m = jax.lax.dot_general(
        g_ref[:],
        lead_t,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    num_components = g_ref.shape[0] // nt
    m = m.reshape(num_components, nt, chunk)
    out_ref[:] = jnp.sum(m * ut_t[None, :, :], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_3d_pallas(
    grids: Array, normalized: Array, interpret: bool = False
) -> Array:
    """Pallas trilinear gather: ``grids (B, C, nx, ny, nt)``, bin-space
    positions ``normalized (B, N, 3)`` -> values ``(B, C, N)`` (float32).

    Semantics identical to ``cloud_in_cell_gather_3d`` (out-of-grid corners
    contribute zero because no two-hot row matches).
    """
    batch, num_components, nx, ny, nt = grids.shape
    num_lead = nx * ny
    chunk = _chunk_for(num_lead)

    num_particles = normalized.shape[1]
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles
    if pad:
        # Park padding at -2: matches no bin row, so gathered value is 0.
        normalized = jnp.pad(
            normalized, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0
        )

    pos_t = jnp.swapaxes(normalized, -1, -2).astype(jnp.float32)  # (B, 3, Np)
    # (B, C, nx, ny, nt) -> (B, C*nt, nx*ny) with t fastest in rows.
    g_rows = (
        jnp.moveaxis(grids, -1, 2)
        .reshape(batch, num_components * nt, num_lead)
        .astype(jnp.float32)
    )

    call = pl.pallas_call(
        functools.partial(_gather_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct(
            (num_components, num_chunks * chunk), jnp.float32
        ),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_components * nt, num_lead),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_components, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    values = jax.vmap(call)(pos_t, g_rows)  # (B, C, Np)
    return values[..., :num_particles]


@functools.lru_cache(maxsize=None)
def differentiable_pallas_gather():
    """Pallas-forward gather with XLA-path derivatives (see
    :func:`differentiable_pallas_deposit`)."""
    from cheetah_tpu.ops.cloud_in_cell import cloud_in_cell_gather_3d

    @jax.custom_jvp
    def gather(grids, normalized):
        return gather_3d_pallas(grids, normalized)

    @gather.defjvp
    def gather_jvp(primals, tangents):
        out = gather(*primals)
        _, tangent_out = jax.jvp(
            lambda g, n: cloud_in_cell_gather_3d(g, n).astype(jnp.float32),
            primals,
            tangents,
        )
        return out, tangent_out

    return gather


def pallas_deposit_available(histogram_shape) -> bool:
    """The kernel handles 3D grids whose (nx*ny, nt) accumulator fits VMEM."""
    return (
        ENABLED
        and len(histogram_shape) == 3
        and math.prod(histogram_shape) <= 65536
        and jax.default_backend() == "tpu"
    )


@functools.lru_cache(maxsize=None)
def differentiable_pallas_deposit(histogram_shape: tuple[int, int, int]):
    """Pallas-forward deposit with XLA-path derivatives.

    Pallas kernels have no automatic differentiation rule, so the tangent (and
    hence, via linearize-and-transpose, the cotangent) is computed with the
    mathematically identical XLA tensor-product formulation. Plain forward
    calls run only the kernel; differentiated calls pay the XLA path once, the
    same cost as before the kernel existed.
    """
    from cheetah_tpu.ops.cloud_in_cell import _deposit_tensor_product

    @jax.custom_jvp
    def deposit(positions, charges, extent):
        return deposit_3d_pallas(positions, charges, histogram_shape, extent)

    @deposit.defjvp
    def deposit_jvp(primals, tangents):
        out = deposit(*primals)
        _, tangent_out = jax.jvp(
            lambda p, c, e: _deposit_tensor_product(
                p, c, list(histogram_shape), e
            ).astype(jnp.float32),
            primals,
            tangents,
        )
        return out, tangent_out

    return deposit
