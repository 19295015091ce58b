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


def _two_hot_grad_t(bin_positions: Array, num_bins: int, chunk: int) -> Array:
    """d/d(bin position) of :func:`_two_hot_t`: ``-1`` at row ``i0``, ``+1``
    at ``i0+1`` (the a.e. derivative of the linear hat weights). Out-of-range
    rows vanish, matching the value kernel's zero corner weights."""
    bins = jax.lax.broadcasted_iota(jnp.int32, (num_bins, chunk), 0)
    i0 = jnp.floor(bin_positions).astype(jnp.int32)
    return jnp.where(bins == i0, -1.0, 0.0) + jnp.where(bins == i0 + 1, 1.0, 0.0)


def _deposit_kernel(pos_ref, q_ref, out_ref, *, nx, ny, nt, chunk):
    """Deposit ``C`` charge components at shared positions: ``q_ref``
    ``(C, chunk)`` -> ``out_ref`` ``(C*nt, nx*ny)`` (t fastest in rows)."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ux_t = _two_hot_t(pos_ref[0:1, :], nx, chunk)  # (nx, chunk)
    uy_t = _two_hot_t(pos_ref[1:2, :], ny, chunk)  # (ny, chunk)
    ut_t = _two_hot_t(pos_ref[2:3, :], nt, chunk)  # (nt, chunk)

    lead_t = (ux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk)
    num_components = q_ref.shape[0]
    ut_q = (
        q_ref[:].astype(jnp.float32)[:, None, :] * ut_t[None, :, :]
    ).reshape(num_components * nt, chunk)

    # (C*nt, chunk) x (nx*ny, chunk) -> (C*nt, nx*ny) on the MXU.
    out_ref[:] += jax.lax.dot_general(
        ut_q,
        lead_t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


@functools.partial(jax.jit, static_argnames=("histogram_shape", "interpret"))
def deposit_binspace_3d_pallas(
    normalized: Array,
    charges: Array,
    histogram_shape: tuple[int, int, int],
    interpret: bool = False,
) -> Array:
    """Pallas CIC deposit of ``C`` charge components at shared *bin-space*
    positions: ``normalized (B, N, 3)``, ``charges (B, C, N)`` -> grids
    ``(B, C, nx, ny, nt)`` (float32). No extent masking — out-of-grid corner
    weights vanish because no two-hot row matches (the adjoint semantics of
    :func:`gather_3d_pallas`)."""
    nx, ny, nt = histogram_shape
    num_lead = nx * ny
    chunk = _chunk_for(num_lead)

    batch, num_components, num_particles = charges.shape
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles
    if pad:
        # Park padding at -2: matches no bin row even after the +1 corner.
        normalized = jnp.pad(
            normalized, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0
        )
        charges = jnp.pad(charges, ((0, 0), (0, 0), (0, pad)))

    pos_t = jnp.swapaxes(normalized, -1, -2).astype(jnp.float32)  # (B, 3, Np)
    q_rows = charges.astype(jnp.float32)  # (B, C, Np)

    call = pl.pallas_call(
        functools.partial(_deposit_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((num_components * nt, num_lead), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_components, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_components * nt, num_lead), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    grids = jax.vmap(call)(pos_t, q_rows)  # (B, C*nt, nx*ny)
    # Rows are (C, nt), lead is (nx, ny): -> (B, C, nx, ny, nt).
    return jnp.moveaxis(
        grids.reshape(batch, num_components, nt, nx, ny), 2, -1
    )


def _binspace_and_mask(positions, charges, histogram_shape, extent):
    """Shared forward/adjoint preprocessing of the raw-coordinate deposit:
    bin-space positions, extent mask, masked charges, parked positions."""
    left = extent[:, None, :, 0]
    right = extent[:, None, :, 1]
    nb = jnp.asarray(histogram_shape, positions.dtype)
    scale = nb / (right - left)  # d(bin space)/d(position)
    in_bin_space = (positions - left) * scale - 0.5
    in_extent = jnp.all((positions >= left) & (positions <= right), axis=-1)
    masked_charges = charges * in_extent
    # Park padded/out-of-extent particles at -2 so neither two-hot row
    # matches even after the +1 corner (charge is already zero; this also
    # protects against NaN positions poisoning the iota comparison).
    safe = jnp.where(
        in_extent[..., None], in_bin_space, jnp.asarray(-2.0, positions.dtype)
    )
    return safe, masked_charges, in_extent, scale, left, right, nb


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
    safe, masked_charges, _, _, _, _, _ = _binspace_and_mask(
        positions, charges, histogram_shape, extent
    )
    grids = deposit_binspace_3d_pallas(
        safe, masked_charges[:, None, :], histogram_shape, interpret
    )
    return grids[:, 0]


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


def _gather_grads_kernel(
    pos_ref, g_ref, val_ref, dx_ref, dy_ref, dt_ref, *, nx, ny, nt, chunk
):
    """Gather the value AND its three bin-space position derivatives in one
    pass. The value matmul is shared with the t-derivative (same x/y lead,
    different t contraction); x/y derivatives each need one extra matmul with
    a derivative-two-hot lead — 3 MXU passes total for 4 outputs."""
    ux_t = _two_hot_t(pos_ref[0:1, :], nx, chunk)
    uy_t = _two_hot_t(pos_ref[1:2, :], ny, chunk)
    ut_t = _two_hot_t(pos_ref[2:3, :], nt, chunk)
    dux_t = _two_hot_grad_t(pos_ref[0:1, :], nx, chunk)
    duy_t = _two_hot_grad_t(pos_ref[1:2, :], ny, chunk)
    dut_t = _two_hot_grad_t(pos_ref[2:3, :], nt, chunk)

    num_components = g_ref.shape[0] // nt

    def contract(lead_t):
        # (C*nt, nx*ny) x (nx*ny, chunk) -> (C, nt, chunk) on the MXU.
        m = jax.lax.dot_general(
            g_ref[:],
            lead_t,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        return m.reshape(num_components, nt, chunk)

    m_val = contract((ux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk))
    val_ref[:] = jnp.sum(m_val * ut_t[None, :, :], axis=1)
    dt_ref[:] = jnp.sum(m_val * dut_t[None, :, :], axis=1)

    m_dx = contract((dux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk))
    dx_ref[:] = jnp.sum(m_dx * ut_t[None, :, :], axis=1)

    m_dy = contract((ux_t[:, None, :] * duy_t[None, :, :]).reshape(nx * ny, chunk))
    dy_ref[:] = jnp.sum(m_dy * ut_t[None, :, :], axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_grads_3d_pallas(
    grids: Array, normalized: Array, interpret: bool = False
) -> tuple[Array, Array, Array, Array]:
    """Pallas trilinear gather with bin-space position derivatives:
    ``grids (B, C, nx, ny, nt)``, ``normalized (B, N, 3)`` ->
    ``(value, d/dx, d/dy, d/dt)``, each ``(B, C, N)`` (float32).

    ``value`` equals :func:`gather_3d_pallas`; the derivative outputs are the
    a.e. partials of the gathered value w.r.t. the bin-space position — the
    building blocks of both CIC adjoints."""
    batch, num_components, nx, ny, nt = grids.shape
    num_lead = nx * ny
    # Three lead tiles live in VMEM at once — shrink the chunk accordingly.
    chunk = _chunk_for(num_lead * 3)

    num_particles = normalized.shape[1]
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles
    if pad:
        normalized = jnp.pad(
            normalized, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0
        )

    pos_t = jnp.swapaxes(normalized, -1, -2).astype(jnp.float32)
    g_rows = (
        jnp.moveaxis(grids, -1, 2)
        .reshape(batch, num_components * nt, num_lead)
        .astype(jnp.float32)
    )

    out_struct = jax.ShapeDtypeStruct(
        (num_components, num_chunks * chunk), jnp.float32
    )
    out_spec = pl.BlockSpec(
        (num_components, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        functools.partial(_gather_grads_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk),
        out_shape=(out_struct,) * 4,
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_components * nt, num_lead),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec,) * 4,
        interpret=interpret,
    )

    val, dx, dy, dt = jax.vmap(call)(pos_t, g_rows)
    n = num_particles
    return val[..., :n], dx[..., :n], dy[..., :n], dt[..., :n]


def pallas_deposit_available(histogram_shape) -> bool:
    """The kernel handles 3D grids whose (nx*ny, nt) accumulator fits VMEM."""
    return (
        ENABLED
        and len(histogram_shape) == 3
        and math.prod(histogram_shape) <= 65536
        and jax.default_backend() == "tpu"
    )


@functools.lru_cache(maxsize=None)
def differentiable_pallas_gather(interpret: bool = False):
    """Pallas gather whose reverse pass also runs on Pallas kernels.

    ``custom_vjp``: the grid cotangent is a CIC *deposit* of the value
    cotangents at the same positions (the adjoint of trilinear interpolation
    is trilinear deposition); the position cotangent contracts the value
    cotangents with the derivative-two-hot gathers. Forward-mode (``jax.jvp``)
    is unsupported through this wrapper — use the XLA path
    (``cloud_in_cell_gather_3d``) for forward-mode differentiation.
    """

    @jax.custom_vjp
    def gather(grids, normalized):
        return gather_3d_pallas(grids, normalized, interpret)

    def gather_fwd(grids, normalized):
        return gather_3d_pallas(grids, normalized, interpret), (grids, normalized)

    def gather_bwd(residuals, vbar):
        grids, normalized = residuals
        grids_bar = deposit_binspace_3d_pallas(
            normalized, vbar, grids.shape[2:], interpret
        )
        _, dx, dy, dt = gather_grads_3d_pallas(grids, normalized, interpret)
        normalized_bar = jnp.stack(
            [
                jnp.sum(vbar * dx, axis=1),
                jnp.sum(vbar * dy, axis=1),
                jnp.sum(vbar * dt, axis=1),
            ],
            axis=-1,
        )
        return grids_bar.astype(grids.dtype), normalized_bar.astype(
            normalized.dtype
        )

    gather.defvjp(gather_fwd, gather_bwd)
    return gather


@functools.lru_cache(maxsize=None)
def differentiable_pallas_deposit(
    histogram_shape: tuple[int, int, int], interpret: bool = False
):
    """Pallas deposit whose reverse pass also runs on Pallas kernels.

    ``custom_vjp``: the charge cotangent is a CIC *gather* of the grid
    cotangent at the particle positions (masked to the extent); the position
    cotangent is the charge-weighted derivative-two-hot gather, chain-ruled
    through the bin-space normalisation; the extent cotangent is the same
    per-particle bin-space cotangent contracted with
    ``d(bin)/d(left, right)``. Forward-mode (``jax.jvp``) is unsupported
    through this wrapper — use ``_deposit_tensor_product`` for that.
    """

    @jax.custom_vjp
    def deposit(positions, charges, extent):
        return deposit_3d_pallas(
            positions, charges, histogram_shape, extent, interpret
        )

    def deposit_fwd(positions, charges, extent):
        out = deposit_3d_pallas(
            positions, charges, histogram_shape, extent, interpret
        )
        return out, (positions, charges, extent)

    def deposit_bwd(residuals, gbar):
        positions, charges, extent = residuals
        safe, masked_charges, in_extent, scale, left, right, nb = (
            _binspace_and_mask(positions, charges, histogram_shape, extent)
        )
        val, dx, dy, dt = gather_grads_3d_pallas(
            gbar[:, None].astype(jnp.float32), safe, interpret
        )
        # Parked (out-of-extent) particles gather zero, but mask explicitly
        # so the charge cotangent is exact even at the extent boundary.
        charges_bar = val[:, 0] * in_extent

        # Cotangent w.r.t. the bin-space position, then chain rule through
        # bin = (pos - left) * nb/(right-left) - 0.5.
        bin_bar = (
            jnp.stack([dx[:, 0], dy[:, 0], dt[:, 0]], axis=-1)
            * masked_charges[..., None]
        )
        positions_bar = bin_bar * scale
        width = right - left
        left_bar = jnp.sum(
            bin_bar * nb * (positions - right) / jnp.square(width), axis=1
        )
        right_bar = jnp.sum(
            bin_bar * (-nb) * (positions - left) / jnp.square(width), axis=1
        )
        extent_bar = jnp.stack([left_bar, right_bar], axis=-1)
        return (
            positions_bar.astype(positions.dtype),
            charges_bar.astype(charges.dtype),
            extent_bar.astype(extent.dtype),
        )

    deposit.defvjp(deposit_fwd, deposit_bwd)
    return deposit
