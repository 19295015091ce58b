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


def _deposit_rows_kernel(pos_ref, rows_ref, out_ref, *, nx, ny, nt, chunk):
    """Tangent deposit: rows ``(4, chunk)`` = (qdot, q*bxdot, q*bydot,
    q*btdot) at shared bin-space positions -> accumulated tangent grid
    ``(nt, nx*ny)``. The value two-hot carries the charge tangent; the
    derivative two-hots carry the (charge-weighted) bin-space position
    tangents — the forward-mode dual of :func:`_gather_grads_kernel`."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    ux_t = _two_hot_t(pos_ref[0:1, :], nx, chunk)
    uy_t = _two_hot_t(pos_ref[1:2, :], ny, chunk)
    ut_t = _two_hot_t(pos_ref[2:3, :], nt, chunk)
    dux_t = _two_hot_grad_t(pos_ref[0:1, :], nx, chunk)
    duy_t = _two_hot_grad_t(pos_ref[1:2, :], ny, chunk)
    dut_t = _two_hot_grad_t(pos_ref[2:3, :], nt, chunk)

    qdot = rows_ref[0:1, :].astype(jnp.float32)
    qbx = rows_ref[1:2, :].astype(jnp.float32)
    qby = rows_ref[2:3, :].astype(jnp.float32)
    qbt = rows_ref[3:4, :].astype(jnp.float32)

    def contract(t_rows, lead_t):
        # (nt, chunk) x (nx*ny, chunk) -> (nt, nx*ny) on the MXU.
        return jax.lax.dot_general(
            t_rows,
            lead_t,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    # The t-derivative shares the value lead; x/y derivatives each need one
    # extra matmul with a derivative-two-hot lead — 3 MXU passes total.
    lead_val = (ux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk)
    acc = contract(qdot * ut_t + qbt * dut_t, lead_val)
    lead_dx = (dux_t[:, None, :] * uy_t[None, :, :]).reshape(nx * ny, chunk)
    acc += contract(qbx * ut_t, lead_dx)
    lead_dy = (ux_t[:, None, :] * duy_t[None, :, :]).reshape(nx * ny, chunk)
    acc += contract(qby * ut_t, lead_dy)
    out_ref[:] += acc


@functools.partial(jax.jit, static_argnames=("histogram_shape", "interpret"))
def deposit_rows_3d_pallas(
    normalized: Array,
    rows: Array,
    histogram_shape: tuple[int, int, int],
    interpret: bool = False,
) -> Array:
    """Pallas tangent deposit: bin-space positions ``normalized (B, N, 3)``,
    tangent rows ``rows (B, 4, N)`` = (charge tangent, charge * bin-space
    position tangent per axis) -> tangent grid ``(B, nx, ny, nt)`` (float32).

    This is the JVP of the CIC deposit w.r.t. (charges, bin positions); it is
    linear in ``rows``, and its transpose is exactly
    :func:`gather_grads_3d_pallas` (value + derivative gathers)."""
    nx, ny, nt = histogram_shape
    num_lead = nx * ny
    # Three lead tiles live in VMEM at once — shrink the chunk accordingly.
    chunk = _chunk_for(num_lead * 3)

    batch, _, num_particles = rows.shape
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles
    if pad:
        normalized = jnp.pad(
            normalized, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0
        )
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, pad)))

    pos_t = jnp.swapaxes(normalized, -1, -2).astype(jnp.float32)  # (B, 3, Np)
    row_vals = rows.astype(jnp.float32)  # (B, 4, Np)

    call = pl.pallas_call(
        functools.partial(_deposit_rows_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk),
        out_shape=jax.ShapeDtypeStruct((nt, num_lead), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (nt, num_lead), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    grids = jax.vmap(call)(pos_t, row_vals)  # (B, nt, nx*ny)
    return jnp.moveaxis(grids.reshape(batch, nt, nx, ny), 1, -1)


def pallas_deposit_available(histogram_shape) -> bool:
    """The kernel handles 3D grids whose (nx*ny, nt) accumulator fits VMEM."""
    return (
        ENABLED
        and len(histogram_shape) == 3
        and math.prod(histogram_shape) <= 65536
        and jax.default_backend() == "tpu"
    )


# ---------------------------------------------------------------------------
# JAX primitives: composable AD (grad AND jvp/jacfwd) + vmap on-kernel.
#
# The gather/deposit pair is registered as first-class primitives so every
# first-order transform stays on Pallas kernels:
#
# - value:      the forward kernels above,
# - jvp:        ``gather_grads_3d_pallas`` (value + derivative two-hots in
#               one pass) for position tangents, the linear kernels for
#               grid/charge tangents,
# - transpose:  deposit <-> gather adjoint pairing (the adjoint of trilinear
#               interpolation is trilinear deposition), which is how reverse
#               mode gets the same kernels the old ``custom_vjp`` used,
# - batching:   extra vmap dims fold into the kernels' native leading batch
#               axis and unfold after.
#
# Second-order AD (grad-of-grad) through these primitives is not
# implemented — differentiate the XLA formulation for that
# (``pallas_cic.ENABLED = False``).
# ---------------------------------------------------------------------------

from jax.extend import core as _jex_core  # noqa: E402
from jax.interpreters import ad as _ad  # noqa: E402
from jax.interpreters import batching as _batching  # noqa: E402
from jax.interpreters import mlir as _mlir  # noqa: E402

cic_gather_p = _jex_core.Primitive("cheetah_cic_gather")
cic_deposit_p = _jex_core.Primitive("cheetah_cic_deposit")
cic_deposit_rows_p = _jex_core.Primitive("cheetah_cic_deposit_rows")


def _f32_aval(shape):
    return jax.core.ShapedArray(shape, jnp.float32)


# --- gather: values (B, C, N) from grids (B, C, nx, ny, nt) ---------------

def _gather_impl(grids, normalized, *, interpret):
    return gather_3d_pallas(grids, normalized, interpret)


def _gather_abstract(grids, normalized, *, interpret):
    batch, num_components = grids.shape[:2]
    return _f32_aval((batch, num_components, normalized.shape[1]))


def _gather_jvp(primals, tangents, *, interpret):
    grids, normalized = primals
    gdot, ndot = tangents
    if isinstance(ndot, _ad.Zero):
        primal = cic_gather_p.bind(grids, normalized, interpret=interpret)
        tangent = (
            _ad.Zero(_gather_abstract(grids, normalized, interpret=interpret))
            if isinstance(gdot, _ad.Zero)
            else cic_gather_p.bind(gdot, normalized, interpret=interpret)
        )
        return primal, tangent
    # The grads kernel returns the value alongside the derivatives, so the
    # primal is free when a position tangent is present.
    val, dx, dy, dt = gather_grads_3d_pallas(grids, normalized, interpret)
    ndot = ndot.astype(jnp.float32)
    tangent = (
        dx * ndot[..., 0][:, None, :]
        + dy * ndot[..., 1][:, None, :]
        + dt * ndot[..., 2][:, None, :]
    )
    if not isinstance(gdot, _ad.Zero):
        tangent = tangent + cic_gather_p.bind(
            gdot, normalized, interpret=interpret
        )
    return val, tangent


def _gather_transpose(ct, grids, normalized, *, interpret):
    # Linear in grids; the adjoint of the trilinear gather is the trilinear
    # bin-space deposit of the value cotangents at the same positions.
    if not _ad.is_undefined_primal(grids) or _ad.is_undefined_primal(normalized):
        raise NotImplementedError(
            "cic_gather transpose is only defined w.r.t. the grids argument"
        )
    if isinstance(ct, _ad.Zero):
        return _ad.Zero(grids.aval), None
    grids_bar = deposit_binspace_3d_pallas(
        normalized, ct, grids.aval.shape[2:], interpret
    )
    return grids_bar.astype(grids.aval.dtype), None


# --- deposit: grid (B, nx, ny, nt) from raw coordinates -------------------

def _deposit_impl(positions, charges, extent, *, histogram_shape, interpret):
    return deposit_3d_pallas(positions, charges, histogram_shape, extent, interpret)


def _deposit_abstract(positions, charges, extent, *, histogram_shape, interpret):
    return _f32_aval((positions.shape[0], *histogram_shape))


def _deposit_jvp(primals, tangents, *, histogram_shape, interpret):
    positions, charges, extent = primals
    pdot, cdot, edot = tangents
    safe, masked_charges, in_extent, scale, left, right, nb = _binspace_and_mask(
        positions, charges, histogram_shape, extent
    )
    primal = deposit_binspace_3d_pallas(
        safe, masked_charges[:, None, :], histogram_shape, interpret
    )[:, 0]

    # Tangent of the bin-space position bin = (pos - left)*nb/width - 0.5:
    # d bin = scale*(pdot - ldot) - (pos - left)*nb/width^2 * (rdot - ldot).
    bindot = jnp.zeros_like(safe)
    if not isinstance(pdot, _ad.Zero):
        bindot = bindot + scale * pdot
    if not isinstance(edot, _ad.Zero):
        ldot = jnp.swapaxes(edot[..., 0:1], -1, -2)  # (B, 1, 3)
        rdot = jnp.swapaxes(edot[..., 1:2], -1, -2)
        width = right - left
        bindot = bindot - scale * ldot - (positions - left) * nb / jnp.square(
            width
        ) * (rdot - ldot)

    qdot_row = (
        jnp.zeros_like(masked_charges)
        if isinstance(cdot, _ad.Zero)
        else cdot * in_extent
    )
    rows = jnp.stack(
        [
            qdot_row,
            masked_charges * bindot[..., 0],
            masked_charges * bindot[..., 1],
            masked_charges * bindot[..., 2],
        ],
        axis=1,
    )
    tangent = cic_deposit_rows_p.bind(
        safe, rows, histogram_shape=tuple(histogram_shape), interpret=interpret
    )
    return primal, tangent


def _deposit_transpose(ct, positions, charges, extent, *, histogram_shape, interpret):
    # Only the charges argument is linear. (First-order tangent graphs route
    # position/extent tangents through cic_deposit_rows instead.)
    if (
        _ad.is_undefined_primal(positions)
        or not _ad.is_undefined_primal(charges)
        or _ad.is_undefined_primal(extent)
    ):
        raise NotImplementedError(
            "cic_deposit transpose is only defined w.r.t. the charges argument"
        )
    if isinstance(ct, _ad.Zero):
        return None, _ad.Zero(charges.aval), None
    safe, _, in_extent, *_ = _binspace_and_mask(
        positions, jnp.zeros(positions.shape[:-1], positions.dtype),
        histogram_shape, extent,
    )
    val = gather_3d_pallas(ct[:, None].astype(jnp.float32), safe, interpret)
    charges_bar = val[:, 0] * in_extent
    return None, charges_bar.astype(charges.aval.dtype), None


# --- deposit_rows: the (linear) tangent deposit ----------------------------

def _deposit_rows_impl(normalized, rows, *, histogram_shape, interpret):
    return deposit_rows_3d_pallas(normalized, rows, histogram_shape, interpret)


def _deposit_rows_abstract(normalized, rows, *, histogram_shape, interpret):
    return _f32_aval((normalized.shape[0], *histogram_shape))


def _deposit_rows_jvp_rows(rows_dot, normalized, rows, *, histogram_shape, interpret):
    return cic_deposit_rows_p.bind(
        normalized, rows_dot, histogram_shape=histogram_shape, interpret=interpret
    )


def _deposit_rows_transpose(ct, normalized, rows, *, histogram_shape, interpret):
    if _ad.is_undefined_primal(normalized) or not _ad.is_undefined_primal(rows):
        raise NotImplementedError(
            "cic_deposit_rows transpose is only defined w.r.t. the rows argument"
        )
    if isinstance(ct, _ad.Zero):
        return None, _ad.Zero(rows.aval)
    val, dx, dy, dt = gather_grads_3d_pallas(
        ct[:, None].astype(jnp.float32), normalized, interpret
    )
    rows_bar = jnp.concatenate([val, dx, dy, dt], axis=1)  # (B, 4, N)
    return None, rows_bar.astype(rows.aval.dtype)


# --- batching: fold extra vmap dims into the native leading batch axis ----

def _fold_batch(x, dim, batch_size):
    if dim is _batching.not_mapped:
        x = jnp.broadcast_to(x[None], (batch_size, *x.shape))
    elif dim != 0:
        x = jnp.moveaxis(x, dim, 0)
    return x.reshape(x.shape[0] * x.shape[1], *x.shape[2:])


def _make_batcher(prim):
    def batcher(args, dims, **params):
        batch_size = next(
            a.shape[d] for a, d in zip(args, dims) if d is not _batching.not_mapped
        )
        folded = [_fold_batch(a, d, batch_size) for a, d in zip(args, dims)]
        out = prim.bind(*folded, **params)
        return out.reshape(batch_size, -1, *out.shape[1:]), 0

    return batcher


for _prim, _impl, _abstract in [
    (cic_gather_p, _gather_impl, _gather_abstract),
    (cic_deposit_p, _deposit_impl, _deposit_abstract),
    (cic_deposit_rows_p, _deposit_rows_impl, _deposit_rows_abstract),
]:
    _prim.def_impl(_impl)
    _prim.def_abstract_eval(_abstract)
    _mlir.register_lowering(_prim, _mlir.lower_fun(_impl, multiple_results=False))
    _batching.primitive_batchers[_prim] = _make_batcher(_prim)

_ad.primitive_jvps[cic_gather_p] = _gather_jvp
_ad.primitive_transposes[cic_gather_p] = _gather_transpose
_ad.primitive_jvps[cic_deposit_p] = _deposit_jvp
_ad.primitive_transposes[cic_deposit_p] = _deposit_transpose
_ad.defjvp(cic_deposit_rows_p, None, _deposit_rows_jvp_rows)
_ad.primitive_transposes[cic_deposit_rows_p] = _deposit_rows_transpose


@functools.lru_cache(maxsize=None)
def differentiable_pallas_gather(interpret: bool = False):
    """Pallas gather with full first-order AD on-kernel.

    Bound as the :data:`cic_gather_p` primitive: reverse mode deposits the
    value cotangents (the adjoint of trilinear interpolation is trilinear
    deposition) and contracts derivative-two-hot gathers for the position
    cotangent — identical kernels to the former ``custom_vjp``; forward mode
    (``jax.jvp`` / ``jax.jacfwd``) runs :func:`gather_grads_3d_pallas`; extra
    ``vmap`` dims fold into the kernels' leading batch axis.
    """

    def gather(grids, normalized):
        return cic_gather_p.bind(grids, normalized, interpret=interpret)

    return gather


@functools.lru_cache(maxsize=None)
def differentiable_pallas_deposit(
    histogram_shape: tuple[int, int, int], interpret: bool = False
):
    """Pallas deposit with full first-order AD on-kernel.

    Bound as the :data:`cic_deposit_p` primitive: reverse mode gathers the
    grid cotangent at the particle positions (charge cotangent) and
    chain-rules the derivative-two-hot gathers through the bin-space
    normalisation (position/extent cotangents); forward mode deposits the
    charge/position tangents via :func:`deposit_rows_3d_pallas`; extra
    ``vmap`` dims fold into the kernels' leading batch axis.
    """

    def deposit(positions, charges, extent):
        return cic_deposit_p.bind(
            positions,
            charges,
            extent,
            histogram_shape=tuple(histogram_shape),
            interpret=interpret,
        )

    return deposit
