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

Both directions are a single *multi-order* kernel pair parameterised by a
static set of per-axis derivative orders (0 = the hat weight, 1 = its a.e.
derivative; order >= 2 is identically zero a.e. because the hat is piecewise
linear). The pair is bound as JAX primitives whose jvp and transpose rules
re-bind the same primitives at raised orders, so autodiff of ANY order and
direction — ``grad``, ``jvp``/``jacfwd``, ``jacrev``, ``hessian``, and their
compositions — stays on Pallas kernels, with orders sharing an (x, y) lead
sharing its MXU matmul.

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
from jax.extend import core as _jex_core
from jax.interpreters import ad as _ad
from jax.interpreters import batching as _batching
from jax.interpreters import mlir as _mlir

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


def _axis_factor(pos_row: Array, num_bins: int, chunk: int, order: int) -> Array:
    return (
        _two_hot_t(pos_row, num_bins, chunk)
        if order == 0
        else _two_hot_grad_t(pos_row, num_bins, chunk)
    )


def _num_leads(orders) -> int:
    return len({(ox, oy) for ox, oy, _ in orders})


def _axis_factors(pos_ref, nx, ny, nt, chunk, orders):
    """One two-hot factor per distinct (axis, order) in the order set."""
    fx = {
        o: _axis_factor(pos_ref[0:1, :], nx, chunk, o)
        for o in sorted({ox for ox, _, _ in orders})
    }
    fy = {
        o: _axis_factor(pos_ref[1:2, :], ny, chunk, o)
        for o in sorted({oy for _, oy, _ in orders})
    }
    ft = {
        o: _axis_factor(pos_ref[2:3, :], nt, chunk, o)
        for o in sorted({ot for _, _, ot in orders})
    }
    return fx, fy, ft


# ---------------------------------------------------------------------------
# The multi-order kernel pair.
# ---------------------------------------------------------------------------


def _gather_multi_values(pos_ref, g_ref, *, nx, ny, nt, chunk, orders):
    """Shared gather computation (also used by the x-tiled kernels in
    :mod:`cheetah_tpu.ops.pallas_cic_tiled`, with ``nx`` = window rows):
    one ``(C, chunk)`` array per order."""
    fx, fy, ft = _axis_factors(pos_ref, nx, ny, nt, chunk, orders)
    num_components = g_ref.shape[0] // nt

    lead_m: dict[tuple[int, int], Array] = {}
    values = []
    for ox, oy, ot in orders:
        if (ox, oy) not in lead_m:
            lead = (fx[ox][:, None, :] * fy[oy][None, :, :]).reshape(
                nx * ny, chunk
            )
            # (C*nt, nx*ny) x (nx*ny, chunk) -> (C, nt, chunk) on the MXU.
            lead_m[(ox, oy)] = jax.lax.dot_general(
                g_ref[:],
                lead,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(num_components, nt, chunk)
        values.append(jnp.sum(lead_m[(ox, oy)] * ft[ot][None, :, :], axis=1))
    return values


def _gather_multi_kernel(pos_ref, g_ref, *out_refs, nx, ny, nt, chunk, orders):
    """Gather one output per derivative order: ``g_ref (C*nt, nx*ny)`` ->
    each ``out (C, chunk)``. Orders sharing an (x, y) lead share its MXU
    matmul (the t-axis order only changes the elementwise contraction), so
    the first-order set ``{value, d/dx, d/dy, d/dt}`` costs 3 MXU passes for
    4 outputs."""
    values = _gather_multi_values(
        pos_ref, g_ref, nx=nx, ny=ny, nt=nt, chunk=chunk, orders=orders
    )
    for out_ref, value in zip(out_refs, values):
        out_ref[:] = value


def _deposit_multi_acc(pos_ref, rows_ref, *, nx, ny, nt, chunk, orders):
    """Shared deposit computation (also used by the x-tiled kernels in
    :mod:`cheetah_tpu.ops.pallas_cic_tiled`, with ``nx`` = window rows):
    returns this chunk's ``(C*nt, nx*ny)`` grid contribution — the caller
    accumulates it into the revisited output block."""
    fx, fy, ft = _axis_factors(pos_ref, nx, ny, nt, chunk, orders)
    num_components = rows_ref.shape[0] // len(orders)

    by_lead: dict[tuple[int, int], Array] = {}
    for idx, (ox, oy, ot) in enumerate(orders):
        rows = rows_ref[
            idx * num_components : (idx + 1) * num_components, :
        ].astype(jnp.float32)
        term = (rows[:, None, :] * ft[ot][None, :, :]).reshape(
            num_components * nt, chunk
        )
        key = (ox, oy)
        by_lead[key] = term if key not in by_lead else by_lead[key] + term

    acc = None
    for (ox, oy), operand in by_lead.items():
        lead = (fx[ox][:, None, :] * fy[oy][None, :, :]).reshape(nx * ny, chunk)
        # (C*nt, chunk) x (nx*ny, chunk) -> (C*nt, nx*ny) on the MXU.
        part = jax.lax.dot_general(
            operand,
            lead,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        acc = part if acc is None else acc + part
    return acc


def _deposit_multi_kernel(pos_ref, rows_ref, out_ref, *, nx, ny, nt, chunk, orders):
    """Deposit the SUM over derivative orders: per-order row blocks
    ``rows_ref (O*C, chunk)`` -> accumulated ``out (C*nt, nx*ny)``. Orders
    sharing an (x, y) lead are summed in the ``(C*nt, chunk)`` operand before
    the shared matmul — the exact transpose of :func:`_gather_multi_kernel`'s
    sharing."""

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += _deposit_multi_acc(
        pos_ref, rows_ref, nx=nx, ny=ny, nt=nt, chunk=chunk, orders=orders
    )


@functools.partial(jax.jit, static_argnames=("orders", "interpret"))
def gather_multi_3d_pallas(
    grids: Array,
    normalized: Array,
    orders: tuple[tuple[int, int, int], ...],
    interpret: bool = False,
) -> tuple[Array, ...]:
    """Pallas multi-order gather: ``grids (B, C, nx, ny, nt)``, bin-space
    positions ``normalized (B, N, 3)`` -> one ``(B, C, N)`` float32 array per
    derivative order (0 = hat weight, 1 = its a.e. derivative, per axis)."""
    batch, num_components, nx, ny, nt = grids.shape
    if not _fits_untiled((nx, ny, nt)):
        # Grids past the whole-grid-in-VMEM bound: sort-by-x-tile kernels.
        from cheetah_tpu.ops.pallas_cic_tiled import gather_multi_tiled_pallas

        return gather_multi_tiled_pallas(grids, normalized, orders, interpret)
    num_lead = nx * ny
    chunk = _chunk_for(num_lead * _num_leads(orders))

    # Trace the kernel with x64 semantics OFF regardless of the global
    # config: everything inside is explicitly f32/int32, but under
    # jax_enable_x64 the BlockSpec index maps trace their literals as i64,
    # which Mosaic refuses to legalize ("failed to legalize operation
    # 'func.return'"). The surrounding physics keeps whatever precision the
    # caller configured.
    with jax.enable_x64(False):
        return _gather_multi_x32(grids, normalized, orders, interpret, chunk)


def _gather_multi_x32(grids, normalized, orders, interpret, chunk):
    batch, num_components, nx, ny, nt = grids.shape
    num_lead = nx * ny

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

    out_struct = jax.ShapeDtypeStruct(
        (num_components, num_chunks * chunk), jnp.float32
    )
    out_spec = pl.BlockSpec(
        (num_components, chunk), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    call = pl.pallas_call(
        functools.partial(
            _gather_multi_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk, orders=orders
        ),
        out_shape=(out_struct,) * len(orders),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_components * nt, num_lead),
                lambda i: (0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(out_spec,) * len(orders),
        interpret=interpret,
    )

    outs = jax.vmap(call)(pos_t, g_rows)
    return tuple(o[..., :num_particles] for o in outs)


@functools.partial(jax.jit, static_argnames=("histogram_shape", "orders", "interpret"))
def deposit_multi_3d_pallas(
    normalized: Array,
    rows: Array,
    histogram_shape: tuple[int, int, int],
    orders: tuple[tuple[int, int, int], ...],
    interpret: bool = False,
) -> Array:
    """Pallas multi-order deposit: bin-space positions ``normalized
    (B, N, 3)``, per-order row blocks ``rows (B, O, C, N)`` -> the summed
    grid ``(B, C, nx, ny, nt)`` (float32). Linear in ``rows``; its transpose
    is exactly :func:`gather_multi_3d_pallas` at the same orders."""
    nx, ny, nt = histogram_shape
    if not _fits_untiled((nx, ny, nt)):
        # Grids past the whole-grid-in-VMEM bound: sort-by-x-tile kernels.
        from cheetah_tpu.ops.pallas_cic_tiled import deposit_multi_tiled_pallas

        return deposit_multi_tiled_pallas(
            normalized, rows, histogram_shape, orders, interpret
        )
    num_lead = nx * ny
    chunk = _chunk_for(num_lead * _num_leads(orders))

    # See gather_multi_3d_pallas: trace with x64 OFF so the index maps stay
    # i32 (Mosaic cannot legalize the i64 literals jax_enable_x64 produces).
    with jax.enable_x64(False):
        return _deposit_multi_x32(normalized, rows, histogram_shape, orders, interpret, chunk)


def _deposit_multi_x32(normalized, rows, histogram_shape, orders, interpret, chunk):
    nx, ny, nt = histogram_shape
    num_lead = nx * ny

    batch, num_orders, num_components, num_particles = rows.shape
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles
    if pad:
        # Park padding at -2: matches no bin row even after the +1 corner.
        normalized = jnp.pad(
            normalized, ((0, 0), (0, pad), (0, 0)), constant_values=-2.0
        )
        rows = jnp.pad(rows, ((0, 0), (0, 0), (0, 0), (0, pad)))

    pos_t = jnp.swapaxes(normalized, -1, -2).astype(jnp.float32)  # (B, 3, Np)
    row_vals = rows.reshape(batch, num_orders * num_components, -1).astype(
        jnp.float32
    )

    call = pl.pallas_call(
        functools.partial(
            _deposit_multi_kernel, nx=nx, ny=ny, nt=nt, chunk=chunk, orders=orders
        ),
        out_shape=jax.ShapeDtypeStruct((num_components * nt, num_lead), jnp.float32),
        grid=(num_chunks,),
        in_specs=[
            pl.BlockSpec((3, chunk), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (num_orders * num_components, chunk),
                lambda i: (0, i),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (num_components * nt, num_lead), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )

    grids = jax.vmap(call)(pos_t, row_vals)  # (B, C*nt, nx*ny)
    return jnp.moveaxis(
        grids.reshape(batch, num_components, nt, nx, ny), 2, -1
    )


# ---------------------------------------------------------------------------
# Single-order instantiations (the building blocks the rest of the framework
# and the micro-benchmarks call directly).
# ---------------------------------------------------------------------------

_VALUE = ((0, 0, 0),)
_GRADS = ((0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1))


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
    return deposit_multi_3d_pallas(
        normalized, charges[:, None], histogram_shape, _VALUE, interpret
    )


def _binspace_and_mask(positions, charges, histogram_shape, extent):
    """Shared preprocessing of the raw-coordinate deposit: bin-space
    positions, extent mask, masked charges, parked positions. Plain ``jnp``
    ops, so autodiff of any order chains through it."""
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
    safe, masked_charges, *_ = _binspace_and_mask(
        positions, charges, histogram_shape, extent
    )
    return deposit_binspace_3d_pallas(
        safe, masked_charges[:, None, :], histogram_shape, interpret
    )[:, 0]


def gather_3d_pallas(
    grids: Array, normalized: Array, interpret: bool = False
) -> Array:
    """Pallas trilinear gather: ``grids (B, C, nx, ny, nt)``, bin-space
    positions ``normalized (B, N, 3)`` -> values ``(B, C, N)`` (float32).

    Semantics identical to ``cloud_in_cell_gather_3d`` (out-of-grid corners
    contribute zero because no two-hot row matches).
    """
    (out,) = gather_multi_3d_pallas(grids, normalized, _VALUE, interpret)
    return out


def gather_grads_3d_pallas(
    grids: Array, normalized: Array, interpret: bool = False
) -> tuple[Array, Array, Array, Array]:
    """Pallas trilinear gather with bin-space position derivatives:
    ``grids (B, C, nx, ny, nt)``, ``normalized (B, N, 3)`` ->
    ``(value, d/dx, d/dy, d/dt)``, each ``(B, C, N)`` (float32).

    ``value`` equals :func:`gather_3d_pallas`; the derivative outputs are the
    a.e. partials of the gathered value w.r.t. the bin-space position — the
    building blocks of both CIC adjoints (3 MXU passes for 4 outputs)."""
    return gather_multi_3d_pallas(grids, normalized, _GRADS, interpret)


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
    return deposit_multi_3d_pallas(
        normalized, rows[:, :, None, :], histogram_shape, _GRADS, interpret
    )[:, 0]


def _fits_untiled(histogram_shape) -> bool:
    """Whole-grid-in-VMEM bounds (f32, worst case = the first-order gradient
    set ``_GRADS`` with 3 distinct (x, y) leads and up to 4 components):

    - ``nx * ny <= 4096``: the lead tiles are ``(nx*ny, chunk)`` with
      ``chunk`` floored at 128, so 3 leads cost ``3 * nx*ny * 128 * 4``
      bytes — 6.3 MB at 4096.
    - ``nx * ny * nt <= 262144``: the revisited accumulator / grid operand
      is ``(C*nt, nx*ny)`` — 4 MB at 262144 cells with C = 4.

    Together ~12 MB of the ~16 MB VMEM at the 64^3 corner.
    """
    return (
        len(histogram_shape) == 3
        and histogram_shape[0] * histogram_shape[1] <= 4096
        and math.prod(histogram_shape) <= 262144
    )


def pallas_deposit_available(histogram_shape) -> bool:
    """The kernels handle any 3D grid whose x-tile *window* fits VMEM.

    Grids within :func:`_fits_untiled` (up to the 64^3 corner; the
    reference's examples use 32^3) keep the whole grid resident in VMEM.
    Larger grids — 128^3, 256^3, anisotropic shapes — dispatch to the
    sort-by-x-tile kernels (:mod:`cheetah_tpu.ops.pallas_cic_tiled`), whose
    bounds only constrain the trailing axes: ``2 * ny <= 4096``,
    ``2 * ny * nt <= 262144`` and ``nt <= 512`` (the minimal two-row window
    must fit the same VMEM budget). Beyond THAT — e.g. ny*nt past 128k —
    ``SpaceChargeKick`` falls back to the 8-corner gather / scatter deposit.
    """
    if not (ENABLED and jax.default_backend() == "tpu"):
        return False
    if _fits_untiled(histogram_shape):
        return True
    from cheetah_tpu.ops.pallas_cic_tiled import tiled_bounds_ok

    return tiled_bounds_ok(histogram_shape)


# ---------------------------------------------------------------------------
# JAX primitives: autodiff of ANY order + vmap, all on-kernel.
#
# The multi-order gather/deposit pair is closed under differentiation:
#
# - jvp:        a position tangent of an order-``o`` term is the sum over
#               axes with ``o[axis] == 0`` of the ``o + e_axis`` term times
#               the axis tangent (raising an axis already at order 1 is
#               identically zero a.e. — the hat weight is piecewise linear).
#               Both rules re-bind the SAME primitives at the raised orders
#               (the gather rule binds the primal and the raised set as two
#               calls — measured 3x faster than one fused union kernel on
#               first-order value_and_grad; the deposit rule's tangent is a
#               single summed deposit, which transposes well).
# - transpose:  deposit <-> gather at identical orders (the adjoint of
#               interpolation is deposition, order by order).
# - batching:   extra vmap dims fold into the kernels' native leading batch
#               axis and unfold after.
#
# Because every rule only ever emits these two primitives plus elementwise
# glue, ``grad``, ``jvp``/``jacfwd``, ``jacrev``, ``jax.hessian`` and any
# composition thereof stay on Pallas kernels, terminating at orders
# ``(1, 1, 1)``.
# ---------------------------------------------------------------------------

cic_gather_multi_p = _jex_core.Primitive("cheetah_cic_gather_multi")
cic_gather_multi_p.multiple_results = True
cic_deposit_multi_p = _jex_core.Primitive("cheetah_cic_deposit_multi")


def _f32_aval(shape):
    return jax.core.ShapedArray(shape, jnp.float32)


def _raised(order):
    """(axis, raised-order) pairs, dropping axes already at order 1 (whose
    raise is identically zero a.e.)."""
    out = []
    for axis in range(3):
        if order[axis] == 0:
            out.append(
                (axis, tuple(order[a] + (1 if a == axis else 0) for a in range(3)))
            )
    return out


# --- gather_multi ----------------------------------------------------------


def _gather_multi_impl(grids, normalized, *, orders, interpret):
    return gather_multi_3d_pallas(grids, normalized, orders, interpret)


def _gather_multi_abstract(grids, normalized, *, orders, interpret):
    batch, num_components = grids.shape[:2]
    aval = _f32_aval((batch, num_components, normalized.shape[1]))
    return [aval] * len(orders)


def _gather_multi_jvp(primals, tangents, *, orders, interpret):
    grids, normalized = primals
    gdot, ndot = tangents
    has_n = not isinstance(ndot, _ad.Zero)

    # The primal binds at its own orders; the position tangent's raised-order
    # gathers bind SEPARATELY (deduplicated). Fusing both into one union
    # kernel measured 3x slower end-to-end on first-order value_and_grad
    # (0.37 vs 0.13 ms on the 100k/32^3 microbench, scripts/sc_grad_anatomy.py
    # + /tmp bisection, round 4): the split keeps the primal value kernel at
    # its wide particle chunk and out of the multi-lead kernel's schedule.
    primal_out = list(
        cic_gather_multi_p.bind(grids, normalized, orders=orders, interpret=interpret)
    )

    raised_outs: dict[tuple[int, int, int], Array] = {}
    if has_n:
        need: list[tuple[int, int, int]] = []
        for o in orders:
            for _, r in _raised(o):
                if r not in need:
                    need.append(r)
        if need:
            outs_r = cic_gather_multi_p.bind(
                grids, normalized, orders=tuple(need), interpret=interpret
            )
            raised_outs = dict(zip(need, outs_r))

    if not isinstance(gdot, _ad.Zero):
        g_terms = cic_gather_multi_p.bind(
            gdot, normalized, orders=orders, interpret=interpret
        )
    ndot32 = ndot.astype(jnp.float32) if has_n else None

    tangent_out = []
    for i, o in enumerate(orders):
        t = None
        if has_n:
            for axis, r in _raised(o):
                term = raised_outs[r] * ndot32[..., axis][:, None, :]
                t = term if t is None else t + term
        if not isinstance(gdot, _ad.Zero):
            t = g_terms[i] if t is None else t + g_terms[i]
        tangent_out.append(_ad.Zero(_f32_aval(primal_out[i].shape)) if t is None else t)
    return primal_out, tangent_out


def _gather_multi_transpose(cts, grids, normalized, *, orders, interpret):
    # Linear in grids; the adjoint of the order-o gather is the order-o
    # bin-space deposit of the cotangents at the same positions.
    if not _ad.is_undefined_primal(grids) or _ad.is_undefined_primal(normalized):
        raise NotImplementedError(
            "cic_gather_multi transpose is only defined w.r.t. the grids argument"
        )
    live = [(ct, o) for ct, o in zip(cts, orders) if not isinstance(ct, _ad.Zero)]
    if not live:
        return _ad.Zero(grids.aval), None
    rows = jnp.stack([ct for ct, _ in live], axis=1)  # (B, O', C, N)
    grids_bar = cic_deposit_multi_p.bind(
        normalized,
        rows,
        histogram_shape=grids.aval.shape[2:],
        orders=tuple(o for _, o in live),
        interpret=interpret,
    )
    return grids_bar.astype(grids.aval.dtype), None


# --- deposit_multi ---------------------------------------------------------


def _deposit_multi_impl(normalized, rows, *, histogram_shape, orders, interpret):
    return deposit_multi_3d_pallas(normalized, rows, histogram_shape, orders, interpret)


def _deposit_multi_abstract(normalized, rows, *, histogram_shape, orders, interpret):
    if rows.shape[1] != len(orders):
        raise ValueError(
            f"cic_deposit_multi: rows axis 1 ({rows.shape[1]}) must match the "
            f"number of derivative orders ({len(orders)}): {orders}"
        )
    return _f32_aval((rows.shape[0], rows.shape[2], *histogram_shape))


def _deposit_multi_jvp(primals, tangents, *, histogram_shape, orders, interpret):
    normalized, rows = primals
    ndot, rdot = tangents
    primal = cic_deposit_multi_p.bind(
        normalized, rows, histogram_shape=histogram_shape, orders=orders,
        interpret=interpret,
    )
    # The output sums over orders, so BOTH tangent contributions fuse into
    # one deposit: the rows tangent at the original orders concatenated with
    # the (rows * position-tangent) blocks at the raised orders.
    tan_orders: list[tuple[int, int, int]] = []
    tan_rows = []
    if not isinstance(rdot, _ad.Zero):
        tan_orders.extend(orders)
        tan_rows.append(rdot.astype(jnp.float32))
    if not isinstance(ndot, _ad.Zero):
        ndot32 = ndot.astype(jnp.float32)
        acc: dict[tuple[int, int, int], Array] = {}
        for i, o in enumerate(orders):
            for axis, r in _raised(o):
                term = (
                    rows[:, i].astype(jnp.float32)
                    * ndot32[..., axis][:, None, :]
                )
                acc[r] = term if r not in acc else acc[r] + term
        if acc:
            tan_orders.extend(acc.keys())
            tan_rows.append(jnp.stack(list(acc.values()), axis=1))
    if not tan_orders:
        return primal, _ad.Zero(_f32_aval(primal.shape))
    tangent = cic_deposit_multi_p.bind(
        normalized,
        jnp.concatenate(tan_rows, axis=1) if len(tan_rows) > 1 else tan_rows[0],
        histogram_shape=histogram_shape,
        orders=tuple(tan_orders),
        interpret=interpret,
    )
    return primal, tangent


def _deposit_multi_transpose(ct, normalized, rows, *, histogram_shape, orders, interpret):
    # Only the rows argument is linear. (Tangent graphs route position
    # tangents through raised-order deposits of primal-valued rows.)
    if _ad.is_undefined_primal(normalized) or not _ad.is_undefined_primal(rows):
        raise NotImplementedError(
            "cic_deposit_multi transpose is only defined w.r.t. the rows argument"
        )
    if isinstance(ct, _ad.Zero):
        return None, _ad.Zero(rows.aval)
    outs = cic_gather_multi_p.bind(
        ct.astype(jnp.float32), normalized, orders=orders, interpret=interpret
    )
    rows_bar = jnp.stack(outs, axis=1)  # (B, O, C, N)
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
        outs = prim.bind(*folded, **params)
        if not prim.multiple_results:
            return outs.reshape(batch_size, -1, *outs.shape[1:]), 0
        unfolded = [o.reshape(batch_size, -1, *o.shape[1:]) for o in outs]
        return unfolded, [0] * len(unfolded)

    return batcher


for _prim, _impl, _abstract in [
    (cic_gather_multi_p, _gather_multi_impl, _gather_multi_abstract),
    (cic_deposit_multi_p, _deposit_multi_impl, _deposit_multi_abstract),
]:
    _prim.def_impl(_impl)
    _prim.def_abstract_eval(_abstract)
    _mlir.register_lowering(
        _prim, _mlir.lower_fun(_impl, multiple_results=_prim.multiple_results)
    )
    _batching.primitive_batchers[_prim] = _make_batcher(_prim)

_ad.primitive_jvps[cic_gather_multi_p] = _gather_multi_jvp
_ad.primitive_transposes[cic_gather_multi_p] = _gather_multi_transpose
_ad.primitive_jvps[cic_deposit_multi_p] = _deposit_multi_jvp
_ad.primitive_transposes[cic_deposit_multi_p] = _deposit_multi_transpose


@functools.lru_cache(maxsize=None)
def differentiable_pallas_gather(interpret: bool = False):
    """Pallas gather with autodiff of any order on-kernel.

    Bound as the :data:`cic_gather_multi_p` primitive: reverse mode deposits
    the cotangents order-by-order (the adjoint of interpolation is
    deposition), forward mode gathers at raised derivative orders, extra
    ``vmap`` dims fold into the kernels' leading batch axis — and every rule
    re-binds the same primitives, so arbitrary compositions (``grad``,
    ``jacfwd``, ``jax.hessian``, ...) stay on Pallas kernels.
    """

    def gather(grids, normalized):
        (out,) = cic_gather_multi_p.bind(
            grids, normalized, orders=_VALUE, interpret=interpret
        )
        return out

    return gather


@functools.lru_cache(maxsize=None)
def differentiable_pallas_deposit(
    histogram_shape: tuple[int, int, int], interpret: bool = False
):
    """Pallas deposit with autodiff of any order on-kernel.

    The raw-coordinate -> bin-space normalisation and extent masking are
    plain ``jnp`` ops (differentiable to any order by construction); the
    deposit itself is the :data:`cic_deposit_multi_p` primitive, whose jvp
    and transpose re-bind the same kernel pair at raised derivative orders.
    """

    def deposit(positions, charges, extent):
        safe, masked_charges, *_ = _binspace_and_mask(
            positions, charges, histogram_shape, extent
        )
        grid = cic_deposit_multi_p.bind(
            safe,
            masked_charges[:, None, None, :],
            histogram_shape=tuple(histogram_shape),
            orders=_VALUE,
            interpret=interpret,
        )
        return grid[:, 0]

    return deposit
