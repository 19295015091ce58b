"""x-tiled Pallas CIC kernels for grids past the untiled VMEM bound.

The untiled kernels in :mod:`cheetah_tpu.ops.pallas_cic` keep the whole
``(C*nt, nx*ny)`` grid resident in VMEM, which caps them at ~64^3 cells.
The reference's ``scatter_add_`` deposit handles arbitrary ``grid_shape`` at
uniform cost on its backends (ref ``cheetah/utils/cloud_in_cell.py:8-64``,
``cheetah/accelerator/space_charge_kick.py:531-547``); on TPU the equivalent
scatter path is serialised and measured 22-36x slower (PERF_NOTES.md). This
module keeps large grids — 128^3, 256^3, anisotropic shapes like
128x128x64 — on the MXU by tiling the leading (x) grid axis:

1. **Sort, payload-along** (one ``jax.lax.sort``): each particle's x-tile
   (the R-row slab its lower CIC corner falls in) is the key; positions,
   row values and the unsort index ride as sort payload. Crucially there is
   NO gather/permutation glue anywhere — a 1M-row ``take_along_axis`` costs
   5-44 ms on TPU while a 1M multi-operand sort costs a flat ~11 ms
   regardless of payload width (measured, this round).
2. **Visits**: the sorted particle chunks are NOT padded to tile
   boundaries. Instead a chunk is *visited* once per x-tile it spans (at
   most ``num_chunks + T`` visits total, since tile spans of consecutive
   chunks overlap in at most one tile). A ``PrefetchScalarGridSpec`` carries
   the per-visit (chunk, tile) pair; particles of other tiles park
   themselves in-kernel (their window-local x matches no two-hot row).
   Consecutive visits share either the output block (deposit: all chunks of
   one tile) or the input chunk (gather: all tiles of one chunk), so the
   revisited VMEM accumulator pattern applies in both directions.
3. **Kernel**: the SAME multi-order kernel bodies as the untiled pair, with
   ``nx`` = the (R+1)-row tile window (a particle in tile rows
   ``[t*R, (t+1)*R)`` touches rows up to ``(t+1)*R``, so windows overlap by
   one halo row; an extra dummy window indexed ``T`` absorbs padding/dummy
   visits).
4. **Fold / window build** (XLA, linear): the deposit's per-tile windows
   are summed into the physical grid by one static halo add (windows of
   never-visited empty tiles are masked out — their blocks were never
   written); the gather's input windows are built by one static strided
   row-take. Both are linear, so the tiled deposit and gather are exact
   adjoints of each other — the primitives in ``pallas_cic`` dispatch here
   by grid size and their existing jvp / transpose / batching rules apply
   unchanged.

Smaller windows mean fewer MXU FLOPs per particle (work scales with
``(R+1)*ny*nt``, not ``nx*ny*nt``), so past the untiled bound this path is
not a compromise: at 128^3 the kernels do ~8x less matmul work per particle
than the untiled kernel does at 64^3 (deposit kernel alone: 0.7 ms at
128^3/1M). The sorts dominate the cost; the gather pays a second sort to
restore particle order (its outputs are computed in sorted order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import Array
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cheetah_tpu.ops.pallas_cic import (
    _chunk_for,
    _deposit_multi_acc,
    _gather_multi_values,
    _num_leads,
)

# Window bounds, mirroring the untiled kernel's VMEM budget (pallas_cic.py
# ``_fits_untiled``): the lead tiles are ``((R+1)*ny, chunk)`` and the
# revisited accumulator / grid window is ``(C*nt, (R+1)*ny)``.
_MAX_WINDOW_LEAD = 4096
_MAX_WINDOW_CELLS = 262144
# The t-axis two-hot factor is ``(nt, chunk)`` with chunk up to 1024; cap nt
# so it stays ~2 MB.
_MAX_NT = 512


def tiled_bounds_ok(histogram_shape) -> bool:
    """True when the minimal (R=1) two-row window fits the VMEM budget —
    i.e. this module can handle the grid no matter how large ``nx`` is."""
    if len(histogram_shape) != 3:
        return False
    nx, ny, nt = histogram_shape
    return (
        2 * ny <= _MAX_WINDOW_LEAD
        and 2 * ny * nt <= _MAX_WINDOW_CELLS
        and nt <= _MAX_NT
        and nx >= 2
    )


def _pick_rows_per_tile(nx: int, ny: int, nt: int) -> int:
    """Rows per x-tile. MXU work per particle scales with the window lead
    ``(R+1)*ny``, so keep it just large enough (~256) for efficient MXU
    tiles, within the VMEM window bounds."""
    rows = max(1, 256 // ny - 1)
    while rows > 1 and (
        (rows + 1) * ny > _MAX_WINDOW_LEAD
        or (rows + 1) * ny * nt > _MAX_WINDOW_CELLS
    ):
        rows -= 1
    return min(rows, max(1, nx - 1))


# ---------------------------------------------------------------------------
# The plan: one payload-along sort + tiny per-chunk visit tables.
# ---------------------------------------------------------------------------


def _sort_by_tile(
    normalized, payload, payload_pads, *, rows_per_tile, num_tiles, chunk
):
    """Sort particles by x-tile with all per-particle data as sort payload.

    :param normalized: Bin-space positions ``(B, N, 3)``.
    :param payload: Extra ``(B, N)`` arrays to carry along (row values, the
        unsort index, ...).
    :param payload_pads: One pad constant per payload array (an unsort index
        must pad past every real index; row values pad at 0).
    :return: ``(sorted_tile (B, Np), pos (B, 3, Np), sorted_payload)`` —
        chunk-padded: position pads park at -2 (no two-hot row matches),
        tile pads at ``num_tiles`` (the dummy window).
    """
    batch, num_particles, _ = normalized.shape
    x = normalized[..., 0].astype(jnp.float32)
    i0 = jnp.floor(x).astype(jnp.int32)
    tile = jnp.clip(jnp.floor_divide(i0, rows_per_tile), 0, num_tiles - 1)
    sorted_all = jax.lax.sort(
        (
            tile,
            x,
            normalized[..., 1].astype(jnp.float32),
            normalized[..., 2].astype(jnp.float32),
            *payload,
        ),
        num_keys=1,
    )
    num_chunks = -(-num_particles // chunk)
    pad = num_chunks * chunk - num_particles

    def pad_with(a, value):
        if not pad:
            return a
        return jnp.pad(a, ((0, 0), (0, pad)), constant_values=value)

    sorted_tile = pad_with(sorted_all[0], num_tiles)
    pos = jnp.stack(
        [pad_with(sorted_all[1], -2.0), pad_with(sorted_all[2], -2.0),
         pad_with(sorted_all[3], -2.0)],
        axis=1,
    )  # (B, 3, Np)
    sorted_payload = tuple(
        pad_with(a, value) for a, value in zip(sorted_all[4:], payload_pads)
    )
    return sorted_tile, pos, sorted_payload


def _visit_tables(sorted_tile, *, chunk, num_chunks, num_tiles, num_visits):
    """Per-visit (chunk, tile) tables ``(B, num_visits)`` int32.

    Chunk ``c`` spans tiles ``[sorted_tile[c*chunk],
    sorted_tile[(c+1)*chunk - 1]]``; its visits enumerate that range.
    ``num_visits = num_chunks + num_tiles`` is a static upper bound (the
    spans of consecutive chunks overlap in at most one tile). Dummy visits
    past the real total point at the last chunk and the dummy tile
    ``num_tiles`` (zero contribution; clipped tiles stay non-decreasing so
    the revisit pattern holds)."""
    first = sorted_tile[:, ::chunk]  # (B, num_chunks)
    last = sorted_tile[:, chunk - 1 :: chunk]
    spans = last - first + 1
    vstart = jnp.concatenate(
        [jnp.zeros((spans.shape[0], 1), jnp.int32), jnp.cumsum(spans, axis=1)],
        axis=1,
    )[:, :num_chunks]
    vidx = jnp.arange(num_visits, dtype=jnp.int32)
    chunk_of_visit = jnp.clip(
        jax.vmap(lambda vs: jnp.searchsorted(vs, vidx, side="right"))(vstart).astype(
            jnp.int32
        )
        - 1,
        0,
        num_chunks - 1,
    )
    tile_of_visit = jnp.take_along_axis(first, chunk_of_visit, axis=1) + (
        vidx[None, :] - jnp.take_along_axis(vstart, chunk_of_visit, axis=1)
    )
    tile_of_visit = jnp.clip(tile_of_visit, 0, num_tiles)
    return chunk_of_visit, tile_of_visit


def _masked_window_positions(pos_block, tile_scalar, *, rows_per_tile, num_tiles):
    """Window-local positions for one visit: rebase x into tile
    ``tile_scalar``'s frame and park particles belonging to other tiles at
    -2 (their two-hot weights vanish; f32 arithmetic throughout — Mosaic has
    no i32 division and these bin indices are exactly representable)."""
    x = pos_block[0:1, :]
    tile_f = tile_scalar.astype(jnp.float32)
    rows_f = jnp.float32(rows_per_tile)
    particle_tile = jnp.clip(
        jnp.floor(jnp.floor(x) / rows_f), 0.0, jnp.float32(num_tiles - 1)
    )
    x_local = jnp.where(particle_tile == tile_f, x - tile_f * rows_f, -2.0)
    return jnp.concatenate([x_local, pos_block[1:3, :]], axis=0)


# ---------------------------------------------------------------------------
# Deposit.
# ---------------------------------------------------------------------------


def _deposit_tiled_kernel(
    c_ref, t_ref, pos_ref, rows_ref, out_ref, *, rows_per_tile, num_tiles, ny, nt,
    chunk, orders,
):
    b = pl.program_id(0)
    v = pl.program_id(1)
    tile = t_ref[b, v]

    @pl.when((v == 0) | (tile != t_ref[b, jnp.maximum(v - 1, 0)]))
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    pos = _masked_window_positions(
        pos_ref[0], tile, rows_per_tile=rows_per_tile, num_tiles=num_tiles
    )
    out_ref[:] += _deposit_multi_acc(
        pos, rows_ref[0],
        nx=rows_per_tile + 1, ny=ny, nt=nt, chunk=chunk, orders=orders,
    )[None]


@functools.partial(jax.jit, static_argnames=("histogram_shape", "orders", "interpret"))
def deposit_multi_tiled_pallas(
    normalized: Array,
    rows: Array,
    histogram_shape: tuple[int, int, int],
    orders: tuple[tuple[int, int, int], ...],
    interpret: bool = False,
) -> Array:
    """x-tiled multi-order deposit: same contract as
    ``pallas_cic.deposit_multi_3d_pallas`` (``normalized (B, N, 3)``,
    ``rows (B, O, C, N)`` -> grid ``(B, C, nx, ny, nt)`` f32) for grids past
    the untiled VMEM bound."""
    # Mosaic cannot legalize the i64 literals jax_enable_x64 produces in the
    # BlockSpec index maps — trace everything here with x64 OFF.
    with jax.enable_x64(False):
        return _deposit_tiled_x32(normalized, rows, histogram_shape, orders, interpret)


def _deposit_tiled_x32(normalized, rows, histogram_shape, orders, interpret):
    nx, ny, nt = histogram_shape
    rows_per_tile = _pick_rows_per_tile(nx, ny, nt)
    num_tiles = -(-nx // rows_per_tile)
    window = rows_per_tile + 1
    lead = window * ny
    # Mosaic block rule: the second-minor block dim must be divisible by 8
    # (the minor dim is the full window lead). Pad the t axis — padded t
    # rows capture exactly the past-the-edge corner weights the untiled
    # kernel drops, and the fold drops them identically.
    nt_pad = -(-nt // 8) * 8
    chunk = _chunk_for(lead * _num_leads(orders))

    batch, num_orders, num_components, num_particles = rows.shape
    num_chunks = -(-num_particles // chunk)
    num_visits = num_chunks + num_tiles

    oc = num_orders * num_components
    rows_cols = tuple(
        rows[:, o, c].astype(jnp.float32)
        for o in range(num_orders)
        for c in range(num_components)
    )
    sorted_tile, pos, sorted_rows = _sort_by_tile(
        normalized, rows_cols, (0.0,) * len(rows_cols),
        rows_per_tile=rows_per_tile, num_tiles=num_tiles, chunk=chunk,
    )
    chunk_of_visit, tile_of_visit = _visit_tables(
        sorted_tile, chunk=chunk, num_chunks=num_chunks, num_tiles=num_tiles,
        num_visits=num_visits,
    )
    rows_arr = jnp.stack(sorted_rows, axis=1)  # (B, O*C, Np)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_visits),
        in_specs=[
            pl.BlockSpec(
                (1, 3, chunk),
                lambda b, v, c, t: (b, 0, c[b, v]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, oc, chunk),
                lambda b, v, c, t: (b, 0, c[b, v]),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, num_components * nt_pad, lead),
            lambda b, v, c, t: (t[b, v], b, 0),
            memory_space=pltpu.VMEM,
        ),
    )
    out = pl.pallas_call(
        functools.partial(
            _deposit_tiled_kernel,
            rows_per_tile=rows_per_tile, num_tiles=num_tiles, ny=ny, nt=nt_pad,
            chunk=chunk, orders=orders,
        ),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (num_tiles + 1, batch * num_components * nt_pad, lead), jnp.float32
        ),
        interpret=interpret,
    )(chunk_of_visit, tile_of_visit, pos, rows_arr)

    # Never-visited windows (tiles with no particles, plus the dummy window
    # unless a padding visit touched it) hold uninitialised memory — mask
    # them before folding.
    visited = (
        jnp.sum(
            jax.nn.one_hot(tile_of_visit, num_tiles + 1, dtype=jnp.float32), axis=1
        )
        > 0
    )  # (B, T+1)
    win = jnp.where(
        visited[:, None, :, None, None],
        out.reshape(
            num_tiles + 1, batch, num_components * nt_pad, window, ny
        ).transpose(1, 2, 0, 3, 4),
        0.0,
    )

    # Fold: window row R of tile t is the halo duplicating row 0 of tile
    # t+1 (global row (t+1)*R); the last real tile's halo is global row
    # >= nx, dropped exactly like the untiled kernel drops contributions
    # past the grid edge, and the dummy window holds only parked particles.
    win = win[:, :, :num_tiles, :, :]
    main = win[:, :, :, :rows_per_tile, :]
    halo = win[:, :, :, rows_per_tile, :]
    main = main.at[:, :, 1:, 0, :].add(halo[:, :, :-1, :])
    grid_rows = main.reshape(
        batch, num_components * nt_pad, num_tiles * rows_per_tile, ny
    )
    grid_rows = grid_rows[:, :, :nx, :]
    return jnp.moveaxis(
        grid_rows.reshape(batch, num_components, nt_pad, nx, ny)[:, :, :nt], 2, -1
    )


# ---------------------------------------------------------------------------
# Gather.
# ---------------------------------------------------------------------------


def _gather_tiled_kernel(
    c_ref, t_ref, pos_ref, win_ref, *out_refs, rows_per_tile, num_tiles, ny, nt,
    chunk, orders,
):
    b = pl.program_id(0)
    v = pl.program_id(1)

    @pl.when((v == 0) | (c_ref[b, v] != c_ref[b, jnp.maximum(v - 1, 0)]))
    def _():
        for out_ref in out_refs:
            out_ref[:] = jnp.zeros_like(out_ref)

    pos = _masked_window_positions(
        pos_ref[0], t_ref[b, v], rows_per_tile=rows_per_tile, num_tiles=num_tiles
    )
    values = _gather_multi_values(
        pos, win_ref[0],
        nx=rows_per_tile + 1, ny=ny, nt=nt, chunk=chunk, orders=orders,
    )
    for out_ref, value in zip(out_refs, values):
        out_ref[:] += value[None]


@functools.partial(jax.jit, static_argnames=("orders", "interpret"))
def gather_multi_tiled_pallas(
    grids: Array,
    normalized: Array,
    orders: tuple[tuple[int, int, int], ...],
    interpret: bool = False,
) -> tuple[Array, ...]:
    """x-tiled multi-order gather: same contract as
    ``pallas_cic.gather_multi_3d_pallas`` (``grids (B, C, nx, ny, nt)``,
    ``normalized (B, N, 3)`` -> one ``(B, C, N)`` f32 per order) for grids
    past the untiled VMEM bound. Exact adjoint of
    :func:`deposit_multi_tiled_pallas` at the same orders."""
    with jax.enable_x64(False):
        return _gather_tiled_x32(grids, normalized, orders, interpret)


def _gather_tiled_x32(grids, normalized, orders, interpret):
    batch, num_components, nx, ny, nt = grids.shape
    rows_per_tile = _pick_rows_per_tile(nx, ny, nt)
    num_tiles = -(-nx // rows_per_tile)
    window = rows_per_tile + 1
    lead = window * ny
    # See _deposit_tiled_x32: t padded to a multiple of 8 for the Mosaic
    # second-minor block rule; padded t rows hold zeros, contributing the
    # same zero past-the-edge corner weight as the untiled kernel.
    nt_pad = -(-nt // 8) * 8
    chunk = _chunk_for(lead * _num_leads(orders))

    num_particles = normalized.shape[1]
    num_chunks = -(-num_particles // chunk)
    num_visits = num_chunks + num_tiles

    unsort_idx = jnp.broadcast_to(
        jnp.arange(num_particles, dtype=jnp.int32), (batch, num_particles)
    )
    sorted_tile, pos, (sorted_idx,) = _sort_by_tile(
        normalized, (unsort_idx,), (num_particles,),
        rows_per_tile=rows_per_tile, num_tiles=num_tiles, chunk=chunk,
    )
    chunk_of_visit, tile_of_visit = _visit_tables(
        sorted_tile, chunk=chunk, num_chunks=num_chunks, num_tiles=num_tiles,
        num_visits=num_visits,
    )

    # Tile windows: rows [t*R, t*R + R] of the (x-zero-padded) grid plus a
    # zero dummy window, one static strided row-take (window rows past nx
    # read zero, matching the untiled kernel's zero weight past the edge).
    g_rows = (
        jnp.moveaxis(grids, -1, 2)
        .astype(jnp.float32)
        .reshape(batch, num_components, nt, nx, ny)
    )
    padded = jnp.pad(
        g_rows,
        (
            (0, 0), (0, 0), (0, nt_pad - nt),
            (0, (num_tiles + 1) * rows_per_tile + 1 - nx), (0, 0),
        ),
    ).reshape(batch, num_components * nt_pad, -1, ny)
    row_idx = (
        jnp.arange(num_tiles + 1, dtype=jnp.int32)[:, None] * rows_per_tile
        + jnp.arange(window, dtype=jnp.int32)[None, :]
    )
    win = padded[:, :, row_idx, :]  # (B, C*nt_pad, T+1, W, ny)
    win_arr = win.transpose(2, 0, 1, 3, 4).reshape(
        num_tiles + 1, batch * num_components * nt_pad, lead
    )

    out_struct = jax.ShapeDtypeStruct(
        (batch, num_components, num_chunks * chunk), jnp.float32
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(batch, num_visits),
        in_specs=[
            pl.BlockSpec(
                (1, 3, chunk),
                lambda b, v, c, t: (b, 0, c[b, v]),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, num_components * nt_pad, lead),
                lambda b, v, c, t: (t[b, v], b, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, num_components, chunk),
                lambda b, v, c, t: (b, 0, c[b, v]),
                memory_space=pltpu.VMEM,
            ),
        )
        * len(orders),
    )
    outs = pl.pallas_call(
        functools.partial(
            _gather_tiled_kernel,
            rows_per_tile=rows_per_tile, num_tiles=num_tiles, ny=ny, nt=nt_pad,
            chunk=chunk, orders=orders,
        ),
        grid_spec=grid_spec,
        out_shape=(out_struct,) * len(orders),
        interpret=interpret,
    )(chunk_of_visit, tile_of_visit, pos, win_arr)

    # Outputs are in sorted order; restore particle order with a second
    # payload-along sort keyed by the original index (pads sort past every
    # real index and are sliced off).
    value_cols = [
        o[:, c] for o in outs for c in range(num_components)
    ]
    unsorted = jax.lax.sort((sorted_idx, *value_cols), num_keys=1)[1:]
    result = []
    for i in range(len(orders)):
        cols = unsorted[i * num_components : (i + 1) * num_components]
        result.append(jnp.stack(cols, axis=1)[..., :num_particles])
    return tuple(result)
