"""Tests for the x-tiled Pallas CIC kernels (grids past the untiled VMEM
bound, ref behaviour: ``cheetah/utils/cloud_in_cell.py:8-64`` handles
arbitrary grid shapes at uniform cost).

All Pallas runs use interpret mode (CPU test harness, same convention as
``test_space_charge.py``); semantics on hardware are identical by Pallas'
contract. Numerical references are the XLA scatter / two-hot paths and the
untiled kernels themselves.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cheetah_tpu.ops.cloud_in_cell import (
    _deposit_scatter,
    cloud_in_cell_gather_3d,
)
from cheetah_tpu.ops.pallas_cic import (
    _fits_untiled,
    cic_deposit_multi_p,
    cic_gather_multi_p,
    deposit_multi_3d_pallas,
    gather_multi_3d_pallas,
)
from cheetah_tpu.ops.pallas_cic_tiled import (
    _pick_rows_per_tile,
    deposit_multi_tiled_pallas,
    gather_multi_tiled_pallas,
    tiled_bounds_ok,
)

ALL_ORDERS = (
    (0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
    (1, 1, 0), (1, 0, 1), (0, 1, 1), (1, 1, 1),
)

# Past the untiled lead bound (nx*ny = 6400 > 4096) but cheap to test.
BIG_SHAPE = (160, 40, 16)


def _random_case(seed, batch, num_particles, shape, num_components=3):
    rng = np.random.default_rng(seed)
    grids = jnp.asarray(
        rng.normal(size=(batch, num_components, *shape)).astype(np.float32)
    )
    # Positions spill past every edge to exercise the boundary-drop rules.
    normalized = jnp.asarray(
        rng.uniform(-1.5, np.asarray(shape) + 0.5, size=(batch, num_particles, 3))
        .astype(np.float32)
    )
    return grids, normalized


def test_bounds_and_dispatch():
    assert not _fits_untiled(BIG_SHAPE)
    assert tiled_bounds_ok(BIG_SHAPE)
    assert tiled_bounds_ok((128, 128, 128))
    assert tiled_bounds_ok((128, 128, 64))
    assert tiled_bounds_ok((256, 256, 256))
    assert _fits_untiled((64, 64, 64))
    # Trailing-axes window too large for VMEM -> not handled here.
    assert not tiled_bounds_ok((128, 4096, 64))
    assert not tiled_bounds_ok((8, 8, 8192))
    assert _pick_rows_per_tile(128, 128, 128) >= 1


def test_tiled_deposit_matches_scatter_reference():
    """Tiled deposit == the XLA scatter deposit on a past-the-bound grid
    (raw-position scatter emulated by an extent making bin space = pos-0.5).
    """
    shape = BIG_SHAPE
    rng = np.random.default_rng(0)
    batch, num_particles = 2, 3000
    normalized = jnp.asarray(
        rng.uniform(-1.5, np.asarray(shape) + 0.5, size=(batch, num_particles, 3))
        .astype(np.float32)
    )
    charges = jnp.asarray(
        rng.normal(size=(batch, 1, 1, num_particles)).astype(np.float32)
    )
    raw = normalized + 0.5
    extent = jnp.broadcast_to(
        jnp.stack(
            [jnp.zeros(3), jnp.asarray(shape, jnp.float32)], axis=-1
        )[None],
        (batch, 3, 2),
    ).astype(jnp.float32)
    in_extent = jnp.all(
        (raw >= 0) & (raw <= jnp.asarray(shape, jnp.float32)), axis=-1
    )
    masked = charges * in_extent[:, None, None, :]

    actual = deposit_multi_tiled_pallas(
        normalized, masked, shape, ((0, 0, 0),), interpret=True
    )
    expected = _deposit_scatter(raw, masked[:, 0, 0], list(shape), extent)
    np.testing.assert_allclose(
        np.asarray(actual[:, 0]), np.asarray(expected), atol=2e-5
    )


def test_tiled_gather_matches_xla_two_hot():
    grids, normalized = _random_case(1, 2, 2500, BIG_SHAPE)
    (actual,) = gather_multi_tiled_pallas(
        grids, normalized, ((0, 0, 0),), interpret=True
    )
    expected = cloud_in_cell_gather_3d(grids, normalized)
    np.testing.assert_allclose(
        np.asarray(actual), np.asarray(expected, np.float32), atol=1e-5
    )


@pytest.mark.parametrize("shape", [(40, 24, 16), (48, 16, 24)])
def test_tiled_equals_untiled_all_orders(shape):
    """On grids BOTH kernels handle, tiled == untiled for every derivative
    order, in both directions (the tiled pair must be a drop-in dispatch)."""
    grids, normalized = _random_case(2, 2, 1777, shape)
    tiled = gather_multi_tiled_pallas(grids, normalized, ALL_ORDERS, interpret=True)
    untiled = gather_multi_3d_pallas(grids, normalized, ALL_ORDERS, interpret=True)
    for got, want, order in zip(tiled, untiled, ALL_ORDERS):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-6, err_msg=f"{order}"
        )

    rng = np.random.default_rng(3)
    rows = jnp.asarray(
        rng.normal(size=(2, len(ALL_ORDERS), 3, 1777)).astype(np.float32)
    )
    got = deposit_multi_tiled_pallas(normalized, rows, shape, ALL_ORDERS, interpret=True)
    want = deposit_multi_3d_pallas(normalized, rows, shape, ALL_ORDERS, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-6)


def test_tiled_gather_derivative_is_exact():
    """d/dx output == the analytic a.e. derivative of trilinear
    interpolation (numpy corner loop), not just a finite-difference blur."""
    shape = BIG_SHAPE
    rng = np.random.default_rng(4)
    batch, num_particles, C = 1, 300, 2
    grids_np = rng.normal(size=(batch, C, *shape)).astype(np.float32)
    norm_np = rng.uniform(
        1.0, np.asarray(shape) - 2.0, size=(batch, num_particles, 3)
    ).astype(np.float32)
    outs = gather_multi_tiled_pallas(
        jnp.asarray(grids_np), jnp.asarray(norm_np),
        ((0, 0, 0), (1, 0, 0)), interpret=True,
    )

    def corner_sum(g, p, dx):
        i = np.floor(p).astype(int)
        f = p - i
        acc = 0.0
        for cx in (0, 1):
            for cy in (0, 1):
                for ct in (0, 1):
                    wx = (1.0 if cx else -1.0) if dx else (f[0] if cx else 1 - f[0])
                    w = wx * (f[1] if cy else 1 - f[1]) * (f[2] if ct else 1 - f[2])
                    acc += w * g[i[0] + cx, i[1] + cy, i[2] + ct]
        return acc

    for n in range(0, num_particles, 37):
        for c in range(C):
            np.testing.assert_allclose(
                float(outs[1][0, c, n]),
                corner_sum(grids_np[0, c], norm_np[0, n], dx=True),
                atol=1e-5,
            )
            np.testing.assert_allclose(
                float(outs[0][0, c, n]),
                corner_sum(grids_np[0, c], norm_np[0, n], dx=False),
                atol=1e-5,
            )


def test_primitives_dispatch_tiled_with_full_autodiff():
    """The cic primitives route past-the-bound grids to the tiled kernels;
    grad / jvp / grad-of-grad / vmap all close over the tiled dispatch."""
    shape = BIG_SHAPE
    rng = np.random.default_rng(5)
    batch, num_particles, C = 1, 400, 2
    grids = jnp.asarray(rng.normal(size=(batch, C, *shape)).astype(np.float32))
    normalized = jnp.asarray(
        rng.uniform(1.0, np.asarray(shape) - 2.0, size=(batch, num_particles, 3))
        .astype(np.float32)
    )
    weights = jnp.asarray(
        rng.normal(size=(batch, C, num_particles)).astype(np.float32)
    )

    def gather_loss(g, n):
        (out,) = cic_gather_multi_p.bind(
            g, n, orders=((0, 0, 0),), interpret=True
        )
        return jnp.sum(out * weights)

    g_grids, g_pos = jax.grad(gather_loss, argnums=(0, 1))(grids, normalized)

    # Adjoint identity: <w, gather(g)> == <deposit(w), g>, with the deposit
    # itself running tiled (this is exactly what the transpose rule binds).
    deposit_w = cic_deposit_multi_p.bind(
        normalized, weights[:, None], histogram_shape=shape,
        orders=((0, 0, 0),), interpret=True,
    )
    np.testing.assert_allclose(
        float(jnp.vdot(deposit_w, grids)), float(gather_loss(grids, normalized)),
        rtol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(g_grids), np.asarray(deposit_w), atol=1e-6
    )

    # Position gradient: finite difference on a kink-free particle.
    def loss_of_x(dx):
        return gather_loss(grids, normalized.at[0, 7, 0].add(dx))

    eps = 1e-2
    fd = (loss_of_x(eps) - loss_of_x(-eps)) / (2 * eps)
    np.testing.assert_allclose(float(g_pos[0, 7, 0]), float(fd), rtol=2e-2)

    # Grad-of-grad stays finite and on the primitives.
    gg = jax.grad(
        lambda n: jnp.sum(jax.grad(gather_loss, argnums=1)(grids, n) ** 2)
    )(normalized)
    assert bool(jnp.all(jnp.isfinite(gg)))

    # vmap folds into the kernels' leading batch axis.
    stacked_g = jnp.stack([grids, 2 * grids])
    stacked_n = jnp.stack([normalized, normalized])
    vm = jax.vmap(
        lambda g, n: cic_gather_multi_p.bind(
            g, n, orders=((0, 0, 0),), interpret=True
        )[0]
    )(stacked_g, stacked_n)
    (single,) = cic_gather_multi_p.bind(
        grids, normalized, orders=((0, 0, 0),), interpret=True
    )
    np.testing.assert_allclose(np.asarray(vm[0]), np.asarray(single), atol=0)
    np.testing.assert_allclose(np.asarray(vm[1]), np.asarray(2 * single), atol=1e-6)


def test_tiled_handles_clustered_and_empty_tiles():
    """All particles in one x-slab: most tiles are never visited (their
    windows must come back zero, not garbage), and totals are conserved."""
    shape = BIG_SHAPE
    rng = np.random.default_rng(6)
    batch, num_particles = 1, 2000
    normalized = jnp.asarray(
        np.stack(
            [
                rng.uniform(80.2, 83.8, size=(batch, num_particles)),  # one slab
                rng.uniform(0.5, shape[1] - 1.5, size=(batch, num_particles)),
                rng.uniform(0.5, shape[2] - 1.5, size=(batch, num_particles)),
            ],
            axis=-1,
        ).astype(np.float32)
    )
    charges = jnp.ones((batch, 1, 1, num_particles), jnp.float32)
    grid = deposit_multi_tiled_pallas(
        normalized, charges, shape, ((0, 0, 0),), interpret=True
    )[:, 0]
    np.testing.assert_allclose(float(grid.sum()), num_particles, rtol=1e-5)
    outside = grid.at[:, 79:86].set(0.0)
    np.testing.assert_allclose(float(jnp.abs(outside).max()), 0.0, atol=1e-6)


def test_space_charge_kick_on_tiled_grid(monkeypatch):
    """End-to-end ``SpaceChargeKick`` on a past-the-untiled-bound grid: the
    forced (interpret-mode) tiled Pallas path matches the scatter/8-corner
    XLA path — the one the reference uses for arbitrary grids
    (``cheetah/accelerator/space_charge_kick.py:531-547``) — and stays
    differentiable."""
    import cheetah_tpu as ct
    import cheetah_tpu.ops.pallas_cic as pc

    shape = (160, 40, 16)
    assert not _fits_untiled(shape) and tiled_bounds_ok(shape)

    orig_gather = pc.differentiable_pallas_gather
    orig_deposit = pc.differentiable_pallas_deposit
    monkeypatch.setattr(pc, "pallas_deposit_available", lambda s: True)
    monkeypatch.setattr(
        pc, "differentiable_pallas_gather", lambda interpret=False: orig_gather(True)
    )
    monkeypatch.setattr(
        pc,
        "differentiable_pallas_deposit",
        lambda s, interpret=False: orig_deposit(s, True),
    )

    def make_beam():
        return ct.ParticleBeam.from_parameters(
            num_particles=3000,
            sigma_x=jnp.asarray(1e-4, jnp.float32),
            sigma_y=jnp.asarray(2e-4, jnp.float32),
            sigma_tau=jnp.asarray(1e-3, jnp.float32),
            energy=jnp.asarray(1.5e8, jnp.float32),
            total_charge=jnp.asarray(1e-10, jnp.float32),
            key=jax.random.PRNGKey(11),
            dtype=jnp.float32,
        )

    kick = ct.SpaceChargeKick(jnp.asarray(0.5, jnp.float32), grid_shape=shape)
    beam = make_beam()
    tracked_pallas = kick.track(beam)

    monkeypatch.setattr(pc, "pallas_deposit_available", lambda s: False)
    tracked_xla = kick.track(beam)

    # The kick is a small momentum update; compare the update itself.
    dp_pallas = np.asarray(tracked_pallas.particles - beam.particles)
    dp_xla = np.asarray(tracked_xla.particles - beam.particles)
    assert np.abs(dp_xla).max() > 0
    np.testing.assert_allclose(
        dp_pallas, dp_xla, atol=3e-3 * np.abs(dp_xla).max()
    )

    # Differentiability through the tiled dispatch at kick level.
    monkeypatch.setattr(pc, "pallas_deposit_available", lambda s: True)

    def loss(effect_length):
        k = ct.SpaceChargeKick(effect_length, grid_shape=shape)
        return jnp.sum(jnp.square(k.track(beam).px))

    grad = jax.grad(loss)(jnp.asarray(0.5, jnp.float32))
    assert np.isfinite(float(grad)) and abs(float(grad)) > 0


def test_tiled_single_particle_placement():
    """One particle, known fractional position: exact corner weights land on
    the right global cells (catches any tile-rebase off-by-one)."""
    shape = (96, 16, 16)
    # x chosen to straddle a tile boundary for every plausible R.
    x, y, t = 47.75, 3.25, 9.5
    normalized = jnp.asarray([[[x, y, t]]], jnp.float32)
    charges = jnp.ones((1, 1, 1, 1), jnp.float32)
    grid = np.asarray(
        deposit_multi_tiled_pallas(
            normalized, charges, shape, ((0, 0, 0),), interpret=True
        )[0, 0]
    )
    for cx, wx in ((47, 0.25), (48, 0.75)):
        for cy, wy in ((3, 0.75), (4, 0.25)):
            for ct, wt in ((9, 0.5), (10, 0.5)):
                np.testing.assert_allclose(
                    grid[cx, cy, ct], wx * wy * wt, rtol=1e-6
                )
    np.testing.assert_allclose(grid.sum(), 1.0, rtol=1e-6)
