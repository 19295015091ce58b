"""Localise the space-charge grad regression (VERDICT round-3 weak #2).

Round 2 measured value_and_grad of the space-charge segment at ~0.89 ms
(100k) with custom_vjp wrappers; the round-3 any-order primitive rebind
measures 1.41 ms. MXU pass counting says the two should be equivalent
(primitives: 8 lead passes, wrappers: 9), so this measures both on the
identical bench workload, plus mixed variants, to find where the time goes.

The wrapper variant here is a faithful reconstruction of the round-2
``custom_vjp`` pair (commit 0be9e6e) on top of the current kernels; it is
monkeypatched into the dispatch sites, which import lazily.

Run: ``python scripts/sc_grad_anatomy.py`` (TPU; ~15 min of tunnel compiles).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import cheetah_tpu as ct
from cheetah_tpu.ops import pallas_cic
from cheetah_tpu.ops.pallas_cic import (
    _binspace_and_mask,
    deposit_3d_pallas,
    deposit_binspace_3d_pallas,
    gather_3d_pallas,
    gather_grads_3d_pallas,
)
from cheetah_tpu.utils.profiling import timeit_slope

f32 = jnp.float32
results = {}


# --- round-2 custom_vjp wrappers (reconstruction of commit 0be9e6e) --------


def vjp_gather(interpret: bool = False):
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
        return grids_bar.astype(grids.dtype), normalized_bar.astype(normalized.dtype)

    gather.defvjp(gather_fwd, gather_bwd)
    return gather


def vjp_deposit(histogram_shape, interpret: bool = False):
    @jax.custom_vjp
    def deposit(positions, charges, extent):
        return deposit_3d_pallas(positions, charges, histogram_shape, extent, interpret)

    def deposit_fwd(positions, charges, extent):
        out = deposit_3d_pallas(
            positions, charges, histogram_shape, extent, interpret
        )
        return out, (positions, charges, extent)

    def deposit_bwd(residuals, gbar):
        positions, charges, extent = residuals
        safe, masked_charges, in_extent, scale, left, right, nb = _binspace_and_mask(
            positions, charges, histogram_shape, extent
        )
        val, dx, dy, dt = gather_grads_3d_pallas(
            gbar[:, None].astype(jnp.float32), safe, interpret
        )
        charges_bar = val[:, 0] * in_extent
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


_VJP_GATHER = vjp_gather()
_VJP_DEPOSITS = {}


def vjp_deposit_cached(histogram_shape, interpret=False):
    key = tuple(histogram_shape)
    if key not in _VJP_DEPOSITS:
        _VJP_DEPOSITS[key] = vjp_deposit(key, interpret)
    return _VJP_DEPOSITS[key]


def patch(gather_impl, deposit_impl):
    pallas_cic.differentiable_pallas_gather = gather_impl
    pallas_cic.differentiable_pallas_deposit = deposit_impl


ORIG_GATHER = pallas_cic.differentiable_pallas_gather
ORIG_DEPOSIT = pallas_cic.differentiable_pallas_deposit


# --- bench workload (identical to bench_all.py) ----------------------------


def make_beam(num_particles):
    return ct.ParticleBeam.from_twiss(
        num_particles=num_particles,
        beta_x=jnp.asarray(5.0, f32),
        alpha_x=jnp.asarray(-1.0, f32),
        emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(3.0, f32),
        alpha_y=jnp.asarray(0.5, f32),
        emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.54e8, f32),
        total_charge=jnp.asarray(1e-10, f32),
        key=jax.random.PRNGKey(0),
        dtype=f32,
    )


def sc_segment():
    return ct.Segment(
        [
            ct.Drift(jnp.asarray(0.1, f32)),
            ct.SpaceChargeKick(jnp.asarray(0.2, f32)),
            ct.Drift(jnp.asarray(0.1, f32)),
            ct.SpaceChargeKick(jnp.asarray(0.2, f32)),
            ct.Drift(jnp.asarray(0.1, f32)),
        ]
    )


def sc_loss(drift_length, s, b):
    s.elements[0].length = drift_length
    return jnp.sum(jnp.square(s.track(b).px))


def report(name, fn, *args, iters=10):
    jitted = jax.jit(fn)
    dt = timeit_slope(jitted, *args, iters=iters)
    results[f"{name}_ms"] = dt * 1e3
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        results[f"{name}_cost"] = {
            "flops": analysis.get("flops"),
            "transcendentals": analysis.get("transcendentals"),
            "bytes_accessed": analysis.get("bytes accessed"),
        }
    except Exception as exc:
        results[f"{name}_cost_error"] = str(exc)[:200]
    print(f"{name}: {dt * 1e3:.3f} ms  {results.get(f'{name}_cost')}", flush=True)


el = jnp.asarray(0.1, f32)
beam = make_beam(100_000)

# 1. Forward + grad with the current primitives.
report("fwd_primitive", lambda s, b: s.track(b).particles, sc_segment(), beam)
report("grad_primitive", jax.value_and_grad(sc_loss), el, sc_segment(), beam)

# 2. Grad with the round-2 custom_vjp wrappers.
patch(lambda interpret=False: _VJP_GATHER, vjp_deposit_cached)
try:
    report("grad_vjp", jax.value_and_grad(sc_loss), el, sc_segment(), beam)
    # 3. Mixed: vjp gather + primitive deposit, and vice versa.
    patch(lambda interpret=False: _VJP_GATHER, ORIG_DEPOSIT)
    report("grad_vjp_gather_only", jax.value_and_grad(sc_loss), el, sc_segment(), beam)
    patch(ORIG_GATHER, vjp_deposit_cached)
    report("grad_vjp_deposit_only", jax.value_and_grad(sc_loss), el, sc_segment(), beam)
finally:
    patch(ORIG_GATHER, ORIG_DEPOSIT)

out = pathlib.Path(__file__).resolve().parent.parent / "sc_grad_anatomy.json"
out.write_text(json.dumps(results, indent=2, default=str) + "\n")
print(f"wrote {out}")
