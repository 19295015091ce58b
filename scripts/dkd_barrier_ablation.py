"""One-off ablation: does an optimization_barrier before the dkd output stack
stop XLA from recomputing the shared coefficient chain per component?

HISTORICAL (round 4, pre-chromatic): dkd_anatomy.json then showed the env
dkd step costing 2.5x the transcendentals of the dkd quad alone (0.82e9 vs
0.33e9) — XLA duplicating the elementwise producer graph into each of the 7
stacked particle components. The measurement below established that
barriers do NOT fix it (deduplicating via materialisation costs more HBM
than the recompute saves: ~11.4 ms either way), which motivated the
chromatic factorisation (`bmadx.calculate_quadrupole_coefficients_chromatic`)
that removed the per-(instance x particle) transcendentals algebraically
instead. The committed dkd_barrier_ablation.json preserves the
pre-chromatic numbers that justified that decision; re-running this script
on current code measures the (now FMA-bound) formulation instead.

Run: ``python scripts/dkd_barrier_ablation.py`` (TPU).
"""

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

import cheetah_tpu as ct
from cheetah_tpu.lattices import ares_ea_subcell
from cheetah_tpu.utils import bmadx
from cheetah_tpu.utils.profiling import timeit_slope

f32 = jnp.float32
NUM_INSTANCES = 4096
NUM_PARTICLES = 10_000

results = {}


def make_beam():
    return ct.ParticleBeam.from_twiss(
        num_particles=NUM_PARTICLES,
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


def make_seg():
    seg = ares_ea_subcell(dtype=f32)
    seg.AREAMQZM1.tracking_method = "drift_kick_drift"
    seg.AREAMQZM1.k1 = jnp.linspace(-20, 20, NUM_INSTANCES, dtype=f32)
    return seg


def env(seg, b, barrier_coords):
    quad = seg.AREAMQZM1
    quad_index = next(i for i, e in enumerate(seg.elements) if e.name == "AREAMQZM1")
    b = type(seg)(elements=seg.elements[:quad_index]).track(b)

    mc2 = b.species.mass_eV
    x, px, y, py = b.x, b.px, b.y, b.py
    z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(b.tau, b.p, b.energy, mc2)
    rel_p = 1.0 + pz
    k1 = quad.k1[..., None] / rel_p
    (tx, dzx), (ty, dzy) = bmadx.calculate_quadrupole_coefficients_both(
        k1, quad.length, rel_p
    )
    dzl = bmadx.low_energy_z_correction(pz, p0c, mc2, quad.length)

    z = (
        z
        + dzx[0] * jnp.square(x)
        + dzx[1] * x * px
        + dzx[2] * jnp.square(px)
        + dzy[0] * jnp.square(y)
        + dzy[1] * y * py
        + dzy[2] * jnp.square(py)
        + dzl
    )
    x, px = tx[0][0] * x + tx[0][1] * px, tx[1][0] * x + tx[1][1] * px
    y, py = ty[0][0] * y + ty[0][1] * py, ty[1][0] * y + ty[1][1] * py
    tau, delta, ref_energy = bmadx.bmad_to_cheetah_z_pz(z, pz, p0c, mc2)
    coords = jnp.broadcast_arrays(x, px, y, py, tau, delta)
    if barrier_coords:
        coords = jax.lax.optimization_barrier(tuple(coords))
    out = ct.ParticleBeam(
        particles=jnp.stack([*coords, jnp.ones_like(coords[0])], axis=-1),
        energy=ref_energy,
        particle_charges=b.particle_charges,
        survival_probabilities=b.survival_probabilities,
        s=b.s + quad.length,
        species=b.species,
    )
    rest = type(seg)(elements=seg.elements[quad_index + 1 :])
    return rest.track(out).sigma_x


def report(name, fn, *args):
    jitted = jax.jit(fn)
    dt = timeit_slope(jitted, *args, iters=10)
    results[name] = dt * 1e3
    try:
        analysis = jitted.lower(*args).compile().cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        results[f"{name}_transc"] = analysis.get("transcendentals")
        results[f"{name}_bytes"] = analysis.get("bytes accessed")
    except Exception:
        pass
    print(f"{name}: {dt * 1e3:.3f} ms  transc={results.get(f'{name}_transc')}", flush=True)


beam = make_beam()
seg = make_seg()
report("plain_ms", lambda s, b: env(s, b, False), seg, beam)
report("barrier_coords_ms", lambda s, b: env(s, b, True), seg, beam)

out = pathlib.Path(__file__).resolve().parent.parent / "dkd_barrier_ablation.json"
out.write_text(json.dumps(results, indent=2, default=str) + "\n")
print(f"wrote {out}")
