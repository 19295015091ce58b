"""Roofline attribution for the dkd env step (VERDICT round-2 weak #1).

Measures where the 4096x10k drift_kick_drift env step spends its time, by
formulation ablation on the TPU (fori-loop slope timing), plus compiled cost
analysis (flops / bytes / transcendentals) so the bound — HBM or VPU — is a
measurement, not a guess.

Ablations:

- ``env_dkd``     : the full env step (dkd quad + fused linear rest +
  sigma_x). Since the closed-form reformulation (commit "Closed-form
  drift-kick-drift quadrupole") this is ONE elementwise pass — no scan.
- ``env_dkd_stepped``: the round-2 formulation (num_steps-fold
  ``lax.scan`` with unroll, the reference's step-loop semantics) — kept
  inline here to quantify the closed-form win.
- ``env_linear``  : the same env step with the quad linear (for reference)
- ``dkd_alone``   : just the dkd quadrupole, summed output (no downstream)
- ``coeffs_only`` : the (B, N) Bmad-X coefficient computation, summed

Run: ``python scripts/dkd_anatomy.py`` (TPU; ~10 min incl. tunnel compiles).
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

# Under CHEETAH_TPU_ANATOMY_SMOKE the run must stay on the CPU backend even
# when the environment pins the tunneled TPU (sitecustomize re-registers it;
# the env var alone is not enough).
if os.environ.get("CHEETAH_TPU_ANATOMY_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import cheetah_tpu as ct
from cheetah_tpu.lattices import ares_ea_subcell
from cheetah_tpu.utils import bmadx
from cheetah_tpu.utils.profiling import timeit_slope

f32 = jnp.float32
# Overridable for CPU smoke runs (CHEETAH_TPU_ANATOMY_SMOKE=1).
_SMOKE = os.environ.get("CHEETAH_TPU_ANATOMY_SMOKE") == "1"
NUM_INSTANCES = 32 if _SMOKE else 4096
NUM_PARTICLES = 1_000 if _SMOKE else 10_000
NUM_STEPS = 5

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


def make_dkd_segment():
    seg = ares_ea_subcell(dtype=f32)
    seg.AREAMQZM1.tracking_method = "drift_kick_drift"
    seg.AREAMQZM1.num_steps = NUM_STEPS
    seg.AREAMQZM1.k1 = jnp.linspace(-20, 20, NUM_INSTANCES, dtype=f32)
    return seg


def report(name, fn, *args, iters=10):
    jitted = jax.jit(fn)
    dt = timeit_slope(jitted, *args, iters=iters)
    results[f"{name}_ms"] = dt * 1e3
    try:
        compiled = jitted.lower(*args).compile()
        analysis = compiled.cost_analysis()
        if isinstance(analysis, list):
            analysis = analysis[0]
        results[f"{name}_cost"] = {
            "flops": analysis.get("flops"),
            "transcendentals": analysis.get("transcendentals"),
            "bytes_accessed": analysis.get("bytes accessed"),
        }
        mem = compiled.memory_analysis()
        if mem is not None:
            results[f"{name}_peak_bytes"] = getattr(
                mem, "temp_size_in_bytes", None
            )
    except Exception as exc:  # pragma: no cover - informational only
        results[f"{name}_cost_error"] = str(exc)[:200]
    print(f"{name}: {dt * 1e3:.3f} ms  {results.get(f'{name}_cost')}", flush=True)


beam = make_beam()
env_step = lambda seg, b: seg.track(b).sigma_x  # noqa: E731

# 1. Baseline dkd env step.
report("env_dkd", env_step, make_dkd_segment(), beam)

# 2. Linear env step (the 64%-roofline reference point).
seg_lin = ares_ea_subcell(dtype=f32)
seg_lin.AREAMQZM1.k1 = jnp.linspace(-20, 20, NUM_INSTANCES, dtype=f32)
report("env_linear", env_step, seg_lin, beam)

# 2b. The round-2 stepped formulation (reference step-loop semantics via
#     lax.scan with unroll) — quantifies the closed-form win.
def stepped_env(seg, b):
    quad = seg.AREAMQZM1
    quad_index = next(
        i for i, e in enumerate(seg.elements) if e.name == "AREAMQZM1"
    )
    b = type(seg)(elements=seg.elements[:quad_index]).track(b)
    mc2 = b.species.mass_eV
    x, px, y, py = b.x, b.px, b.y, b.py
    z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(b.tau, b.p, b.energy, mc2)
    rel_p = 1.0 + pz
    k1 = quad.k1[..., None] / rel_p
    sl = quad.length / NUM_STEPS
    tx, dzx = bmadx.calculate_quadrupole_coefficients(-k1, sl, rel_p)
    ty, dzy = bmadx.calculate_quadrupole_coefficients(k1, sl, rel_p)
    dzl = bmadx.low_energy_z_correction(pz, p0c, mc2, sl)

    def step(carry, _):
        x, px, y, py, z = carry
        z = (
            z
            + dzx[0] * jnp.square(x) + dzx[1] * x * px + dzx[2] * jnp.square(px)
            + dzy[0] * jnp.square(y) + dzy[1] * y * py + dzy[2] * jnp.square(py)
        )
        x, px = tx[0][0] * x + tx[0][1] * px, tx[1][0] * x + tx[1][1] * px
        y, py = ty[0][0] * y + ty[0][1] * py, ty[1][0] * y + ty[1][1] * py
        return (x, px, y, py, z + dzl), None

    shape = jnp.broadcast_shapes(x.shape, tx[0][0].shape, dzl.shape)
    carry = tuple(
        jnp.broadcast_to(v, shape) for v in (x, px, y, py, z + jnp.zeros_like(pz))
    )
    (x, px, y, py, z), _ = jax.lax.scan(
        step, carry, length=NUM_STEPS, unroll=min(NUM_STEPS, 8)
    )
    tau, delta, _ = bmadx.bmad_to_cheetah_z_pz(z, pz, p0c, mc2)
    import cheetah_tpu as _ct

    out = _ct.ParticleBeam(
        particles=jnp.stack(
            [*jnp.broadcast_arrays(x, px, y, py, tau, delta), jnp.ones(shape, x.dtype)],
            axis=-1,
        ),
        energy=b.energy,
    )
    # Track the rest of the lattice (everything after the quad).
    rest = type(seg)(elements=seg.elements[quad_index + 1 :])
    return rest.track(out).sigma_x


report("env_dkd_stepped", stepped_env, make_dkd_segment(), beam)

# 3. dkd quadrupole alone (no downstream linear transport).
quad = make_dkd_segment().AREAMQZM1
report(
    "dkd_alone",
    lambda q, b: jnp.sum(q.track(b).particles, axis=(-2, -1)),
    quad,
    beam,
)

# 4. Coefficient computation alone: the (B, N) Bmad-X coefficient arrays,
#    consumed by a full reduce (so nothing can be DCE'd, but XLA may fuse the
#    whole thing into one pass — the difference vs dkd_alone is the step/stack
#    cost).
def coeffs_only(k1_quad, beam):
    mc2 = beam.species.mass_eV
    z, pz, p0c = bmadx.cheetah_to_bmad_z_pz(beam.tau, beam.p, beam.energy, mc2)
    rel_p = 1.0 + pz
    k1 = k1_quad[..., None] / rel_p
    step_length = jnp.asarray(0.122, f32) / NUM_STEPS
    tx, dzx = bmadx.calculate_quadrupole_coefficients(-k1, step_length, rel_p)
    ty, dzy = bmadx.calculate_quadrupole_coefficients(k1, step_length, rel_p)
    dz_low = bmadx.low_energy_z_correction(pz, p0c, mc2, step_length)
    total = dz_low.sum()
    for group in (tx, ty):
        for row in group:
            for entry in row:
                total = total + entry.sum()
    for group in (dzx, dzy):
        for entry in group:
            total = total + entry.sum()
    return total


report("coeffs_only", coeffs_only, quad.k1, beam)

out_path = pathlib.Path(__file__).resolve().parent.parent / "dkd_anatomy.json"
out_path.write_text(json.dumps(results, indent=2, default=str) + "\n")
print(f"wrote {out_path}")
