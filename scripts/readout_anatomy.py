"""Ablation: does reduce-all-columns-then-slice unlock dot-epilogue fusion?

PERF_NOTES' round-2 anatomy established for the 4096x10k env step that
(a) the transport dot + ONE fused whole-output reduction runs in ~0.46 ms,
(b) any SLICED consumer of the dot output forces the (B, N, 7) buffer
    (1.15 GB) to materialise in HBM -> 2.15 ms,
(c) single-pass variance does NOT fix it (it still slices first).

The untried formulation: compute the weighted moment reductions over ALL 7
columns of the dot output (a whole-output consumer, fusable into the dot
epilogue) and slice the (B, 7) RESULT instead of the (B, N, 7) operand.
If this measures near (a), the beam's sigma_*/mu_* readouts can be rewired
to per-column reductions and the headline env step drops ~3-4x without the
user switching to ``track_moments``.

Ablations (all compute sigma_x of the tracked beam, bit-equal math):

- ``env_slice``       : the current path — ``track(beam).sigma_x`` (slices
  column 0, then reduces).
- ``env_reduce_all``  : full-column weighted variance (reduce axis=-2 over
  the whole dot output), then slice component 0 of the (B, 7) result.
- ``env_reduce_pairs``: all 7 means + full 28-pair second moments as fused
  reductions of the dot output (what a cov-matrix readout needs), slice out
  sigma_x.
- ``env_dot_reduce``  : dot + one unweighted full reduce (the 0.46 ms
  round-2 reference point, kept as the fusion-possible floor).

Also records compiled peak temp bytes per variant (memory_analysis) — the
(B, N, 7) buffer is 1.15 GB at 4096x10k, so materialisation is visible.

Run: ``python scripts/readout_anatomy.py`` (TPU). CPU smoke:
``CHEETAH_TPU_ANATOMY_SMOKE=1 python scripts/readout_anatomy.py``.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax

if os.environ.get("CHEETAH_TPU_ANATOMY_SMOKE") == "1":
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp

import cheetah_tpu as ct
from cheetah_tpu.lattices import ares_ea_subcell
from cheetah_tpu.utils.profiling import timeit_slope
from cheetah_tpu.utils.statistics import unbiased_weighted_variance

f32 = jnp.float32
_SMOKE = os.environ.get("CHEETAH_TPU_ANATOMY_SMOKE") == "1"
NUM_INSTANCES = 32 if _SMOKE else 4096
NUM_PARTICLES = 1_000 if _SMOKE else 10_000

results = {}


def make_env():
    segment = ares_ea_subcell(dtype=f32)
    segment.AREAMQZM1.k1 = jnp.linspace(-20, 20, NUM_INSTANCES, dtype=f32)
    beam = ct.ParticleBeam.from_twiss(
        num_particles=NUM_PARTICLES,
        beta_x=jnp.asarray(5.0, f32),
        emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(3.0, f32),
        emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.54e8, f32),
        key=jax.random.PRNGKey(0),
        dtype=f32,
    )
    return segment, beam


def record(name, fn, segment, beam, iters):
    jitted = jax.jit(fn)
    seconds = timeit_slope(jitted, segment, beam, iters=iters)
    results[f"{name}_ms"] = seconds * 1e3
    compiled = jitted.lower(segment, beam).compile()
    try:
        results[f"{name}_peak_bytes"] = compiled.memory_analysis().temp_size_in_bytes
    except Exception:  # noqa: BLE001 - memory analysis is backend-optional
        pass
    print(f"{name}: {seconds * 1e3:.4f} ms", flush=True)


def main():
    segment, beam = make_env()
    iters = 5 if _SMOKE else 50

    def env_slice(seg, b):
        return seg.track(b).sigma_x

    def env_reduce_all(seg, b):
        out = seg.track(b)
        var7 = unbiased_weighted_variance(
            out.particles, out.survival_probabilities[..., None], axis=-2
        )
        return jnp.sqrt(var7[..., 0])

    def env_reduce_pairs(seg, b):
        out = seg.track(b)
        p = out.particles
        w = out.survival_probabilities
        total = jnp.sum(w, axis=-1)
        mean7 = jnp.sum(p * w[..., None], axis=-2) / total[..., None]
        pairs = p[..., :, None] * p[..., None, :]  # (..., N, 7, 7) elementwise
        m2 = jnp.sum(pairs * w[..., None, None], axis=-3) / total[..., None, None]
        cov = m2 - mean7[..., :, None] * mean7[..., None, :]
        return jnp.sqrt(cov[..., 0, 0])

    def env_dot_reduce(seg, b):
        return jnp.sum(seg.track(b).particles)

    record("env_slice", env_slice, segment, beam, iters)
    record("env_reduce_all", env_reduce_all, segment, beam, iters)
    record("env_reduce_pairs", env_reduce_pairs, segment, beam, iters)
    record("env_dot_reduce", env_dot_reduce, segment, beam, iters)

    out_path = pathlib.Path(__file__).resolve().parent.parent / "readout_anatomy.json"
    out_path.write_text(json.dumps(results, indent=2, default=str) + "\n")
    print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
