"""Headline benchmark: macroparticle-element transports/s/chip.

Times the production RL-environment configuration (BASELINE.json config 5
shape) on one chip: 4096 lattice instances x 10k macroparticles tracked
through the ARES EA subcell under ``jax.jit`` with per-instance quadrupole
settings and the beam-size readout as output.

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}`` where
``vs_baseline`` is the ratio to the 1e9 transports/s/chip target from
BASELINE.json (the reference publishes no absolute numbers).

The full workload suite (screens, space charge Pallas vs XLA, gradients,
the ARES stage-3 machine) lives in ``scripts/bench_all.py``, which
owns the committed ``bench_details.json`` artifact rendered into
PERF_NOTES.md. This script deliberately writes no files.
"""

import json

import jax
import jax.numpy as jnp


def _timeit(fn, *args, iters=20):
    """Honest per-step device time over the axon tunnel (fori-loop slope
    method with the backend-appropriate jitter floor; see
    :func:`cheetah_tpu.utils.profiling.timeit_slope`)."""
    from cheetah_tpu.utils.profiling import timeit_slope

    return timeit_slope(fn, *args, iters=iters)


def main() -> None:
    import cheetah_tpu as ct
    from cheetah_tpu.lattices import ares_ea_subcell

    f32 = jnp.float32

    num_instances, num_particles = 4096, 10_000
    segment = ares_ea_subcell(dtype=f32)
    segment.AREAMQZM1.k1 = jnp.linspace(-20, 20, num_instances, dtype=f32)
    num_elements = len(segment.elements)
    beam = ct.ParticleBeam.from_twiss(
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

    env_step = jax.jit(lambda seg, b: seg.track(b).sigma_x)
    dt = _timeit(env_step, segment, beam)
    transports_per_s = num_instances * num_particles * num_elements / dt

    target = 1e9  # BASELINE.json north-star target per chip
    print(
        json.dumps(
            {
                "metric": (
                    "macroparticle-element transports/s/chip "
                    "(ARES EA env step, 4096 instances x 10k particles, jit)"
                ),
                "value": transports_per_s,
                "unit": "transports/s",
                "vs_baseline": transports_per_s / target,
            }
        )
    )


if __name__ == "__main__":
    main()
