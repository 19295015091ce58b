"""Headline benchmark: macroparticle-element transports/s/chip.

Runs the BASELINE.json workloads on one chip and reports the headline metric
from the production RL-environment configuration (config 5 shape): 4096
lattice instances x 10k macroparticles tracked through the ARES EA subcell
under ``jax.jit`` with per-instance quadrupole settings and the beam-size
readout as output (XLA fuses transport and readout so intermediates stay in
VMEM).

Prints ONE JSON line ``{"metric", "value", "unit", "vs_baseline"}`` where
``vs_baseline`` is the ratio to the 1e9 transports/s/chip target from
BASELINE.json (the reference publishes no absolute numbers; its only hard
figure is <0.1 s for 100k particles + screen readout on CI CPU — measured
here as well and recorded in bench_details.json).
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np


def _timeit(fn, *args, iters=20):
    """Honest per-step device time over the axon tunnel.

    ``block_until_ready`` is unreliable through the tunnel (see
    .claude/skills/verify/SKILL.md), so completion is observed by *fetching* a
    scalar. To keep the ~30-50 ms tunnel round-trip out of the per-step
    figure, the step is repeated ``n`` times inside one jitted
    ``lax.fori_loop`` (dynamic trip count -> single compile), and the cost of
    one step is the slope between n=1 and n=iters. The loop carry perturbs
    the first input leaf by ~1e-30 so XLA cannot hoist the loop-invariant
    body out of the loop.
    """
    leaves, treedef = jax.tree.flatten(args)
    dtype = leaves[0].dtype

    @jax.jit
    def many(n, *flat):
        def body(_, carry):
            pert = [flat[0] + carry * jnp.asarray(1e-30, dtype)] + list(flat[1:])
            out = fn(*jax.tree.unflatten(treedef, pert))
            first = jax.tree.leaves(out)[0]
            return jnp.sum(first).astype(dtype) * jnp.asarray(1e-12, dtype)

        return jax.lax.fori_loop(0, n, body, jnp.zeros((), dtype))

    def fetch_time(n, repeats=5):
        float(np.asarray(many(n, *leaves)))  # warm
        best = np.inf
        for _ in range(repeats):
            start = time.perf_counter()
            float(np.asarray(many(n, *leaves)))
            best = min(best, time.perf_counter() - start)
        return best

    t_1 = fetch_time(1)
    t_n = fetch_time(iters)
    return max(t_n - t_1, 1e-9) / (iters - 1)


def main() -> None:
    import cheetah_tpu as ct
    from cheetah_tpu.lattices import ares_ea_subcell

    f32 = jnp.float32
    details = {}

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

    # Headline: vectorised RL env step (config 5 shape on one chip).
    num_instances, num_particles = 4096, 10_000
    segment = ares_ea_subcell(dtype=f32)
    segment.AREAMQZM1.k1 = jnp.linspace(-20, 20, num_instances, dtype=f32)
    num_elements = len(segment.elements)
    beam_10k = make_beam(num_particles)

    env_step = jax.jit(lambda seg, beam: seg.track(beam).sigma_x)
    dt = _timeit(env_step, segment, beam_10k)
    transports_per_s = num_instances * num_particles * num_elements / dt
    details["env_step_4096x10k_ms"] = dt * 1e3
    details["transports_per_s"] = transports_per_s
    # The step is HBM-bound on the particle array (one read pass); record the
    # achieved fraction of the v5e's ~819 GB/s.
    particle_bytes = num_instances * num_particles * 7 * 4
    details["env_step_hbm_gbps"] = particle_bytes / dt / 1e9

    # bf16 variant: halves the HBM traffic; physics precision drops to ~0.4%
    # on beam moments, acceptable for RL reward shaping.
    import jax.tree_util as jtu

    def to_bf16(tree):
        return jtu.tree_map(
            lambda x: x.astype(jnp.bfloat16)
            if hasattr(x, "dtype") and x.dtype == f32
            else x,
            tree,
        )

    segment_bf16, beam_bf16 = to_bf16(segment), to_bf16(beam_10k)
    dt_bf16 = _timeit(env_step, segment_bf16, beam_bf16)
    details["env_step_4096x10k_bf16_ms"] = dt_bf16 * 1e3
    details["transports_per_s_bf16"] = (
        num_instances * num_particles * num_elements / dt_bf16
    )

    # Config 1: ParameterBeam linear transport.
    parameter_beam = ct.ParameterBeam.from_twiss(
        beta_x=jnp.asarray(5.0, f32), emittance_x=jnp.asarray(2e-9, f32),
        beta_y=jnp.asarray(3.0, f32), emittance_y=jnp.asarray(2e-9, f32),
        energy=jnp.asarray(1.54e8, f32), dtype=f32,
    )
    # Sub-millisecond workload: use a longer fori-loop span so the slope is
    # not dominated by tunnel jitter.
    dt = _timeit(
        jax.jit(lambda s, b: s.track(b).sigma_x),
        segment,
        parameter_beam,
        iters=200,
    )
    details["parameter_beam_4096_env_step_ms"] = dt * 1e3

    # Reference CI workload: 100k particles + active CIC screen readout
    # (tests/test_speed.py: < 0.1 s on CPU).
    screen_segment = ares_ea_subcell(dtype=f32, screen=True)
    beam_100k = make_beam(100_000)

    @jax.jit
    def track_and_read(seg, beam):
        _, readings = seg.track_with_readings(beam)
        return readings["AREABSCR1"]

    dt = _timeit(track_and_read, screen_segment, beam_100k, iters=10)
    details["track_100k_with_screen_ms"] = dt * 1e3

    # Config 4 shape: space charge, 100k particles, 32^3 grid.
    sc_segment = ct.Segment(
        [
            ct.Drift(jnp.asarray(0.1, f32)),
            ct.SpaceChargeKick(jnp.asarray(0.2, f32)),
            ct.Drift(jnp.asarray(0.1, f32)),
            ct.SpaceChargeKick(jnp.asarray(0.2, f32)),
            ct.Drift(jnp.asarray(0.1, f32)),
        ]
    )
    dt = _timeit(
        jax.jit(lambda s, b: s.track(b).particles), sc_segment, beam_100k, iters=10
    )
    details["space_charge_100k_ms"] = dt * 1e3

    # The reference's own benchmark workload (tests/test_benchmark.py): the
    # complete 195-element ARES stage-3 lattice, linear tracking.
    from cheetah_tpu.lattices import ares_stage3

    # Fused linear tracking collapses the machine to ~9 runs over 2.8 MB of
    # particles, i.e. tens of microseconds per step — needs a long span for
    # the slope to clear the tunnel jitter.
    ares = ares_stage3(dtype=f32)
    dt = _timeit(
        jax.jit(lambda s, b: s.track(b).particles), ares, beam_100k, iters=1000
    )
    details["ares_full_lattice_100k_ms"] = dt * 1e3

    with open("bench_details.json", "w") as f:
        json.dump(details, f, indent=2)

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
