"""Headline benchmark: macroparticle-element transports/s/chip.

Tracks a 100k-macroparticle ParticleBeam through the ARES EA subcell
(drifts + 3 quads + 2 correctors — the reference's ``tests/test_speed.py``
configuration) under ``jax.jit`` on one chip and reports throughput as
macroparticle-element transports per second.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} where
``vs_baseline`` is the ratio to the 1e9 transports/s/chip target from
BASELINE.json (the reference publishes no absolute numbers; its only hard
figure is <0.1 s for this config on CI CPU, which this run beats by orders of
magnitude).
"""

import json
import time

import jax
import jax.numpy as jnp


def main() -> None:
    from cheetah_tpu import ParticleBeam
    from cheetah_tpu.lattices import ares_ea_subcell

    num_particles = 100_000
    dtype = jnp.float32

    segment = ares_ea_subcell(dtype=dtype)
    num_elements = len(segment.elements)

    beam = ParticleBeam.from_twiss(
        num_particles=num_particles,
        beta_x=jnp.asarray(5.0, dtype),
        alpha_x=jnp.asarray(-1.0, dtype),
        emittance_x=jnp.asarray(2e-9, dtype),
        beta_y=jnp.asarray(3.0, dtype),
        alpha_y=jnp.asarray(0.5, dtype),
        emittance_y=jnp.asarray(2e-9, dtype),
        energy=jnp.asarray(1.54e8, dtype),
        key=jax.random.PRNGKey(0),
        dtype=dtype,
    )

    @jax.jit
    def step(segment, beam):
        outgoing = segment.track(beam)
        # Touch a readout so nothing is dead-code eliminated.
        return outgoing.particles, outgoing.mu_x, outgoing.sigma_x

    # Warm up (compile).
    particles, mu_x, _ = step(segment, beam)
    jax.block_until_ready(particles)

    # Timed runs.
    num_iters = 200
    start = time.perf_counter()
    for _ in range(num_iters):
        particles, mu_x, sigma_x = step(segment, beam)
    jax.block_until_ready(particles)
    elapsed = time.perf_counter() - start

    transports_per_s = num_particles * num_elements * num_iters / elapsed
    target = 1e9  # BASELINE.json north-star target per chip

    print(
        json.dumps(
            {
                "metric": "macroparticle-element transports/s/chip (ARES EA, 100k particles, jit)",
                "value": transports_per_s,
                "unit": "transports/s",
                "vs_baseline": transports_per_s / target,
            }
        )
    )


if __name__ == "__main__":
    main()
