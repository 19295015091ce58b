"""Generate the golden consistency corpus from the torch reference.

Tracks a fixed 3000-particle float64 beam through every element case in the
zoo with the REFERENCE implementation and stores the outgoing phase space to
``tests/resources/consistency/`` (the analogue of the reference's pickled
corpus, ``tests/test_elements.py:355-432``, regenerated as portable .npz).

Run manually when the zoo changes:

    python tests/generate_consistency_corpus.py
"""

import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent))
sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

RESOURCES = pathlib.Path(__file__).parent / "resources" / "consistency"

# The fixed incoming beam: deterministic, moment-matched, easily rebuilt from
# the stored array on the cheetah_tpu side.
INCOMING_SEED = 314159
NUM_PARTICLES = 3000
ENERGY = 1.5e8


def reference_incoming():
    sys.path.insert(0, "/root/reference")
    import torch

    torch.set_default_dtype(torch.float64)

    incoming = np.load(RESOURCES / "incoming.npz")["particles"]
    import cheetah as ref

    return ref.ParticleBeam(
        particles=torch.as_tensor(incoming, dtype=torch.float64),
        energy=torch.tensor(ENERGY, dtype=torch.float64),
    )


def main() -> None:
    RESOURCES.mkdir(parents=True, exist_ok=True)

    # Deterministic incoming particles (numpy RNG so no torch/jax needed to
    # rebuild them).
    rng = np.random.default_rng(INCOMING_SEED)
    phase_space = rng.normal(
        0.0,
        [1.7e-4, 4e-6, 1.7e-4, 4e-6, 1e-5, 1e-3],
        size=(NUM_PARTICLES, 6),
    )
    particles = np.concatenate(
        [phase_space, np.ones((NUM_PARTICLES, 1))], axis=1
    )
    np.savez_compressed(RESOURCES / "incoming.npz", particles=particles)

    from element_zoo import (
        COMPOSITE_CASES,
        ELEMENT_CASES,
        PARAMETER_ELEMENT_INDICES,
        build_ref_composite,
        build_ref_element,
    )

    incoming = reference_incoming()
    for index, (class_name, spec, parity) in enumerate(ELEMENT_CASES):
        if spec is None or not parity:
            continue
        element = build_ref_element(class_name, spec)
        outgoing = element.track(incoming)
        np.savez_compressed(
            RESOURCES / f"{index:03d}_{class_name}.npz",
            particles=outgoing.particles.detach().numpy(),
            energy=outgoing.energy.detach().numpy(),
            survival_probabilities=(
                outgoing.survival_probabilities.detach().numpy()
            ),
            s=outgoing.s.detach().numpy(),
        )
        print(f"wrote {index:03d}_{class_name}.npz")

    # Composite cases (verdict round 1): SpaceChargeKick, Superimposed,
    # CustomTransferMap, nested Segment, ParameterBeam-tracked variants.
    import torch

    import cheetah as ref

    def parameter_incoming():
        return ref.ParameterBeam.from_parameters(
            mu_x=torch.tensor(1e-4),
            mu_px=torch.tensor(-2e-5),
            sigma_x=torch.tensor(1.7e-4),
            sigma_px=torch.tensor(4e-6),
            sigma_y=torch.tensor(1.7e-4),
            sigma_py=torch.tensor(4e-6),
            sigma_tau=torch.tensor(1e-5),
            sigma_p=torch.tensor(1e-3),
            cov_xpx=torch.tensor(1e-10),
            energy=torch.tensor(ENERGY),
            total_charge=torch.tensor(1e-9),
        )

    # Per-element ParameterBeam-tracked variants (round-3 corpus extension).
    for index in PARAMETER_ELEMENT_INDICES:
        class_name, spec, _ = ELEMENT_CASES[index]
        element = build_ref_element(class_name, spec)
        outgoing = element.track(parameter_incoming())
        np.savez_compressed(
            RESOURCES / f"param_{index:03d}_{class_name}.npz",
            mu=outgoing.mu.detach().numpy(),
            cov=outgoing.cov.detach().numpy(),
            energy=outgoing.energy.detach().numpy(),
            s=outgoing.s.detach().numpy(),
            total_charge=outgoing.total_charge.detach().numpy(),
        )
        print(f"wrote param_{index:03d}_{class_name}.npz")

    for name, beam_kind in COMPOSITE_CASES:
        element = build_ref_composite(name)
        if beam_kind == "parameter":
            beam = ref.ParameterBeam.from_parameters(
                mu_x=torch.tensor(1e-4),
                mu_px=torch.tensor(-2e-5),
                sigma_x=torch.tensor(1.7e-4),
                sigma_px=torch.tensor(4e-6),
                sigma_y=torch.tensor(1.7e-4),
                sigma_py=torch.tensor(4e-6),
                sigma_tau=torch.tensor(1e-5),
                sigma_p=torch.tensor(1e-3),
                cov_xpx=torch.tensor(1e-10),
                energy=torch.tensor(ENERGY),
                total_charge=torch.tensor(1e-9),
            )
            outgoing = element.track(beam)
            np.savez_compressed(
                RESOURCES / f"composite_{name}_{beam_kind}.npz",
                mu=outgoing.mu.detach().numpy(),
                cov=outgoing.cov.detach().numpy(),
                energy=outgoing.energy.detach().numpy(),
                s=outgoing.s.detach().numpy(),
            )
        else:
            beam = reference_incoming()
            if beam_kind == "charged":
                beam = ref.ParticleBeam(
                    particles=beam.particles,
                    energy=beam.energy,
                    particle_charges=torch.full(
                        (NUM_PARTICLES,), 1e-9 / NUM_PARTICLES
                    ),
                )
            outgoing = element.track(beam)
            np.savez_compressed(
                RESOURCES / f"composite_{name}_{beam_kind}.npz",
                particles=outgoing.particles.detach().numpy(),
                energy=outgoing.energy.detach().numpy(),
                survival_probabilities=(
                    outgoing.survival_probabilities.detach().numpy()
                ),
                s=outgoing.s.detach().numpy(),
            )
        print(f"wrote composite_{name}_{beam_kind}.npz")


if __name__ == "__main__":
    main()
