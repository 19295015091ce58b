"""Live oracle against the reference implementation (desy-ml/cheetah).

The reference repo is mounted read-only; importing it (PyTorch CPU, float64)
gives an independent implementation to check numerical parity against —
the same strategy the reference itself uses against Ocelot
(``tests/test_compare_ocelot.py``).
"""

import sys

import numpy as np
import pytest

if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

try:
    import torch

    torch.set_default_dtype(torch.float64)

    import cheetah as ref
except Exception:  # pragma: no cover - only when the mount is absent
    # Live-oracle tests need the reference checkout; the stored golden corpus
    # (test_consistency.py) covers regression without it.
    pytest.skip(
        "torch reference implementation not importable", allow_module_level=True
    )

__all__ = ["ref", "torch", "to_torch", "to_numpy"]


def to_torch(x) -> torch.Tensor:
    """Convert a JAX array to a float64 torch tensor."""
    return torch.as_tensor(np.asarray(x), dtype=torch.float64)


def to_numpy(x) -> np.ndarray:
    """Convert a torch tensor to numpy."""
    return x.detach().cpu().numpy()


def ref_particle_beam(jax_beam) -> "ref.ParticleBeam":
    """Mirror a cheetah_tpu ParticleBeam into a reference ParticleBeam."""
    return ref.ParticleBeam(
        particles=to_torch(jax_beam.particles),
        energy=to_torch(jax_beam.energy),
        particle_charges=to_torch(jax_beam.particle_charges),
        survival_probabilities=to_torch(jax_beam.survival_probabilities),
        s=to_torch(jax_beam.s),
        species=ref.Species(jax_beam.species.name),
    )


def ref_parameter_beam(jax_beam) -> "ref.ParameterBeam":
    """Mirror a cheetah_tpu ParameterBeam into a reference ParameterBeam."""
    return ref.ParameterBeam(
        mu=to_torch(jax_beam.mu),
        cov=to_torch(jax_beam.cov),
        energy=to_torch(jax_beam.energy),
        total_charge=to_torch(jax_beam.total_charge),
        s=to_torch(jax_beam.s),
        species=ref.Species(jax_beam.species.name),
    )
