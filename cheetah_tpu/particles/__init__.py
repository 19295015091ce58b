from cheetah_tpu.particles.beam import Beam
from cheetah_tpu.particles.parameter_beam import ParameterBeam
from cheetah_tpu.particles.particle_beam import ParticleBeam
from cheetah_tpu.particles.species import Species

__all__ = ["Beam", "ParameterBeam", "ParticleBeam", "Species"]
