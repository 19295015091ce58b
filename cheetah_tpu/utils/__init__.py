from cheetah_tpu.utils.elementwise_linspace import elementwise_linspace
from cheetah_tpu.utils.maths import (
    cos_sqrt,
    cossqrtmcosdivdiff,
    log1pdiv,
    si1mdiv,
    si2msi2divdiff,
    sicos1mdiv,
    simsidivdiff,
    sinc_sqrt,
    sipsicos3mdiv,
    sqrta2minusbdiva,
)
from cheetah_tpu.utils.names import UniqueNameGenerator, merge_element_names
from cheetah_tpu.utils.physics import compute_relativistic_factors
from cheetah_tpu.utils.pytree import (
    axis_field,
    pytree_dataclass,
    replace,
    static_field,
    tree_equal,
)
from cheetah_tpu.utils.rng import ensure_key, next_key, seed
from cheetah_tpu.utils.statistics import (
    match_distribution_moments,
    unbiased_weighted_covariance,
    unbiased_weighted_covariance_matrix,
    unbiased_weighted_std,
    unbiased_weighted_variance,
)
from cheetah_tpu.utils.warnings import (
    DefaultParameterWarning,
    DirtyNameWarning,
    NoBeamPropertiesInLatticeWarning,
    NotUnderstoodPropertyWarning,
    PhysicsWarning,
    UnknownElementWarning,
    VisualizationWarning,
)

__all__ = [
    "axis_field",
    "compute_relativistic_factors",
    "cos_sqrt",
    "cossqrtmcosdivdiff",
    "DefaultParameterWarning",
    "DirtyNameWarning",
    "elementwise_linspace",
    "ensure_key",
    "log1pdiv",
    "match_distribution_moments",
    "merge_element_names",
    "next_key",
    "NoBeamPropertiesInLatticeWarning",
    "NotUnderstoodPropertyWarning",
    "PhysicsWarning",
    "pytree_dataclass",
    "replace",
    "seed",
    "si1mdiv",
    "si2msi2divdiff",
    "sicos1mdiv",
    "simsidivdiff",
    "sinc_sqrt",
    "sipsicos3mdiv",
    "sqrta2minusbdiva",
    "static_field",
    "tree_equal",
    "unbiased_weighted_covariance",
    "unbiased_weighted_covariance_matrix",
    "unbiased_weighted_std",
    "unbiased_weighted_variance",
    "UniqueNameGenerator",
    "UnknownElementWarning",
    "VisualizationWarning",
]
