"""Numeric kernels: pure, statically-shaped JAX functions.

Every function here is unit-tested against hand-computed / SciPy values and
(where applicable) against a NumPy re-derivation of the reference algorithm
(tests/reference_impl.py).
"""

from .covariance import (
    CovarianceSpec,
    covariance_norm,
    make_matern_table,
    make_rotation_matrix,
    make_rho,
    make_sigma,
)
from .physics import (
    mass_conservation_residual,
    masked_gaussian_loss,
    thickness_violations,
)
from .spectral import sample_field_params, spectral_density, spectral_field
from .logistic import logistic_weight, crf_weight_from_dist, make_edge_mask
from .distance import min_dist_from_mask
from .transforms import NormalScoreTransform

__all__ = [
    "CovarianceSpec",
    "covariance_norm",
    "make_matern_table",
    "make_rotation_matrix",
    "make_rho",
    "make_sigma",
    "mass_conservation_residual",
    "masked_gaussian_loss",
    "thickness_violations",
    "sample_field_params",
    "spectral_density",
    "spectral_field",
    "logistic_weight",
    "crf_weight_from_dist",
    "make_edge_mask",
    "min_dist_from_mask",
    "NormalScoreTransform",
]
