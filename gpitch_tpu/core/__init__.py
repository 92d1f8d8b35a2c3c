from .params import (Param, constrained, module, n_params, param,
                     positive_param, static_field, zero_untrainable_grads)
from .quadrature import expectation_gaussian_nonlin, gauss_hermite_moments, hermgauss
from .transforms import FillTriangular, Identity, Logistic, Positive, Transform

__all__ = [
    "Param", "param", "positive_param", "module", "static_field",
    "zero_untrainable_grads", "constrained", "n_params",
    "hermgauss", "gauss_hermite_moments", "expectation_gaussian_nonlin",
    "Transform", "Identity", "Positive", "Logistic", "FillTriangular",
]
