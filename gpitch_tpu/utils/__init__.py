from .math import (find_ideal_f0, freq2midi, gaussfun, igaussfun, ilogistic,
                   isoftplus, logistic, midi2freq, norm, softplus)

__all__ = ["logistic", "ilogistic", "softplus", "isoftplus", "gaussfun",
           "igaussfun", "norm", "midi2freq", "freq2midi", "find_ideal_f0"]
