from .fit import adam_step_fn, fit_adam, fit_lbfgs, minibatch_fn
from .sgpr import GPR, SGPR, SGPRSS
from .svgp import ModGP, predict_windowed

__all__ = ["ModGP", "predict_windowed", "GPR", "SGPR", "SGPRSS",
           "fit_adam", "fit_lbfgs", "adam_step_fn", "minibatch_fn"]
