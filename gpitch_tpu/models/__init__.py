from .fit import (adam_step_fn, fit_adam, fit_adam_segmented, fit_adam_timed, fit_modgp,
                  fit_lbfgs, minibatch_fn)
from .hmc import hmc_sample, model_logprob_fn
from .natgrad import fit_natgrad_adam, natgrad_step
from .sgpr import GPR, SGPR, SGPRSS
from .svgp import ModGP, predict_windowed

__all__ = ["ModGP", "predict_windowed", "GPR", "SGPR", "SGPRSS",
           "fit_adam", "fit_adam_segmented", "fit_adam_timed", "fit_modgp", "fit_lbfgs", "adam_step_fn", "minibatch_fn",
           "natgrad_step", "fit_natgrad_adam", "hmc_sample", "model_logprob_fn"]
