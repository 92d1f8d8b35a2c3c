from .modulated import (LooLik, ModLik, ModulatedLikelihood, SsLik,
                        exp_value_closed_form, gaussian_logdensity, log_lik_exp)

__all__ = ["ModulatedLikelihood", "ModLik", "LooLik", "SsLik",
           "exp_value_closed_form", "gaussian_logdensity", "log_lik_exp"]
