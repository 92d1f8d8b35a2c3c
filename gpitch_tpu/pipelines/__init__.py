from .init import (init_iv, init_kern, init_kern_act, init_kern_com,
                   init_kern_mercer_product, init_kernel_training, init_liv)
from .kernel_learning import (approximate_kernel, autocorr, fit_kernel,
                              fit_kernel_gabor, gabor_sum, sample_cov)
from .resume import optimize_bank_resumable
from .separation import SoSp, learn_pitch_params, load_mixture_from_sources
from .transcription import AMT, f_measure, pianoroll_from_variances
from .windowed_sgpr import (bank_loss, build_window_bank, chunked_vmap,
                            optimize_bank, pad_inducing, pitch_variances,
                            predict_bank_mixture, predict_bank_sources)

__all__ = [
    "init_liv", "init_iv", "init_kernel_training", "init_kern_act",
    "init_kern_com", "init_kern", "init_kern_mercer_product",
    "sample_cov", "autocorr", "approximate_kernel", "fit_kernel",
    "fit_kernel_gabor", "gabor_sum",
    "SoSp", "learn_pitch_params", "load_mixture_from_sources",
    "AMT", "pianoroll_from_variances", "f_measure",
    "build_window_bank", "bank_loss", "optimize_bank", "pad_inducing",
    "pitch_variances", "predict_bank_mixture", "predict_bank_sources",
    "chunked_vmap", "optimize_bank_resumable",
]
