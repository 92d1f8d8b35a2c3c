"""gpitch_tpu — a TPU-native variational Gaussian-process framework for
polyphonic music audio (source separation + multi-pitch transcription).

Brand-new JAX/XLA/Pallas implementation with the capabilities of
PabloAlvarado/gpitch (reference mounted at /root/reference): modulated-GP
models s_i(t) = nlin(g_i(t)) * f_i(t), spectral-mixture pitch kernels, SVGP
and collapsed-SGPR inference, windowed overlap-add processing, and separation/
transcription pipelines — all as pure-functional pytrees compiled end-to-end.
"""

from . import (audio, config, kernels, likelihoods, linalg, models, parallel,
               pipelines, utils)
from .audio.windowing import segmented
from .config import (NumericsConfig, default_float, default_jitter,
                     init_settings, set_jitter)
from .core import (Param, constrained, gauss_hermite_moments, hermgauss, module,
                   param, positive_param, static_field, zero_untrainable_grads)
from .models import GPR, SGPR, SGPRSS, ModGP, fit_adam, fit_lbfgs, predict_windowed
from .utils.files import (append_sources, load_filenames, load_pitch_params_data,
                          loadm, merge_all)
from .utils.math import (find_ideal_f0, freq2midi, gaussfun, ilogistic,
                         isoftplus, logistic, midi2freq, norm, softplus)

__version__ = "0.1.0"
