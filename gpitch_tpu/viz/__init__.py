from .plots import (plot_fft, plot_kernel_fit, plot_pdgp, plot_pianoroll,
                    plot_predict, plot_sources, plotgp)

__all__ = ["plotgp", "plot_predict", "plot_fft", "plot_pianoroll",
           "plot_sources", "plot_kernel_fit", "plot_pdgp"]
