from .ops import (add_jitter, base_conditional, conditional, gauss_kl,
                  safe_cholesky, solve_lower, solve_upper)

__all__ = ["add_jitter", "safe_cholesky", "solve_lower", "solve_upper",
           "conditional", "base_conditional", "gauss_kl"]
