from .ops import (add_jitter, base_conditional, base_conditional_inv,
                  chol_inv, conditional, gauss_kl, safe_chol_inv,
                  safe_cholesky, solve_lower, solve_upper)

__all__ = ["add_jitter", "safe_cholesky", "solve_lower", "solve_upper",
           "chol_inv", "safe_chol_inv", "conditional", "base_conditional",
           "base_conditional_inv", "gauss_kl"]
