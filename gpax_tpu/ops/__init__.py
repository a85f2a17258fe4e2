from .chol import blocked_eligible, blocked_trtri, chol_inv
from .linalg import (
    cho_solve,
    chol_tri_factors,
    gp_predictive_mean_var,
    gp_predictive_moments,
    mvn_log_prob_centered,
    mvn_sample_from_cov,
    robust_mvn_sample,
    safe_chol_inv,
    safe_cholesky,
    tri_solve,
)

__all__ = [
    "safe_cholesky",
    "safe_chol_inv",
    "chol_inv",
    "chol_tri_factors",
    "mvn_log_prob_centered",
    "blocked_eligible",
    "blocked_trtri",
    "cho_solve",
    "tri_solve",
    "gp_predictive_moments",
    "gp_predictive_mean_var",
    "mvn_sample_from_cov",
    "robust_mvn_sample",
]
