"""Cholesky-centric linear algebra for GP posteriors.

The reference computes predictive posteriors with an explicit matrix inverse
(``jnp.linalg.inv(k_XX)`` at gpax/models/gp.py:271) — O(n³) and numerically poor.
Here every posterior uses ONE Cholesky factorization + triangular solves, batched
with ``vmap`` across posterior samples; this is both faster and stabler, and it is
the contract all models in this framework build on.

``safe_cholesky`` adds the standard jitter-escalation retry (absent in the
reference, which simply fails on near-singular grams): if a factorization produces
non-finite values, retry with 10×, 100×, 1000× jitter — implemented branch-free so
it stays jit/vmap-compatible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from ..config import get_config


def safe_cholesky(K: jnp.ndarray, base_jitter: float = 0.0) -> jnp.ndarray:
    """Cholesky with jitter-escalation fallback.  K is assumed to already include
    the model's noise/jitter diagonal; the escalation ladder is scaled by the mean
    diagonal so it is meaningful for any kernel output scale (f32-critical)."""
    cfg = get_config()
    n = K.shape[-1]
    if base_jitter == 0.0:
        base_jitter = 1e-6
    # relative floor: predictive covariances after cancellation carry absolute
    # errors proportional to the matrix scale, not to 1.0
    scale = jnp.maximum(jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1), 1e-12)
    eye = jnp.eye(n, dtype=K.dtype)
    L = jnp.linalg.cholesky(K)
    for mult in cfg.cholesky_jitter_schedule[1:]:
        bad = ~jnp.all(jnp.isfinite(L))
        K_retry = K + (base_jitter * mult) * jnp.maximum(1.0, scale)[..., None, None] * eye
        L_retry = jnp.linalg.cholesky(K_retry)
        L = jnp.where(bad, L_retry, L)
    return L


def robust_mvn_sample(key, mean: jnp.ndarray, cov: jnp.ndarray, n: int = 1) -> jnp.ndarray:
    """Draw n samples from N(mean, cov) with guaranteed-finite output.

    Predictive GP covariances (k_pp − k_pX K⁻¹ k_pXᵀ) are frequently numerically
    indefinite in f32; this symmetrizes, escalates jitter, and — if Cholesky still
    fails — falls back to independent sampling from the clipped diagonal (slightly
    underdispersed, never NaN).  The reference simply produces NaNs here
    (gpax/models/gp.py:292 via numpyro's MVN) and offers filter_nans downstream.
    """
    cov = 0.5 * (cov + jnp.swapaxes(cov, -1, -2))
    L = safe_cholesky(cov)
    ok = jnp.all(jnp.isfinite(L))
    diag_L = jnp.zeros_like(cov).at[
        ..., jnp.arange(cov.shape[-1]), jnp.arange(cov.shape[-1])
    ].set(jnp.sqrt(jnp.clip(jnp.diagonal(cov, axis1=-2, axis2=-1), 1e-12, None)))
    L = jnp.where(ok, L, diag_L)
    eps = jax.random.normal(key, (n,) + mean.shape, dtype=mean.dtype)
    return mean + jnp.einsum("...ij,s...j->s...i", L, eps)


def cho_solve(L: jnp.ndarray, B: jnp.ndarray) -> jnp.ndarray:
    """Solve K x = B given K = L Lᵀ."""
    y = solve_triangular(L, B, lower=True)
    return solve_triangular(L.T, y, lower=False)


def tri_solve(L: jnp.ndarray, B: jnp.ndarray, lower: bool = True,
              trans: bool = False) -> jnp.ndarray:
    return solve_triangular(L.T if trans else L, B, lower=(not lower) if trans else lower)


def gp_predictive_moments(
    k_XX: jnp.ndarray, k_pX: jnp.ndarray, k_pp: jnp.ndarray, y: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Standard GP posterior:  mean = k_pX K⁻¹ y,  cov = k_pp − k_pX K⁻¹ k_pXᵀ,
    via one Cholesky of k_XX and triangular solves (never an inverse).

    Replaces the inv-based math at gpax/models/gp.py:271-273.
    """
    L = safe_cholesky(k_XX)
    # A = L⁻¹ k_pXᵀ : (n, m)
    A = solve_triangular(L, k_pX.T, lower=True)
    # alpha = L⁻ᵀ L⁻¹ y
    v = solve_triangular(L, y, lower=True)
    mean = A.T @ v
    cov = k_pp - A.T @ A
    return mean, cov


def gp_predictive_mean_var(
    k_XX: jnp.ndarray, k_pX: jnp.ndarray, k_pp_diag: jnp.ndarray, y: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Mean and *diagonal* predictive variance only — O(n²m) instead of O(nm²),
    for MAP prediction paths (gpax/models/vigp.py:153-185 semantics)."""
    L = safe_cholesky(k_XX)
    A = solve_triangular(L, k_pX.T, lower=True)
    v = solve_triangular(L, y, lower=True)
    mean = A.T @ v
    var = k_pp_diag - jnp.sum(A * A, axis=0)
    return mean, var


def mvn_sample_from_cov(key, mean: jnp.ndarray, cov: jnp.ndarray,
                        n: int = 1) -> jnp.ndarray:
    """Draw n samples from N(mean, cov) via one Cholesky (shape (n, m))."""
    L = safe_cholesky(cov)
    eps = jax.random.normal(key, (n, mean.shape[0]), dtype=mean.dtype)
    return mean[None, :] + eps @ L.T
