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

import math

from .chol import blocked_eligible, blocked_trtri, chol_inv, _interpret_mode

_LOG_2PI = math.log(2.0 * math.pi)

# measured on the real chip (scripts r02): XLA's native TPU Cholesky forward is
# at least as fast as the blocked Pallas scheme, so the factorization itself
# stays on XLA; the blocked Pallas machinery supplies what XLA serializes —
# the triangular INVERSE (blocked_trtri, all MXU matmuls) — and custom VJPs
# keep every backward pass matmul-only (mvn_log_prob_centered below).


def _chol(K: jnp.ndarray) -> jnp.ndarray:
    return jnp.linalg.cholesky(K)


def _chol_with_inv(K: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, W=L⁻¹) pair; blocked Pallas path when eligible (differentiable via
    chol_inv's custom VJP), XLA solve-against-identity otherwise."""
    if blocked_eligible(K.shape[-1], K.dtype):
        return chol_inv(K, _interpret_mode())
    L = jnp.linalg.cholesky(K)
    eye = jnp.broadcast_to(jnp.eye(K.shape[-1], dtype=K.dtype), K.shape)
    return L, solve_triangular(L, eye, lower=True)


def _jitter_scales(K: jnp.ndarray, base_jitter: float = 0.0):
    """(j_base, j_big, eye): the n-scaled base regularization and the escalated
    fallback used by every factorization entry point (see safe_cholesky).

    j_base is deliberately θ-INDEPENDENT (no multiplication by K's diagonal
    scale): a parameter-dependent regularizer changes the potential's gradient
    — measured +16 on d/d(log k_scale) at n=2048 through the old
    jb ∝ mean(diag K) term, dominating the physical gradient (−3.6) and biasing
    the posterior relative to the reference's fixed-jitter likelihood
    (gpax/kernels/kernels.py:24-25).  The escalated branch keeps the adaptive
    scale: it exists for factorability, fires rarely, and any gradient through
    it is already a heavy regularization regime."""
    n = K.shape[-1]
    dtype_eps = jnp.finfo(K.dtype).eps
    scale = jnp.maximum(jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1), 1e-12)
    eye = jnp.eye(n, dtype=K.dtype)
    j_base = jnp.full_like(scale, jnp.maximum(4.0 * n * dtype_eps, base_jitter))
    j_big = jnp.maximum(0.05, 1000.0 * n * dtype_eps) * scale
    return j_base, j_big, eye


def _chol_tri_factors_ld(K: jnp.ndarray, base_jitter: float = 0.0
                         ) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(L, W=L⁻¹, log|L|) of K + jitter·I — the op-diet core of the hot
    factor path (every XLA op on this runtime bears a multi-ms dispatch
    floor, CLAUDE.md):

      * the base jitter is a PYTHON constant (θ-independent by the
        _jitter_scales contract), so the common path never reads K's
        diagonal — the adaptive ``j_big`` scale is computed only inside the
        rarely-taken escalation branch of the ``lax.cond``;
      * factorization failure is detected from the log-det reduction itself:
        a failed f32 Cholesky always poisons the DIAGONAL (the failing pivot's
        rsqrt yields the NaN; an off-diagonal ±inf feeds the next diagonal's
        inf−inf), so ``isfinite(Σ log|diag L|)`` is an n-sized check that
        doubles as the density's log-determinant — one op where the old path
        spent an n²-sized isfinite + a separate diag/log/sum chain.
    """
    if K.ndim > 2:
        return jax.vmap(lambda k: _chol_tri_factors_ld(k, base_jitter))(K)
    n = K.shape[-1]
    eye = jnp.eye(n, dtype=K.dtype)
    # base_jitter=None: operand already carries its base regularization on the
    # diagonal (the fused-likelihood contract, ops/fused_density.py) — factor
    # K as-is, keeping only the escalation fallback
    j_base = 0.0 if base_jitter is None else \
        max(4.0 * n * float(jnp.finfo(K.dtype).eps), base_jitter)

    def _chol_ld(Kj):
        L = jnp.linalg.cholesky(Kj)
        ld = jnp.log(jnp.abs(jnp.diagonal(L))).sum()
        return L, ld

    L1, ld1 = _chol_ld(K + j_base * eye if j_base else K)
    ok = jnp.isfinite(ld1)

    def _escalate():
        scale = jnp.maximum(jnp.mean(jnp.diagonal(K)), 1e-12)
        j_big = jnp.maximum(0.05, 1000.0 * n * jnp.finfo(K.dtype).eps) * scale
        return _chol_ld(K + j_big * eye)

    L, ld = jax.lax.cond(ok, lambda: (L1, ld1), _escalate)
    if blocked_eligible(n, K.dtype):
        return L, blocked_trtri(L, _interpret_mode()), ld
    return L, solve_triangular(L, eye, lower=True), ld


def chol_tri_factors(K: jnp.ndarray, base_jitter: float = 0.0
                     ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, W=L⁻¹) of K + jitter·I for NON-differentiated consumers (predictive
    paths): XLA's native Cholesky for the factor, blocked Pallas trtri for the
    inverse (above the Pallas threshold; one XLA TRSM-against-identity below
    it — at small n a single solve op beats tile-kernel padding, and on CPU it
    avoids interpret-mode Pallas entirely), and ``lax.cond`` jitter escalation
    so the common (PD) case pays exactly ONE factorization — unlike
    safe_cholesky's always-on probe, which exists to keep gradients NaN-free
    and is unnecessary without gradients."""
    if K.ndim > 2:
        return jax.vmap(lambda k: chol_tri_factors(k, base_jitter))(K)
    L, W, _ = _chol_tri_factors_ld(K, base_jitter)
    return L, W


def wtw_compensated(W: jnp.ndarray, symmetric_consumer: bool = False) -> jnp.ndarray:
    """K⁻¹ = WᵀW via split-f32: W = hi + lo (hi = bf16(W)), so

        WᵀW ≈ hiᵀhi + (hiᵀlo + (hiᵀlo)ᵀ)        (loᵀlo ~ 2⁻²² relative, dropped)

    — three ONE-pass MXU matmuls instead of HIGHEST's six passes.  Measured on
    chip at n=8192 (PROFILE_r03.jsonl mvn_ablate): the HIGHEST backward WᵀW
    block costs 42 ms vs 15.6 ms single-pass; this form gets single-pass-class
    speed with ~1e-6 relative error instead of bf16's ~4e-3 — the 'compensated
    backward WᵀW' lever deferred from round 2 (CLAUDE.md).

    ``symmetric_consumer``: the caller only ever contracts the result against
    symmetric matrices (⟨A, S⟩ with Sᵀ=S depends only on A's symmetric part),
    so ``hiᵀhi + 2·hiᵀlo`` — same symmetric part — is returned instead,
    dropping one n³ MXU pass and the n² transpose.  Only affects the
    'compensated' mode (the others are single products, already symmetric)
    and only when Config.mvn_dk_gauge == 'symmetric_equivalent'."""
    from ..config import get_config

    cfg = get_config()
    mode = cfg.wtw_precision
    if mode == "highest":
        return jnp.matmul(jnp.swapaxes(W, -1, -2), W,
                          precision=jax.lax.Precision.HIGHEST)
    if mode == "default":
        return jnp.matmul(jnp.swapaxes(W, -1, -2), W,
                          precision=jax.lax.Precision.DEFAULT)
    hi = W.astype(jnp.bfloat16)
    lo = (W - hi.astype(W.dtype)).astype(jnp.bfloat16)

    def tdot(a, b):
        return jnp.matmul(jnp.swapaxes(a, -1, -2), b,
                          preferred_element_type=W.dtype)

    main = tdot(hi, hi)
    if symmetric_consumer and cfg.mvn_dk_gauge == "symmetric_equivalent":
        return main + 2.0 * tdot(hi, lo)
    cross = tdot(hi, lo)
    return main + (cross + jnp.swapaxes(cross, -1, -2))


@jax.custom_vjp
def mvn_log_prob_centered(K: jnp.ndarray, diff: jnp.ndarray) -> jnp.ndarray:
    """log N(diff | 0, K + jitter·I) with a matmul-only custom VJP.

    This is THE per-leapfrog op of NUTS over GP hyperparameters (the likelihood
    at models/gp.py:125; reference equivalent inside numpyro's MVN at
    gpax/models/gp.py:160-164).  Forward: one XLA Cholesky (cond-escalated
    jitter) + blocked Pallas trtri + one matvec.  Backward: the closed form
      ∂logp/∂K = ½(ββᵀ − K⁻¹),  β = K⁻¹·diff,  K⁻¹ = WᵀW
    — one MXU matmul instead of the ~5 factorization-shaped pullbacks of a
    generic Cholesky VJP (measured 2.5× faster per leapfrog at n=4096).
    Non-finite residuals are zeroed in the backward pass, so escalated/failed
    factorizations yield zero (not NaN) gradients under ``where`` masking.

    Gauge note: K is constrained symmetric, so its cotangent is only defined
    up to an antisymmetric part (⟨dK, ∂K/∂θ⟩ with symmetric ∂K/∂θ).  Under
    ``Config.mvn_dk_gauge='symmetric_equivalent'`` the backward returns a dK
    with the correct symmetric part but a nonzero antisymmetric part (one
    fewer n³ MXU pass); with the default ``'exact'`` gauge dK is symmetric.
    """
    return _mvn_lp_fwd(K, diff)[0]


def _mvn_lp_fwd(K, diff):
    _, W, logdet = _chol_tri_factors_ld(K)
    alpha = jnp.einsum("...ij,...j->...i", W, diff)
    n = K.shape[-1]
    lp = -0.5 * ((alpha * alpha).sum(-1) + n * _LOG_2PI) - logdet
    return lp, (W, alpha, diff.shape)


def _unbroadcast(x, shape):
    extra = x.ndim - len(shape)
    if extra > 0:
        x = x.sum(axis=tuple(range(extra)))
    axes = tuple(i for i, (a, b) in enumerate(zip(x.shape, shape)) if a != b)
    if axes:
        x = x.sum(axis=axes, keepdims=True)
    return x.reshape(shape)


def _mvn_lp_bwd(res, g):
    W, alpha, diff_shape = res
    # Under value_and_grad the custom-VJP fwd and bwd land in ONE XLA program,
    # and XLA's fusion pass REMATERIALIZES W's producer chain (the blocked
    # trtri recursion) into the backward consumers instead of reusing the
    # materialized W.  Measured at n=8192 (r03 bwdiso probe): fwd+bwd 112 ms
    # without the barrier vs 51.5 ms with it — the barrier restores the
    # sum-of-parts cost (chol 12.9 + trtri 17.4 + WᵀW 17.8 + O(n²) ≈ 51 ms).
    W, alpha = jax.lax.optimization_barrier((W, alpha))
    beta = jnp.einsum("...ji,...j->...i", W, alpha)
    # the dominant n³ term of every leapfrog backward: split-f32 compensated
    # (3 one-pass matmuls, ~1e-6 rel err) — see wtw_compensated.  dK is only
    # ever contracted against ij-symmetric sensitivities ∂K/∂θ (K is built
    # symmetric), so under Config.mvn_dk_gauge='symmetric_equivalent' the
    # cheaper same-symmetric-part form is used (one fewer n³ pass).
    Kinv = wtw_compensated(W, symmetric_consumer=True)
    bb = jnp.einsum("...i,...j->...ij", beta, beta)
    dK = 0.5 * g[..., None, None] * (bb - Kinv)
    ddiff = -g[..., None] * beta
    # non-finite factorizations (even escalated) must yield ZERO, not NaN,
    # cotangents.  Masking the OUTPUTS (fused into the dK/ddiff writes) costs
    # nothing extra; the old input-side where(isfinite(W)) was two standalone
    # n²-sized passes on this multi-ms-per-op runtime.
    dK = jnp.where(jnp.isfinite(dK), dK, 0.0)
    ddiff = jnp.where(jnp.isfinite(ddiff), ddiff, 0.0)
    return _unbroadcast(dK, W.shape), _unbroadcast(ddiff, diff_shape)


mvn_log_prob_centered.defvjp(_mvn_lp_fwd, _mvn_lp_bwd)


def safe_cholesky(K: jnp.ndarray, base_jitter: float = 0.0) -> jnp.ndarray:
    """NaN-proof, gradient-safe Cholesky for f32 GP grams on TPU.

    f32 Cholesky error grows like n·eps·‖K‖, so large low-rank grams routinely
    fail to factor even when mathematically PD (the reference leans on f64-on-CPU;
    SURVEY.md hard part #4).  Strategy:

      1. always add a deterministic, θ-INDEPENDENT n-scaled regularization
         j_base = max(4·n·eps, base_jitter) (≈4e-6 at n=8, ≈1e-3 at n=2048,
         assuming O(1)-normalized data) — below the f32 resolution of the
         factorization itself, and constant w.r.t. model parameters so it
         neither distorts HMC gradients nor biases the posterior
         (see _jitter_scales);
      2. probe factorability once under stop_gradient; if the probe fails,
         escalate to j_big ~ max(0.05, 1e3·n·eps)·scale (a smooth extra-noise
         regularization, infinitely better than a NaN potential walling off the
         posterior mode).

    The differentiable Cholesky runs exactly once, on an operand that is PSD by
    construction, through jax's NATIVE VJP — a hand-written pullback was measured
    350x less accurate in f32 on TPU (3.7e-4 vs 1.1e-6 relative gradient error)
    and collapsed HMC acceptance; the extra stop-gradient probe factorization is
    the price of both NaN-safety and gradient accuracy.  (A plain where()-retry
    is NOT gradient-safe: the untaken NaN branch poisons the VJP.)
    """
    j_base, j_big, eye = _jitter_scales(K, base_jitter)

    Kp = jax.lax.stop_gradient(K)
    L_probe = _chol(Kp + j_base[..., None, None] * eye)
    ok = jnp.all(jnp.isfinite(L_probe), axis=(-2, -1))
    j = jnp.where(ok, j_base, j_big)
    return _chol(K + j[..., None, None] * eye)


def safe_chol_inv(K: jnp.ndarray, base_jitter: float = 0.0
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, W=L⁻¹) with the same jitter-escalation semantics as safe_cholesky.

    With W in hand every downstream triangular solve becomes an MXU matmul —
    the TPU-native replacement for XLA's serialized TriangularSolve expander.
    On the blocked Pallas path (ops/chol.py) W is a byproduct of factorization.
    """
    j_base, j_big, eye = _jitter_scales(K, base_jitter)

    Kp = jax.lax.stop_gradient(K)
    L_probe = _chol(Kp + j_base[..., None, None] * eye)
    ok = jnp.all(jnp.isfinite(L_probe), axis=(-2, -1))
    j = jnp.where(ok, j_base, j_big)
    return _chol_with_inv(K + j[..., None, None] * eye)


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
    if blocked_eligible(k_XX.shape[-1], k_XX.dtype):
        # blocked path: W = L⁻¹ (one factorization, cond-escalated jitter),
        # so both solves become MXU matmuls
        _, W = chol_tri_factors(k_XX)
        A = W @ k_pX.T
        v = W @ y
    else:
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
    if blocked_eligible(k_XX.shape[-1], k_XX.dtype):
        _, W = chol_tri_factors(k_XX)
        A = W @ k_pX.T
        v = W @ y
    else:
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
