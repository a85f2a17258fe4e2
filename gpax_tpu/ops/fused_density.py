"""Fused GP marginal-likelihood op: gram → Cholesky → MVN density as ONE
custom-VJP op with closed-form hyperparameter gradients.

Why this op exists (measured on the real chip, LEAPFROG_PROFILE_r02.json):
the composed path kernel() → MVN.log_prob() chains two custom-VJP ops
(pallas_gram_ad, mvn_log_prob_centered), and the boundary between their
backward passes forces XLA to materialize the full dK cotangent and run
~10 unfused n²-sized passes (≈48 ms of the 97 ms MVN VJP at n=8192, plus
~57 ms of composition overhead in the full potential).  Fusing the whole
likelihood into one op puts the entire backward in ONE fusion scope with
closed forms:

    β  = Wᵀα,            C = ½·g·(ββᵀ − WᵀW)          (cotangent w.r.t. K)
    w  = C ∘ k_scale ∘ map'(r²),   wₛ = w + wᵀ          (symmetry of k_XX)
    ∂ℓ/∂k_length_a = −Σᵢ dXsᵢₐ · Xsᵢₐ / ℓₐ,  dXs = 2(rowsum(wₛ)∘Xs − wₛXs)
    ∂ℓ/∂k_scale    = Σ C ∘ map(r²)
    ∂ℓ/∂noise_eff  = diag(C),      ∂ℓ/∂diff = −g·β

Numerics contract matches ops.linalg: θ-independent base jitter is expected
to be INCLUDED in noise_eff by the caller (constant w.r.t. parameters), with
`lax.cond` escalation to an adaptive big jitter when the factorization fails
(CLAUDE.md f32 rules; see _jitter_scales).  Reference equivalent: the MVN
log-density inside numpyro at gpax/models/gp.py:160-164.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

from .chol import _interpret_mode
from .linalg import _chol_tri_factors_ld
from .pallas_gram import pallas_gram

_LOG_2PI = math.log(2.0 * math.pi)
_SQRT5 = math.sqrt(5.0)
_HI = jax.lax.Precision.HIGHEST


def _unbroadcast(x, shape):
    """Reduce a gradient to the (possibly broadcast) primal shape."""
    if jnp.shape(x) == shape:
        return x
    if len(shape) == 0:
        return jnp.sum(x)
    if shape[0] == 1 and jnp.shape(x)[0] != 1:
        return jnp.sum(x).reshape(shape)
    return x.reshape(shape)


def _maps(r2, kind):
    """(map(r²), map'(r²)) for the stationary kernel family."""
    if kind == "rbf":
        m = jnp.exp(-0.5 * r2)
        return m, -0.5 * m
    elif kind == "matern52":
        r = jnp.sqrt(jnp.maximum(r2, 1e-10))
        s5r = _SQRT5 * r
        e = jnp.exp(-s5r)
        m = (1.0 + s5r + (5.0 / 3.0) * r2) * e
        dm = jnp.where(r2 > 1e-10, -(5.0 / 6.0) * (1.0 + s5r) * e, 0.0)
        return m, dm
    raise ValueError(kind)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def gp_mvn_log_prob(X, k_length, k_scale, noise_eff, diff, kind="rbf"):
    """log N(diff | 0, k_scale·map(‖(x−x')/ℓ‖²) + diag(noise_eff)) with
    closed-form parameter gradients.  X is treated as CONSTANT data (zero
    cotangent).  noise_eff must already contain observation noise + jitter +
    the θ-independent base regularization (n-scaled, see linalg._jitter_scales).
    """
    return _fwd(X, k_length, k_scale, noise_eff, diff, kind)[0]


def _fwd(X, k_length, k_scale, noise_eff, diff, kind):
    n = X.shape[0]
    Xs = (X / k_length).astype(jnp.float32)
    noise_vec = jnp.broadcast_to(noise_eff, (n,)).astype(jnp.float32)
    # m = map(r²) kept as a residual: the RBF backward then needs NO gram
    # recompute (dm = −m/2) — one multiply+diag pass here buys the backward a
    # cross-matmul, the r² assembly, and an n²-sized exp
    m = pallas_gram(Xs, Xs, noise_vec, kind=kind, add_noise=False,
                    interpret=_interpret_mode())
    idx = jnp.arange(n)
    K = (k_scale * m).at[idx, idx].add(noise_vec)
    # K already carries the θ-independent base regularization via noise_eff
    # (the gp_mvn_log_prob contract), so base_jitter=None (no extra base add);
    # the shared helper fuses failure detection into the log-det reduction
    _, W, logdet = _chol_tri_factors_ld(K, None)
    alpha = W @ diff
    lp = -0.5 * ((alpha * alpha).sum() + n * _LOG_2PI) - logdet
    return lp, (Xs, W, alpha, m, k_length, k_scale, noise_eff, diff)


def _bwd(kind, res, g):
    Xs, W, alpha, m, k_length, k_scale, noise_eff, diff = res
    n = Xs.shape[0]
    # pin W/alpha as materialized: without this XLA rematerializes the blocked
    # trtri recursion into the backward consumers when fwd+bwd share one
    # program (measured 112→51.5 ms fwd+bwd at n=8192 — see linalg._mvn_lp_bwd)
    W, alpha = jax.lax.optimization_barrier((W, alpha))
    # non-finite factorization (even escalated) → zero, not NaN, gradients;
    # the guard is applied to the SMALL outputs at the end (big intermediates
    # may carry NaNs, the output masks stop them), so no n²-sized masks here
    ok = jnp.isfinite(alpha.sum()).astype(Xs.dtype)

    from .linalg import wtw_compensated

    beta = jax.lax.dot_general(W, alpha, (((0,), (0,)), ((), ())),
                               precision=_HI)                      # Wᵀα
    # split-f32 compensated WᵀW: 3 one-pass MXU matmuls vs HIGHEST's 6
    # (measured 42→~17 ms at n=8192, ~1e-6 rel err; PROFILE_r03 mvn_ablate)
    Kinv = wtw_compensated(W)                                      # WᵀW
    if kind == "rbf":
        dm = -0.5 * m
    else:
        cross = jax.lax.dot_general(Xs, Xs, (((1,), (1,)), ((), ())),
                                    precision=_HI)
        x2 = jnp.sum(Xs * Xs, axis=-1)
        r2 = jnp.maximum(x2[:, None] - 2.0 * cross + x2[None, :], 0.0)
        _, dm = _maps(r2, kind)

    # one fusion scope: C and the map chain; C is symmetric (bb and Kinv are)
    # and dm is symmetric, so the symmetrized weight is just 2w — no transpose
    C = (0.5 * g) * (beta[:, None] * beta[None, :] - Kinv)
    ws = C * ((2.0 * k_scale) * dm)

    dXs = 2.0 * (ws.sum(axis=1, keepdims=True) * Xs
                 - jnp.matmul(ws, Xs, precision=_HI))
    dk_length = _unbroadcast(-jnp.sum(dXs * Xs, axis=0) / k_length.reshape(-1)
                             if jnp.ndim(k_length)
                             else -jnp.sum(dXs * Xs) / k_length,
                             jnp.shape(k_length))
    # diag(K) = k_scale·map(0) + noise_eff: k_scale's cotangent includes the
    # diagonal map term (m=1 there); noise_eff's is diag(C) alone
    dk_scale = _unbroadcast(jnp.sum(C * m), jnp.shape(k_scale))
    dnoise_eff = _unbroadcast(jnp.diagonal(C), jnp.shape(noise_eff))
    ddiff = -g * beta
    # NaN-safety on the small outputs only (see `ok` above)
    z = jnp.zeros((), Xs.dtype)
    dk_length = jnp.where(jnp.isfinite(dk_length), ok * dk_length, z)
    dk_scale = jnp.where(jnp.isfinite(dk_scale), ok * dk_scale, z)
    dnoise_eff = jnp.where(jnp.isfinite(dnoise_eff), ok * dnoise_eff, z)
    ddiff = jnp.where(jnp.isfinite(ddiff), ok * ddiff, z)
    return (jnp.zeros(Xs.shape, Xs.dtype), dk_length, dk_scale,
            dnoise_eff, ddiff)


gp_mvn_log_prob.defvjp(_fwd, _bwd)
