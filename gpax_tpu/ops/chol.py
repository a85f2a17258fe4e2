"""Blocked Cholesky factorization + triangular inverse, TPU-first.

The O(n³) Cholesky inside every NUTS leapfrog (MVN likelihood, see
distributions.MultivariateNormal) and every posterior predictive is the
latency wall of this framework: XLA's TPU Cholesky expander runs ~n sequential
128-wide steps as *separate whole-program ops*, each paying full op dispatch
latency, and XLA's TriangularSolve expander is similarly serialized.  This is
the "native-equivalent surface" called out in SURVEY.md §2.5 (the ops behind
the reference's gpax/models/gp.py:271 inverse and sparse_gp.py:94-114 solves).

Design (all-matmul formulation):

  * ``_tile_chol_inv`` — a Pallas kernel that factors one (B, B) diagonal tile
    AND computes its lower-triangular inverse entirely in VMEM: the 2·B
    sequential steps run inside a single kernel at VPU latency instead of as
    2·B separate XLA ops.
  * ``chol_inv(K) -> (L, W=L⁻¹)`` — recursive 2×2 block scheme
        L11, W11 = chol_inv(K11)
        L21     = K21 · W11ᵀ                 (TRSM as one MXU matmul)
        L22, W22 = chol_inv(K22 − L21·L21ᵀ)  (Schur update on the MXU)
        W21     = −W22 · L21 · W11
    so every O(n³) term is a large HIGHEST-precision matmul.  Having W makes
    every downstream triangular solve a matmul too (MVN Mahalanobis terms,
    predictive k_pX·K⁻¹ products) — no serialized TRSM anywhere in the hot path.
  * custom VJP: the standard Cholesky pullback K̄ = sym(Wᵀ·Φ(Lᵀ·L̄)·W) (Φ = tril
    with halved diagonal) plus the inverse-function term L̄ += −tril(Wᵀ·W̄·Wᵀ),
    again pure matmuls — the backward pass rides the MXU as well.

Numerics: tile factorization uses plain sqrt (NaN on indefinite input, exactly
like ``jnp.linalg.cholesky``) so ops.linalg.safe_cholesky's probe-and-escalate
jitter logic keeps working unchanged.  All matmuls run at HIGHEST precision
(CLAUDE.md f32-on-TPU rule #1).  Parity/grad tests: tests/test_chol.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import get_config

_HI = jax.lax.Precision.HIGHEST

TILE = 128  # leaf block: one TPU lane width; 2·TILE sequential in-VMEM steps


# ---------------------------------------------------------------------------
# Leaf kernel: factor one (B, B) SPD tile and invert the factor, in VMEM
# ---------------------------------------------------------------------------

def _tile_chol_inv_kernel(a_ref, l_ref, w_ref):
    B = a_ref.shape[0]
    dt = a_ref.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    rowv = jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)
    colr = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)

    # Right-looking unblocked Cholesky: at step j take column j of the
    # (rank-1-updated) matrix, normalize, subtract the outer product.
    def chol_step(j, carry):
        A, L = carry
        col_j = jnp.sum(jnp.where(col == j, A, 0.0), axis=1, keepdims=True)  # (B,1)
        d2 = jnp.sum(jnp.where(rowv == j, col_j, 0.0))
        inv_d = jax.lax.rsqrt(d2)  # NaN for d2 < 0 — propagates like XLA chol
        l_j = jnp.where(rowv >= j, col_j * inv_d, jnp.zeros((), dt))          # (B,1)
        A = A - l_j * l_j.reshape(1, B)
        L = jnp.where(col == j, l_j, L)
        return A, L

    zero = jnp.zeros((B, B), dt)
    _, L = jax.lax.fori_loop(0, B, chol_step, (a_ref[:], zero))
    l_ref[:] = L

    # Forward substitution for W = L⁻¹, one row per step:
    #   W[i, :] = (e_i − L[i, :i] · W[:i, :]) / L[i, i]
    def inv_step(i, W):
        l_row = jnp.sum(jnp.where(row == i, L, 0.0), axis=0, keepdims=True)   # (1,B)
        l_ii = jnp.sum(jnp.where((row == i) & (col == i), L, 0.0))
        strict = jnp.where(colr < i, l_row, jnp.zeros((), dt))
        acc = jax.lax.dot_general(strict, W, (((1,), (0,)), ((), ())),
                                  preferred_element_type=dt)                  # (1,B)
        e_i = jnp.where(colr == i, jnp.ones((), dt), jnp.zeros((), dt))
        w_row = (e_i - acc) / l_ii
        return jnp.where(row == i, w_row, W)

    w_ref[:] = jax.lax.fori_loop(0, B, inv_step, zero)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tile_chol_inv(A: jnp.ndarray, interpret: bool = False):
    B = A.shape[-1]
    out = pl.pallas_call(
        _tile_chol_inv_kernel,
        out_shape=(
            jax.ShapeDtypeStruct(A.shape, A.dtype),
            jax.ShapeDtypeStruct(A.shape, A.dtype),
        ),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * B * B,
            bytes_accessed=3 * B * B * A.dtype.itemsize,
            transcendentals=2 * B,
        ),
        interpret=interpret,
    )(A)
    return out


# ---------------------------------------------------------------------------
# Recursive blocked scheme (static shapes; n a multiple of TILE)
# ---------------------------------------------------------------------------

def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _assemble_lower(B11, B21, B22):
    """[[B11, 0], [B21, B22]] via two concatenates.

    Preferred over ``jnp.block``, which lowers each quadrant to full-size
    pad/maximum/select cascades (~10 full-matrix HLO ops per assembly,
    r03 cost tally).  Measured wall-clock at n=8192 was unchanged (XLA
    fuses the pads cheaply), but concatenate keeps the HLO lean — each
    block is copied exactly once — and gives the fusion pass less to
    rematerialize into backward consumers."""
    h, w = B11.shape[-2], B22.shape[-1]
    top = jnp.concatenate([B11, jnp.zeros((h, w), B11.dtype)], axis=-1)
    bot = jnp.concatenate([B21, B22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def _chol_inv_rec(K, interpret):
    n = K.shape[-1]
    if n <= TILE:
        return _tile_chol_inv(K, interpret=interpret)
    h = TILE * ((n // TILE) // 2)
    K11, K21, K22 = K[:h, :h], K[h:, :h], K[h:, h:]
    L11, W11 = _chol_inv_rec(K11, interpret)
    L21 = _mm(K21, W11.T)                       # TRSM: L21·L11ᵀ = K21
    L22, W22 = _chol_inv_rec(K22 - _mm(L21, L21.T), interpret)
    W21 = -_mm(W22, _mm(L21, W11))
    L = _assemble_lower(L11, L21, L22)
    W = _assemble_lower(W11, W21, W22)
    return L, W


def _pad_spd(K, n_pad):
    """Pad an SPD matrix to (n_pad, n_pad) as block_diag(K, I): the factor and
    inverse of the padding are identity blocks that slice away exactly."""
    n = K.shape[-1]
    if n_pad == n:
        return K
    Kp = jnp.pad(K, ((0, n_pad - n), (0, n_pad - n)))
    idx = jnp.arange(n, n_pad)
    return Kp.at[idx, idx].set(jnp.ones((), K.dtype))


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def chol_inv(K: jnp.ndarray, interpret: bool = False):
    """(L, W=L⁻¹) of an SPD matrix via the blocked all-matmul scheme.

    NaN-propagating on indefinite input (like ``jnp.linalg.cholesky``) so it
    composes with safe_cholesky's jitter-escalation probe.  Batched inputs are
    vmapped over leading dims.
    """
    return _chol_inv_fwd(K, interpret)[0]


def _chol_inv_impl(K, interpret):
    if K.ndim > 2:
        return jax.vmap(lambda k: _chol_inv_impl(k, interpret))(K)
    n = K.shape[-1]
    n_pad = -(-n // TILE) * TILE
    L, W = _chol_inv_rec(_pad_spd(K, n_pad), interpret)
    return L[:n, :n], W[:n, :n]


def _chol_inv_fwd(K, interpret):
    L, W = _chol_inv_impl(K, interpret)
    return (L, W), (L, W)


def _phi(M):
    """Φ(M) = tril(M) with halved diagonal — the Cholesky-pullback projection."""
    return jnp.tril(M) - 0.5 * jnp.tril(jnp.triu(M))


def _chol_inv_bwd(interpret, res, cots):
    L, W = res
    # pin the residuals as materialized: XLA otherwise rematerializes the
    # blocked recursion into the backward consumers when fwd+bwd share one
    # value_and_grad program (measured 112→51.5 ms at n=8192 on the analogous
    # mvn path — see linalg._mvn_lp_bwd)
    L, W = jax.lax.optimization_barrier((L, W))
    Lb, Wb = cots
    Lt, Wt = jnp.swapaxes(L, -1, -2), jnp.swapaxes(W, -1, -2)
    # inverse-function term: dW = −W·dL·W  ⇒  L̄ += −Wᵀ·W̄·Wᵀ (lower part)
    Lbar = jnp.tril(Lb) - jnp.tril(_mm(Wt, _mm(jnp.tril(Wb), Wt)))
    P = _phi(_mm(Lt, Lbar))
    Kb = _mm(Wt, _mm(P, W))
    Kb = 0.5 * (Kb + jnp.swapaxes(Kb, -1, -2))
    return (Kb,)


chol_inv.defvjp(_chol_inv_fwd, _chol_inv_bwd)


# ---------------------------------------------------------------------------
# Triangular inverse alone (for factors produced by XLA's native Cholesky)
# ---------------------------------------------------------------------------

def _tile_tri_inv_kernel(l_ref, w_ref):
    B = l_ref.shape[0]
    dt = l_ref.dtype
    row = jax.lax.broadcasted_iota(jnp.int32, (B, B), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (B, B), 1)
    colr = jax.lax.broadcasted_iota(jnp.int32, (1, B), 1)
    L = l_ref[:]

    def inv_step(i, W):
        l_row = jnp.sum(jnp.where(row == i, L, 0.0), axis=0, keepdims=True)
        l_ii = jnp.sum(jnp.where((row == i) & (col == i), L, 0.0))
        strict = jnp.where(colr < i, l_row, jnp.zeros((), dt))
        acc = jax.lax.dot_general(strict, W, (((1,), (0,)), ((), ())),
                                  preferred_element_type=dt)
        e_i = jnp.where(colr == i, jnp.ones((), dt), jnp.zeros((), dt))
        w_row = (e_i - acc) / l_ii
        return jnp.where(row == i, w_row, W)

    w_ref[:] = jax.lax.fori_loop(0, B, inv_step, jnp.zeros((B, B), dt))


@functools.partial(jax.jit, static_argnames=("interpret",))
def _tile_tri_inv(L: jnp.ndarray, interpret: bool = False):
    B = L.shape[-1]
    return pl.pallas_call(
        _tile_tri_inv_kernel,
        out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=B * B * B,
            bytes_accessed=2 * B * B * L.dtype.itemsize,
            transcendentals=0,
        ),
        interpret=interpret,
    )(L)


def _trtri_rec(L, interpret):
    n = L.shape[-1]
    if n <= TILE:
        return _tile_tri_inv(L, interpret=interpret)
    h = TILE * ((n // TILE) // 2)
    W11 = _trtri_rec(L[:h, :h], interpret)
    W22 = _trtri_rec(L[h:, h:], interpret)
    W21 = -_mm(W22, _mm(L[h:, :h], W11))
    return _assemble_lower(W11, W21, W22)


def blocked_trtri(L: jnp.ndarray, interpret: bool = False) -> jnp.ndarray:
    """W = L⁻¹ for lower-triangular L: Pallas tile inversions on the diagonal,
    MXU matmuls everywhere else (the all-matmul replacement for XLA's
    serialized TriangularSolve-against-identity).  Not differentiable on its
    own — callers that need gradients wrap it in a custom VJP (see
    ops.linalg.mvn_log_prob_centered)."""
    if L.ndim > 2:
        return jax.vmap(lambda l: blocked_trtri(l, interpret))(L)
    n = L.shape[-1]
    n_pad = -(-n // TILE) * TILE
    if n_pad != n:
        Lp = jnp.pad(L, ((0, n_pad - n), (0, n_pad - n)))
        idx = jnp.arange(n, n_pad)
        L = Lp.at[idx, idx].set(jnp.ones((), L.dtype))
    W = _trtri_rec(L, interpret)
    return W[:n, :n]


# ---------------------------------------------------------------------------
# Dispatch policy
# ---------------------------------------------------------------------------

def blocked_eligible(n: int, dtype) -> bool:
    """True when (n, dtype, backend, config) should take the blocked Pallas
    Cholesky path instead of XLA's ``jnp.linalg.cholesky``."""
    cfg = get_config()
    if cfg.use_pallas_chol == "never":
        return False
    if dtype != jnp.float32:
        return False
    if cfg.use_pallas_chol == "always":
        return True
    return (
        jax.default_backend() in ("tpu", "axon")
        and n >= cfg.pallas_chol_min_n
    )


def _interpret_mode() -> bool:
    return jax.default_backend() not in ("tpu", "axon")
