"""Mesh-sharded blocked Cholesky: single-model large-n scaling across chips.

The reference caps single-model size by memory and O(n³) time on one device
(its only escape hatches are inducing points, gpax/models/sparse_gp.py, and
CPU-offloaded batched prediction, gpax/models/gp.py:295-323).  This module is
the TPU-native "scale the big dimension" path promised in SURVEY.md §5: an n×n
gram too large for one chip's HBM is factored ACROSS the ICI mesh.

Design — decompose, don't hand-shard.  XLA's SPMD partitioner cannot partition
a Cholesky op (it replicates it), but it partitions matmuls perfectly.  So we
reuse the all-matmul recursive 2×2 blocking of ops/chol.py at coarse (leaf ≥
1024) granularity:

    L11, W11 = rec(K11)                    ← leaf: replicated jnp Cholesky
    L21      = K21 · W11ᵀ                  ← large matmul, sharded over mesh
    L22, W22 = rec(K22 − L21·L21ᵀ)         ← Schur update: sharded matmul
    W21      = −W22 · (L21 · W11)          ← sharded matmuls

with ``jax.lax.with_sharding_constraint`` pinning every O(n²)-sized
intermediate to a row sharding over the mesh axis, so XLA keeps the O(n³) work
and the O(n²) residency distributed and inserts the ICI collectives itself
(the scaling-book recipe: pick a mesh, annotate, let XLA do collectives).
Only O(leaf²)·log(n/leaf) work is replicated.

``sharded_mvn_log_prob_centered`` wraps the factorization into the NUTS
likelihood with the same closed-form matmul-only VJP as
ops.linalg.mvn_log_prob_centered, so a single large-n ExactGP fit runs
model-parallel across the mesh (the framework's TP analog; chains remain the
DP axis).  Activated through ``sharded_linalg(mesh)`` — see models/gp.py fit.
"""

from __future__ import annotations

import contextlib
import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import linalg as _linalg

_LOG_2PI = math.log(2.0 * math.pi)
_HI = jax.lax.Precision.HIGHEST


# ---------------------------------------------------------------------------
# Active-mesh context: lets model likelihoods opt into sharded linalg without
# threading a mesh through every distribution call site.
# ---------------------------------------------------------------------------

_ACTIVE: list = []


@contextlib.contextmanager
def sharded_linalg(mesh: Mesh, axis_name: Optional[str] = None,
                   leaf: int = 2048):
    """Context under which MVN likelihoods factor their covariance across
    ``mesh``: ``with sharded_linalg(mesh): gp.fit(...)`` runs the O(n³)
    per-leapfrog work model-parallel over the mesh axis."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    _ACTIVE.append((mesh, axis_name, leaf))
    try:
        yield
    finally:
        _ACTIVE.pop()


def active_sharded_linalg():
    return _ACTIVE[-1] if _ACTIVE else None


# ---------------------------------------------------------------------------
# Sharded recursive factorization
# ---------------------------------------------------------------------------

def _row_sharded(x, mesh, axis_name):
    spec = P(axis_name, *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, NamedSharding(mesh, spec))


def _mm(a, b):
    return jnp.matmul(a, b, precision=_HI)


def _rec(K, leaf, pin):
    n = K.shape[-1]
    if n <= leaf:
        # replicated leaf: ONE small factorization per recursion level
        L = jnp.linalg.cholesky(K)
        eye = jnp.eye(n, dtype=K.dtype)
        W = jax.scipy.linalg.solve_triangular(L, eye, lower=True)
        return L, W
    h = leaf * ((n // leaf) // 2)
    K11, K21, K22 = K[:h, :h], K[h:, :h], K[h:, h:]
    L11, W11 = _rec(K11, leaf, pin)
    L21 = pin(_mm(K21, W11.T))
    L22, W22 = _rec(pin(K22 - _mm(L21, L21.T)), leaf, pin)
    W21 = pin(-_mm(W22, _mm(L21, W11)))
    # concatenate, not jnp.block: block lowers to full-size pad/select
    # cascades (~10 extra matrix passes per assembly; see ops/chol.py)
    from ..ops.chol import _assemble_lower
    L = pin(_assemble_lower(L11, L21, L22))
    W = pin(_assemble_lower(W11, W21, W22))
    return L, W


def _pad_spd(K, n_pad):
    n = K.shape[-1]
    if n_pad == n:
        return K
    Kp = jnp.pad(K, ((0, n_pad - n), (0, n_pad - n)))
    idx = jnp.arange(n, n_pad)
    return Kp.at[idx, idx].set(jnp.ones((), K.dtype))


def sharded_chol_inv(K: jnp.ndarray, mesh: Mesh,
                     axis_name: Optional[str] = None,
                     leaf: int = 2048) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """(L, W=L⁻¹) of an SPD matrix with all O(n³) matmuls sharded over
    ``mesh``.  NaN-propagating on indefinite input, like the single-device
    paths, so jitter-escalation probes compose unchanged."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    n = K.shape[-1]
    n_pad = -(-n // leaf) * leaf
    pin = lambda x: _row_sharded(x, mesh, axis_name)  # noqa: E731
    L, W = _rec(_pad_spd(K, n_pad), leaf, pin)
    return L[:n, :n], W[:n, :n]


# ---------------------------------------------------------------------------
# Sharded MVN log-density with the closed-form matmul-only VJP
# ---------------------------------------------------------------------------

def make_sharded_mvn_log_prob(mesh: Mesh, axis_name: Optional[str] = None,
                              leaf: int = 2048):
    """Build log N(diff | 0, K + jitter·I) whose factorization AND backward
    pass are sharded over ``mesh``.  Same numerics contract as
    ops.linalg.mvn_log_prob_centered: θ-independent base jitter with
    cond-escalation, non-finite-masked gradients."""
    if axis_name is None:
        axis_name = mesh.axis_names[0]
    pin = lambda x: _row_sharded(x, mesh, axis_name)  # noqa: E731

    @jax.custom_vjp
    def log_prob(K, diff):
        return _fwd(K, diff)[0]

    def _factor(K):
        j_base, j_big, eye = _linalg._jitter_scales(K)
        L1, W1 = sharded_chol_inv(K + j_base * eye, mesh, axis_name, leaf)
        ok = jnp.all(jnp.isfinite(L1))
        return jax.lax.cond(
            ok,
            lambda: (L1, W1),
            lambda: sharded_chol_inv(K + j_big * eye, mesh, axis_name, leaf),
        )

    def _fwd(K, diff):
        L, W = _factor(K)
        alpha = W @ diff
        n = K.shape[-1]
        logdet = jnp.log(jnp.abs(jnp.diagonal(L))).sum(-1)
        lp = -0.5 * ((alpha * alpha).sum(-1) + n * _LOG_2PI) - logdet
        return lp, (W, alpha)

    def _bwd(res, g):
        W, alpha = res
        W = pin(jnp.where(jnp.isfinite(W), W, 0.0))
        alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)
        beta = W.T @ alpha
        # split-f32 compensated WᵀW (3 one-pass matmuls vs HIGHEST's 6; see
        # ops.linalg.wtw_compensated) — XLA shards the bf16 matmuls the same.
        # dK here, as in ops.linalg._mvn_lp_bwd, is only contracted against
        # symmetric ∂K/∂θ — the cheaper symmetric-equivalent gauge applies.
        Kinv = pin(_linalg.wtw_compensated(W, symmetric_consumer=True))
        bb = beta[:, None] * beta[None, :]
        dK = 0.5 * g * (bb - Kinv)
        ddiff = -g * beta
        return dK, ddiff

    log_prob.defvjp(_fwd, _bwd)
    return log_prob
