"""Blocked Pallas Cholesky / triangular-inverse parity and gradient tests.

Runs on CPU with the Pallas tile kernel in interpret mode (conftest forces the
CPU platform); the compiled path is exercised on TPU by scripts/tpu_validate.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu import set_config
from gpax_tpu.ops.chol import chol_inv
from gpax_tpu.ops.linalg import safe_cholesky, safe_chol_inv


def _spd(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = A @ A.T / n + 0.5 * np.eye(n, dtype=np.float32)
    return jnp.asarray(K, dtype)


@pytest.mark.parametrize("n", [64, 128, 200, 384, 513])
def test_chol_inv_parity(n):
    K = _spd(n)
    L, W = chol_inv(K, True)
    L_ref = jnp.linalg.cholesky(K)
    assert jnp.allclose(L, L_ref, atol=2e-4, rtol=2e-4)
    # W really is L⁻¹
    assert jnp.allclose(W @ L, jnp.eye(n), atol=5e-4)
    # reconstruction
    assert jnp.allclose(L @ L.T, K, atol=5e-4, rtol=5e-4)


def test_chol_inv_nan_on_indefinite():
    n = 160
    K = _spd(n) - 5.0 * jnp.eye(n)  # indefinite
    L, W = chol_inv(K, True)
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_chol_inv_vmap():
    Ks = jnp.stack([_spd(192, seed=s) for s in range(3)])
    L, W = jax.vmap(lambda k: chol_inv(k, True))(Ks)
    L_ref = jnp.linalg.cholesky(Ks)
    assert jnp.allclose(L, L_ref, atol=2e-4, rtol=2e-4)
    # batched entry point (internal vmap over leading dims)
    L2, _ = chol_inv(Ks, True)
    assert jnp.allclose(L2, L_ref, atol=2e-4, rtol=2e-4)


def test_chol_inv_grad_matches_xla():
    """Gradients of scalar functions of L (and of W) must match XLA's
    cholesky/solve VJPs — this is the NUTS-potential gradient path."""
    n = 200
    K = _spd(n, seed=3)
    y = jnp.asarray(np.random.default_rng(1).normal(size=n), jnp.float32)
    P = jnp.asarray(np.random.default_rng(2).normal(size=(n, n)), jnp.float32) / n

    def f_blocked(K):
        L, W = chol_inv(K, True)
        maha = jnp.sum((W @ y) ** 2)
        logdet = jnp.sum(jnp.log(jnp.diagonal(L)))
        return 0.5 * maha + logdet + jnp.sum(L * P)

    def f_xla(K):
        L = jnp.linalg.cholesky(K)
        w = jax.scipy.linalg.solve_triangular(L, y, lower=True)
        maha = jnp.sum(w**2)
        logdet = jnp.sum(jnp.log(jnp.diagonal(L)))
        return 0.5 * maha + logdet + jnp.sum(L * P)

    g_blocked = jax.grad(f_blocked)(K)
    g_xla = jax.grad(f_xla)(K)
    # the XLA path's grad is already symmetric for this construction
    scale = jnp.max(jnp.abs(g_xla))
    assert jnp.max(jnp.abs(g_blocked - g_xla)) / scale < 5e-3


def test_safe_chol_inv_dispatch_and_escalation():
    set_config(use_pallas_chol="always")
    try:
        K = _spd(192, seed=5)
        L, W = safe_chol_inv(K)
        assert jnp.all(jnp.isfinite(L)) and jnp.all(jnp.isfinite(W))
        assert jnp.allclose(W @ L, jnp.eye(192), atol=5e-4)
        # near-singular gram: escalation must keep the factor finite
        v = jnp.ones((192, 1), jnp.float32)
        K_sing = v @ v.T + 1e-8 * jnp.eye(192)
        L2 = safe_cholesky(K_sing)
        assert jnp.all(jnp.isfinite(L2))
    finally:
        set_config(use_pallas_chol="auto")


def test_mvn_logprob_blocked_path_matches():
    from gpax_tpu import distributions as dist

    n = 192
    K = _spd(n, seed=7)
    y = jnp.asarray(np.random.default_rng(4).normal(size=n), jnp.float32)
    set_config(use_pallas_chol="always")
    try:
        lp_blocked = dist.MultivariateNormal(0.0, covariance_matrix=K).log_prob(y)
    finally:
        set_config(use_pallas_chol="auto")
    lp_xla = dist.MultivariateNormal(0.0, covariance_matrix=K).log_prob(y)
    assert jnp.allclose(lp_blocked, lp_xla, rtol=1e-4, atol=1e-2)


def test_mvn_potential_grad_blocked_path():
    """End-to-end: gradient of an MVN log-density w.r.t. kernel params through
    the blocked path stays close to the XLA path (HMC leapfrog accuracy gate)."""
    from gpax_tpu import distributions as dist
    from gpax_tpu.kernels import get_kernel

    n = 160
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0])
    kern = get_kernel("RBF")

    def potential(theta):
        params = {"k_length": jnp.exp(theta[0]), "k_scale": jnp.exp(theta[1])}
        K = kern(X, X, params, noise=jnp.exp(theta[2]))
        return -dist.MultivariateNormal(0.0, covariance_matrix=K).log_prob(y)

    theta = jnp.asarray([0.1, -0.2, -3.0], jnp.float32)
    set_config(use_pallas_chol="always")
    try:
        g_blocked = jax.grad(potential)(theta)
    finally:
        set_config(use_pallas_chol="auto")
    g_xla = jax.grad(potential)(theta)
    assert jnp.all(jnp.isfinite(g_blocked))
    assert jnp.max(jnp.abs(g_blocked - g_xla) / (jnp.abs(g_xla) + 1e-3)) < 2e-2
