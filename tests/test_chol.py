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

    # f64 ground truth (the f32 XLA solve path itself deviates ~2.5% on this
    # problem; the closed-form blocked gradient is the MORE accurate one)
    jax.config.update("jax_enable_x64", True)
    try:
        X64 = jnp.asarray(np.asarray(X), jnp.float64)
        y64 = jnp.sin(2 * X64[:, 0])

        def potential64(theta):
            params = {"k_length": jnp.exp(theta[0]), "k_scale": jnp.exp(theta[1])}
            K = kern(X64, X64, params, noise=jnp.exp(theta[2]))
            L = jnp.linalg.cholesky(K)
            w = jax.scipy.linalg.solve_triangular(L, y64, lower=True)
            return (0.5 * jnp.sum(w**2) + jnp.sum(jnp.log(jnp.diagonal(L)))
                    + 0.5 * n * jnp.log(2 * jnp.pi))

        g64 = jax.grad(potential64)(jnp.asarray(np.asarray(theta), jnp.float64))
    finally:
        jax.config.update("jax_enable_x64", False)
    assert jnp.all(jnp.isfinite(g_blocked))
    g64 = jnp.asarray(np.asarray(g64), jnp.float32)
    assert jnp.max(jnp.abs(g_blocked - g64) / (jnp.abs(g64) + 1e-3)) < 5e-3


def test_blocked_trtri_parity():
    from gpax_tpu.ops.chol import blocked_trtri

    for n in [128, 200, 384]:
        L = jnp.linalg.cholesky(_spd(n, seed=n))
        W = blocked_trtri(L, True)
        assert jnp.allclose(W @ L, jnp.eye(n), atol=5e-4), n
    # batched
    Ls = jnp.linalg.cholesky(jnp.stack([_spd(160, seed=s) for s in range(2)]))
    Ws = blocked_trtri(Ls, True)
    assert jnp.allclose(Ws @ Ls, jnp.eye(160), atol=5e-4)


def test_mvn_log_prob_centered_value_and_grads():
    from gpax_tpu.ops.linalg import mvn_log_prob_centered

    set_config(use_pallas_chol="always")
    try:
        n = 200
        K = _spd(n, seed=11)
        y = jnp.asarray(np.random.default_rng(8).normal(size=n), jnp.float32)

        def f_fast(K, y):
            return mvn_log_prob_centered(K, y)

        def f_xla(K, y):
            L = jnp.linalg.cholesky(
                K + 4.0 * n * jnp.finfo(jnp.float32).eps * jnp.eye(n))
            w = jax.scipy.linalg.solve_triangular(L, y, lower=True)
            return (-0.5 * (jnp.sum(w**2) + n * jnp.log(2 * jnp.pi))
                    - jnp.sum(jnp.log(jnp.diagonal(L))))

        lp_fast = f_fast(K, y)
        lp_xla = f_xla(K, y)
        assert jnp.allclose(lp_fast, lp_xla, rtol=1e-4, atol=1e-2)

        gK_f, gy_f = jax.grad(lambda K, y: f_fast(K, y), argnums=(0, 1))(K, y)
        gK_x, gy_x = jax.grad(lambda K, y: f_xla(K, y), argnums=(0, 1))(K, y)
        # symmetric-gradient convention for BOTH: K is constrained symmetric,
        # so only the symmetric part of a K-cotangent is defined (the fast
        # path's default 'symmetric_equivalent' gauge leaves a nonzero
        # antisymmetric part by design — see Config.mvn_dk_gauge)
        gK_f = 0.5 * (gK_f + gK_f.T)
        gK_x = 0.5 * (gK_x + gK_x.T)
        sK = jnp.max(jnp.abs(gK_x))
        assert jnp.max(jnp.abs(gK_f - gK_x)) / sK < 5e-3
        assert jnp.max(jnp.abs(gy_f - gy_x)) / jnp.max(jnp.abs(gy_x)) < 5e-3
    finally:
        set_config(use_pallas_chol="auto")


def test_mvn_log_prob_centered_batched_diff():
    """Batched values against a single covariance: gradient must sum over the
    batch and match shapes (the vmapped-likelihood contract)."""
    from gpax_tpu.ops.linalg import mvn_log_prob_centered

    set_config(use_pallas_chol="always")
    try:
        n, m = 160, 3
        K = _spd(n, seed=13)
        Y = jnp.asarray(np.random.default_rng(9).normal(size=(m, n)), jnp.float32)
        lp = mvn_log_prob_centered(K, Y)
        assert lp.shape == (m,)
        gK = jax.grad(lambda K: mvn_log_prob_centered(K, Y).sum())(K)
        assert gK.shape == K.shape and bool(jnp.all(jnp.isfinite(gK)))
    finally:
        set_config(use_pallas_chol="auto")


# ---------------------------------------------------------------------------
# Single-launch panel kernels (scripts/panel_chol.py — tested NEGATIVE result,
# kept outside the package so only live code ships; CLAUDE.md "Deferred")
# ---------------------------------------------------------------------------

def _load_panel_chol():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "scripts" / "panel_chol.py"
    spec = importlib.util.spec_from_file_location("panel_chol", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.mark.parametrize("n", [128, 256, 384, 200])
def test_panel_cholesky_parity(n):
    mod = _load_panel_chol()
    panel_cholesky, panel_tri_inv_t = mod.panel_cholesky, mod.panel_tri_inv_t

    K = _spd(n, seed=n)
    L = panel_cholesky(K, True)
    L_ref = np.linalg.cholesky(np.asarray(K, np.float64))
    assert np.abs(np.asarray(L, np.float64) - L_ref).max() < 5e-4
    WT = panel_tri_inv_t(L, True)
    W = np.asarray(WT, np.float64).T
    assert np.abs(W @ np.asarray(L, np.float64) - np.eye(n)).max() < 5e-4
    # strict triangularity (padding/masking correctness)
    assert np.abs(np.triu(np.asarray(L), 1)).max() == 0.0
    assert np.abs(np.tril(np.asarray(WT), -1)).max() == 0.0


def test_panel_cholesky_nan_on_indefinite():
    panel_cholesky = _load_panel_chol().panel_cholesky

    K = _spd(160) - 5.0 * jnp.eye(160)
    L = panel_cholesky(K, True)
    assert not bool(jnp.all(jnp.isfinite(L)))


def test_panel_factors_match_blocked():
    panel_chol_factors = _load_panel_chol().panel_chol_factors

    n = 256
    K = _spd(n, seed=3)
    L, W = panel_chol_factors(K, True)
    L2, W2 = chol_inv(K, True)
    assert jnp.allclose(L, L2, atol=5e-4, rtol=5e-4)
    assert jnp.allclose(W, W2, atol=5e-4, rtol=5e-4)
