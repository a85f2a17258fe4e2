"""Pallas-vs-XLA parity for the fused gram kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu.kernels import MaternKernel, RBFKernel
from gpax_tpu.ops.pallas_gram import gram


@pytest.mark.parametrize("kind,ref_kernel", [("rbf", RBFKernel), ("matern52", MaternKernel)])
@pytest.mark.parametrize("n,m,d", [(16, 16, 1), (40, 40, 3), (40, 24, 2)])
def test_pallas_gram_parity(kind, ref_kernel, n, m, d):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(m, d)), jnp.float32) if (n, d) != (m, d) else X
    params = {
        "k_length": jnp.asarray(rng.uniform(0.5, 2.0, d), jnp.float32),
        "k_scale": jnp.asarray(1.7, jnp.float32),
    }
    noise = jnp.asarray(0.3, jnp.float32)
    ref = ref_kernel(X, Z, params, noise, jitter=1e-6)
    out = gram(X, Z, params["k_length"], params["k_scale"], noise,
               kind=kind, jitter=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_gram_vector_noise():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(12, 2)), jnp.float32)
    noise_vec = jnp.asarray(rng.uniform(0.1, 0.5, 12), jnp.float32)
    params = {"k_length": jnp.ones(2), "k_scale": jnp.asarray(2.0)}
    ref = RBFKernel(X, X, params, noise_vec, jitter=1e-6)
    out = gram(X, X, params["k_length"], params["k_scale"], noise_vec,
               kind="rbf", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_gram_cross_no_noise():
    """Cross-covariance (different shapes) must NOT get the diagonal noise."""
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(7, 2)), jnp.float32)
    params = {"k_length": jnp.ones(2), "k_scale": jnp.asarray(1.0)}
    ref = RBFKernel(X, Z, params, 99.0, jitter=1e-6)  # noise ignored off-diagonal
    out = gram(X, Z, params["k_length"], params["k_scale"], 99.0,
               kind="rbf", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
