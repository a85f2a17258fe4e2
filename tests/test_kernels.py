"""Kernel layer: behavioral contract tests (diagonal-noise rule, ARD, NNGP
matrix-recursion vs per-pair parity, multitask kernels)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu.kernels import (
    LCMKernel,
    MaternKernel,
    MultitaskKernel,
    MultivariateKernel,
    NNGPKernel,
    PeriodicKernel,
    RBFKernel,
    get_kernel,
    index_kernel,
    nngp_erf,
    nngp_relu,
    square_scaled_distance,
)

RNG = np.random.default_rng(0)
X = jnp.asarray(RNG.normal(size=(7, 3)), jnp.float32)
Z = jnp.asarray(RNG.normal(size=(5, 3)), jnp.float32)
PARAMS = {"k_length": jnp.asarray([0.7, 1.3, 2.0]), "k_scale": jnp.asarray(1.4),
          "period": jnp.asarray(2.0)}


def test_square_scaled_distance_matches_naive():
    r2 = square_scaled_distance(X, Z, PARAMS["k_length"])
    naive = (((np.asarray(X)[:, None, :] - np.asarray(Z)[None, :, :])
              / np.asarray(PARAMS["k_length"])) ** 2).sum(-1)
    np.testing.assert_allclose(np.asarray(r2), naive, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("kernel", [RBFKernel, MaternKernel, PeriodicKernel])
def test_diag_noise_rule(kernel):
    """noise+jitter on the diagonal ONLY when X.shape == Z.shape."""
    noise = 0.5
    k_same = kernel(X, X, PARAMS, noise, jitter=1e-6)
    k_nonoise = kernel(X, X, PARAMS, 0.0, jitter=0.0)
    np.testing.assert_allclose(
        np.asarray(jnp.diag(k_same) - jnp.diag(k_nonoise)),
        noise + 1e-6, rtol=1e-4,
    )
    k_cross = kernel(X, Z, PARAMS, noise, jitter=1e-6)
    k_cross0 = kernel(X, Z, PARAMS, 0.0, jitter=0.0)
    np.testing.assert_allclose(np.asarray(k_cross), np.asarray(k_cross0), rtol=1e-6)


def test_kernel_psd():
    for kernel in (RBFKernel, MaternKernel, PeriodicKernel):
        k = kernel(X, X, PARAMS, 0.1)
        evals = np.linalg.eigvalsh(np.asarray(k, np.float64))
        assert evals.min() > 0


@pytest.mark.parametrize("activation", ["erf", "relu"])
def test_nngp_matrix_vs_pairwise(activation):
    """The fused matrix-level NNGP recursion must equal the per-pair recursion."""
    kfn = NNGPKernel(activation=activation, depth=3)
    params = {"var_b": jnp.asarray(0.5), "var_w": jnp.asarray(1.5)}
    K = kfn(X, Z, params)
    pair_fn = nngp_relu if activation == "relu" else nngp_erf
    K_pair = jax.vmap(lambda x: jax.vmap(
        lambda z: pair_fn(x, z, params["var_b"], params["var_w"], 3))(Z))(X)
    np.testing.assert_allclose(np.asarray(K), np.asarray(K_pair), rtol=1e-4, atol=1e-5)


def test_get_kernel_passthrough_and_registry():
    assert get_kernel("RBF") is RBFKernel
    custom = lambda X, Z, p, noise=0, jitter=0: jnp.zeros((X.shape[0], Z.shape[0]))
    assert get_kernel(custom) is custom
    with pytest.raises(KeyError):
        get_kernel("nope")


def test_index_kernel():
    W = jnp.asarray(RNG.normal(size=(3, 2)), jnp.float32)
    v = jnp.asarray([0.1, 0.2, 0.3], jnp.float32)
    B_full = np.asarray(W) @ np.asarray(W).T + np.diag(np.asarray(v))
    idx1 = jnp.asarray([0, 2, 1])
    idx2 = jnp.asarray([1, 1])
    out = index_kernel(idx1, idx2, {"W": W, "v": v})
    np.testing.assert_allclose(np.asarray(out), B_full[np.ix_([0, 2, 1], [1, 1])],
                               rtol=1e-5)


def test_multitask_kernel_elementwise():
    kfn = MultitaskKernel("RBF")
    Xt = jnp.column_stack([X[:, :1], jnp.asarray([0, 0, 1, 1, 2, 2, 0])])
    params = {"k_length": jnp.asarray(1.0), "k_scale": jnp.asarray(1.0),
              "W": jnp.asarray(RNG.normal(size=(3, 2)), jnp.float32),
              "v": jnp.asarray([0.1, 0.2, 0.3], jnp.float32)}
    noise = jnp.asarray([0.5, 0.6, 0.7], jnp.float32)
    K = kfn(Xt, Xt, params, noise)
    assert K.shape == (7, 7)
    # diagonal gets per-task noise
    base = kfn(Xt, Xt, params, jnp.zeros(3))
    diff = np.asarray(jnp.diag(K) - jnp.diag(base))
    expected = np.asarray(noise)[np.asarray(Xt[:, -1], int)]
    np.testing.assert_allclose(diff, expected, rtol=1e-4)


def test_multivariate_kernel_kron():
    kfn = MultivariateKernel("RBF", num_tasks=2)
    params = {"k_length": jnp.asarray(1.0), "k_scale": jnp.asarray(1.0),
              "W": jnp.asarray(RNG.normal(size=(2, 1)), jnp.float32),
              "v": jnp.asarray([0.1, 0.2], jnp.float32)}
    K = kfn(X, X, params, 0.3)
    assert K.shape == (14, 14)
    evals = np.linalg.eigvalsh(np.asarray(K, np.float64))
    assert evals.min() > 0


def test_lcm_kernel_sums_latents():
    L, T, R = 2, 2, 1
    kfn = LCMKernel("RBF", shared_input_space=False)
    Xt = jnp.column_stack([X[:, :1], jnp.asarray([0, 1, 0, 1, 0, 1, 0])])
    params = {
        "k_length": jnp.ones((L, 1)),
        "k_scale": jnp.ones(L),
        "W": jnp.asarray(RNG.normal(size=(L, T, R)), jnp.float32),
        "v": 0.1 * jnp.ones((L, T)),
    }
    K = kfn(Xt, Xt, params, 0.1)
    assert K.shape == (7, 7)
    assert np.isfinite(np.asarray(K)).all()
