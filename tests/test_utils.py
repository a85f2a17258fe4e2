"""Utils layer: batching, dict utilities, fn adapters, priors, inducing points."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu.distributions as dist
from gpax_tpu import ppl, priors
from gpax_tpu.utils import (
    _set_noise_kernel_fn,
    get_haiku_dict,
    get_keys,
    initialize_inducing_points,
    preprocess_sparse_image,
    random_sample_dict,
    set_fn,
    set_kernel_fn,
    split_dict,
    split_in_batches,
)


def test_get_keys():
    k1, k2 = get_keys(0)
    assert not np.array_equal(np.asarray(k1), np.asarray(k2))
    k1b, _ = get_keys(0)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k1b))


def test_split_in_batches():
    X = jnp.arange(23)
    chunks = split_in_batches(X, 10)
    assert [c.shape[0] for c in chunks] == [10, 10, 3]
    X2 = jnp.zeros((4, 23))
    chunks2 = split_in_batches(X2, 10, dim=1)
    assert [c.shape[1] for c in chunks2] == [10, 10, 3]
    with pytest.raises(NotImplementedError):
        split_in_batches(X, 10, dim=2)


def test_split_and_sample_dict():
    d = {"a": jnp.arange(10), "b": jnp.arange(20).reshape(10, 2)}
    parts = split_dict(d, 4)
    assert [p["a"].shape[0] for p in parts] == [4, 4, 2]
    sub = random_sample_dict(d, 3, jax.random.PRNGKey(0))
    assert sub["a"].shape == (3,)
    # consistency: same rows selected in both arrays
    np.testing.assert_array_equal(np.asarray(sub["b"][:, 0]), np.asarray(sub["a"] * 2))


def test_set_fn():
    def line(x, a, b):
        return a * x + b

    g = set_fn(line)
    out = g(jnp.asarray(2.0), {"a": jnp.asarray(3.0), "b": jnp.asarray(1.0)})
    np.testing.assert_allclose(np.asarray(out), 7.0)


def test_set_kernel_fn():
    def plain_kernel(X, Z, amp, ell):
        r2 = ((X[:, None, :] - Z[None, :, :]) / ell) ** 2
        return amp * jnp.exp(-r2.sum(-1))

    k = set_kernel_fn(plain_kernel)
    X = jnp.asarray(np.random.default_rng(0).normal(size=(5, 2)), jnp.float32)
    params = {"amp": jnp.asarray(2.0), "ell": jnp.asarray(1.5)}
    out = k(X, X, params, 0.3, 1e-6)
    base = plain_kernel(X, X, params["amp"], params["ell"])
    np.testing.assert_allclose(
        np.asarray(jnp.diag(out)), np.asarray(jnp.diag(base)) + 0.3 + 1e-6, rtol=1e-5
    )
    Z = jnp.asarray(np.random.default_rng(1).normal(size=(3, 2)), jnp.float32)
    out_cross = k(X, Z, params, 0.3, 1e-6)
    np.testing.assert_allclose(np.asarray(out_cross),
                               np.asarray(plain_kernel(X, Z, *params.values())
                                          if False else plain_kernel(X, Z, params["amp"], params["ell"])),
                               rtol=1e-5)


def test_set_noise_kernel_fn():
    from gpax_tpu.kernels import RBFKernel

    k_noise = _set_noise_kernel_fn(RBFKernel)
    X = jnp.asarray(np.random.default_rng(0).normal(size=(4, 1)), jnp.float32)
    params = {"k_noise_length": jnp.asarray(0.8), "k_noise_scale": jnp.asarray(1.2)}
    ref = RBFKernel(X, X, {"k_length": params["k_noise_length"],
                           "k_scale": params["k_noise_scale"]}, 0.0)
    out = k_noise(X, X, params, 0.0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-6)


def test_get_haiku_dict():
    flat = {
        "feature_extractor/linear_0/w": jnp.ones((3, 4)),
        "feature_extractor/linear_0/b": jnp.zeros(4),
        "k_length": jnp.ones(1),
    }
    nn = get_haiku_dict(flat)
    assert set(nn) == {"linear_0"}
    assert nn["linear_0"]["w"].shape == (3, 4)


def test_preprocess_sparse_image():
    img = np.zeros((4, 5))
    img[1, 2] = 3.0
    img[3, 0] = 7.0
    coords, vals, full = preprocess_sparse_image(img)
    assert coords.shape == (2, 2)
    assert set(np.asarray(vals).tolist()) == {3.0, 7.0}
    assert full.shape == (20, 2)


def test_initialize_inducing_points():
    X = jnp.linspace(0, 1, 50)[:, None]
    Xu = initialize_inducing_points(X, 0.2, "uniform")
    assert Xu.shape == (10, 1)
    Xu_r = initialize_inducing_points(X, 0.2, "random", key=jax.random.PRNGKey(0))
    assert Xu_r.shape == (10, 1)
    with pytest.raises(ValueError):
        initialize_inducing_points(X, 1.5)
    with pytest.raises(ValueError):
        initialize_inducing_points(X, 0.2, "random")  # no key


def test_priors_factories():
    tr = ppl.trace(ppl.seed(lambda: priors.place_normal_prior("w", 1.0, 2.0), 0))
    sites = tr.get_trace()
    assert "w" in sites
    g = priors.gamma_dist(None, None, jnp.asarray([0.0, 4.0]))
    np.testing.assert_allclose(np.asarray(g.concentration), 2.0)
    u = priors.uniform_dist(None, None, jnp.asarray([1.0, 5.0]))
    np.testing.assert_allclose(np.asarray(u.low), 1.0)
    with pytest.raises(ValueError):
        priors.uniform_dist()


def test_auto_priors():
    def fn(x, a, b):
        return a * x + b

    sampler = priors.auto_normal_priors(fn, loc=0.0, scale=2.0)
    tr = ppl.trace(ppl.seed(sampler, 0)).get_trace()
    assert set(tr) == {"a", "b"}
    kern_sampler = priors.auto_lognormal_kernel_priors(lambda X, Z, ell: None)
    tr2 = ppl.trace(ppl.seed(kern_sampler, 0)).get_trace()
    assert set(tr2) == {"ell"}
    assert float(tr2["ell"]["value"]) > 0
