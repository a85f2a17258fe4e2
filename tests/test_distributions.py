import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as sps

import gpax_tpu.distributions as gtd


KEY = jax.random.PRNGKey(0)


@pytest.mark.parametrize(
    "dist,scipy_dist",
    [
        (gtd.Normal(0.5, 2.0), sps.norm(0.5, 2.0)),
        (gtd.LogNormal(0.3, 0.7), sps.lognorm(s=0.7, scale=np.exp(0.3))),
        (gtd.HalfNormal(1.5), sps.halfnorm(scale=1.5)),
        (gtd.Cauchy(1.0, 2.0), sps.cauchy(1.0, 2.0)),
        (gtd.HalfCauchy(2.0), sps.halfcauchy(scale=2.0)),
        (gtd.Gamma(2.0, 3.0), sps.gamma(2.0, scale=1.0 / 3.0)),
        (gtd.Exponential(1.7), sps.expon(scale=1.0 / 1.7)),
        (gtd.Uniform(-1.0, 3.0), sps.uniform(-1.0, 4.0)),
    ],
)
def test_log_prob_matches_scipy(dist, scipy_dist):
    x = np.asarray(dist.sample(KEY, (7,)))
    np.testing.assert_allclose(
        np.asarray(dist.log_prob(jnp.asarray(x))), scipy_dist.logpdf(x), rtol=2e-4, atol=1e-5
    )


@pytest.mark.parametrize(
    "dist",
    [
        gtd.Normal(0.5, 2.0),
        gtd.LogNormal(0.3, 0.7),
        gtd.HalfNormal(1.5),
        gtd.Gamma(2.0, 3.0),
        gtd.Uniform(-1.0, 3.0),
    ],
)
def test_sample_moments(dist):
    s = dist.sample(KEY, (200_000,))
    np.testing.assert_allclose(np.mean(np.asarray(s)), np.asarray(dist.mean), rtol=0.05)


def test_sample_shapes():
    d = gtd.Normal(jnp.zeros((3,)), 1.0)
    assert d.sample(KEY, (5,)).shape == (5, 3)
    assert d.log_prob(jnp.zeros((5, 3))).shape == (5, 3)
    assert d.expand((4, 3)).sample(KEY).shape == (4, 3)


def test_independent():
    d = gtd.Normal(jnp.zeros((4, 3)), 1.0).to_event(1)
    assert d.batch_shape == (4,)
    assert d.event_shape == (3,)
    assert d.log_prob(jnp.zeros((4, 3))).shape == (4,)


def test_mvn_log_prob_matches_scipy():
    rng = np.random.default_rng(0)
    A = rng.normal(size=(5, 5))
    cov = A @ A.T + 5 * np.eye(5)
    loc = rng.normal(size=(5,))
    d = gtd.MultivariateNormal(jnp.asarray(loc), covariance_matrix=jnp.asarray(cov))
    x = rng.normal(size=(7, 5))
    np.testing.assert_allclose(
        np.asarray(d.log_prob(jnp.asarray(x))),
        sps.multivariate_normal(loc, cov).logpdf(x),
        rtol=1e-5,
    )
    s = d.sample(KEY, (100_000,))
    np.testing.assert_allclose(np.cov(np.asarray(s).T), cov, atol=0.15)


def test_lowrank_mvn_matches_dense():
    rng = np.random.default_rng(1)
    n, m = 8, 3
    W = rng.normal(size=(n, m))
    diag = rng.uniform(0.5, 1.5, size=(n,))
    loc = rng.normal(size=(n,))
    cov = W @ W.T + np.diag(diag)
    d_lr = gtd.LowRankMultivariateNormal(jnp.asarray(loc), jnp.asarray(W), jnp.asarray(diag))
    x = rng.normal(size=(4, n))
    np.testing.assert_allclose(
        np.asarray(d_lr.log_prob(jnp.asarray(x))),
        sps.multivariate_normal(loc, cov).logpdf(x),
        rtol=1e-5,
    )
    np.testing.assert_allclose(np.asarray(d_lr.variance), np.diag(cov), rtol=1e-6)


def test_transforms_roundtrip_and_jacobian():
    for constraint_val, dist in [
        (None, gtd.LogNormal(0.0, 1.0)),
        (None, gtd.Uniform(2.0, 5.0)),
        (None, gtd.Normal(0.0, 1.0)),
    ]:
        t = gtd.biject_to(dist.support)
        y = dist.sample(KEY, (5,))
        x = t.inv(y)
        np.testing.assert_allclose(np.asarray(t(x)), np.asarray(y), rtol=1e-4, atol=1e-5)
        # |dy/dx| check by autodiff
        lad = t.log_abs_det_jacobian(x, t(x))
        for i in range(5):
            g = jax.grad(lambda xi: t(xi).sum())(x[i])
            np.testing.assert_allclose(
                np.asarray(lad[i]), np.log(abs(np.asarray(g))), rtol=1e-3, atol=1e-5
            )


def test_delta():
    d = gtd.Delta(jnp.array([1.0, 2.0]))
    assert d.sample(KEY).shape == (2,)
    np.testing.assert_allclose(np.asarray(d.sample(KEY)), [1.0, 2.0])
