"""ExactGP end-to-end: tiny real inference (reference test style, tests/test_gp.py)
plus numerical-accuracy gates the reference lacks (posterior parity vs analytic GP)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu
from gpax_tpu import ExactGP
from gpax_tpu.utils import get_keys


def get_dummy_data(unsqueeze=False):
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, 8)
    y = (10 * X**2) + rng.normal(0, 0.1, 8)
    if unsqueeze:
        X = X[:, None]
    return jnp.asarray(X), jnp.asarray(y)


@pytest.fixture(scope="module")
def fitted_gp():
    X, y = get_dummy_data()
    m = ExactGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_warmup=100, num_samples=100,
          print_summary=False, progress_bar=False)
    return m


@pytest.mark.parametrize("kernel", ["RBF", "Matern", "Periodic"])
def test_fit_kernels(kernel):
    X, y = get_dummy_data()
    m = ExactGP(1, kernel)
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    samples = m.get_samples()
    assert samples["k_length"].shape == (50, 1)
    assert samples["k_scale"].shape == (50,)
    assert samples["noise"].shape == (50,)
    if kernel == "Periodic":
        assert "period" in samples
    for v in samples.values():
        assert np.isfinite(np.asarray(v)).all()


@pytest.mark.parametrize("unsqueeze", [True, False])
def test_fit_input_shapes(unsqueeze):
    X, y = get_dummy_data(unsqueeze)
    m = ExactGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    assert m.X_train.ndim == 2
    assert m.y_train.ndim == 1


def test_predict_shapes(fitted_gp):
    X_new = jnp.linspace(-1, 1, 20)[:, None]
    mean, sampled = fitted_gp.predict(get_keys()[1], X_new, n=2)
    assert mean.shape == (20,)
    assert sampled.shape == (100, 2, 20)


def test_predict_with_injected_samples():
    """Predict path is usable without fit (reference pattern, test_gp.py:139-152)."""
    X, y = get_dummy_data()
    m = ExactGP(1, "RBF")
    m._set_training_data(X[:, None], y)
    samples = {
        "k_length": jnp.ones((5, 1)),
        "k_scale": jnp.ones(5),
        "noise": 0.1 * jnp.ones(5),
    }
    mean, sampled = m.predict(get_keys()[1], jnp.linspace(-1, 1, 10)[:, None], samples)
    assert mean.shape == (10,)
    assert sampled.shape == (5, 1, 10)


def test_posterior_matches_analytic_gp():
    """Posterior mean/cov for fixed hyperparams == closed-form GP formulas.
    This is a numerical parity gate the reference test suite doesn't have."""
    rng = np.random.default_rng(1)
    X = rng.uniform(-1, 1, (12, 1))
    y = np.sin(3 * X[:, 0])
    Xn = np.linspace(-1, 1, 7)[:, None]
    params = {"k_length": jnp.asarray([0.5]), "k_scale": jnp.asarray(2.0),
              "noise": jnp.asarray(0.05)}

    m = ExactGP(1, "RBF")
    m._set_training_data(jnp.asarray(X), jnp.asarray(y))
    mean, cov = m.get_mvn_posterior(jnp.asarray(Xn), params)

    # closed form with numpy (noise+jitter on both train and test diagonals,
    # matching the reference kernel contract)
    def rbf(a, b, noise=0.0):
        r2 = ((a[:, None, :] - b[None, :, :]) / 0.5) ** 2
        k = 2.0 * np.exp(-0.5 * r2.sum(-1))
        if a.shape == b.shape:
            k += (noise + 1e-6) * np.eye(a.shape[0])
        return k

    Kxx = rbf(X, X, 0.05)
    Kpx = rbf(Xn, X)
    Kpp = rbf(Xn, Xn, 0.05)
    Kinv = np.linalg.inv(Kxx)
    mean_ref = Kpx @ Kinv @ y
    cov_ref = Kpp - Kpx @ Kinv @ Kpx.T
    np.testing.assert_allclose(np.asarray(mean), mean_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(cov), cov_ref, rtol=1e-3, atol=1e-5)


def test_noiseless_vs_noisy_prediction():
    X, y = get_dummy_data()
    m = ExactGP(1, "RBF")
    m._set_training_data(X[:, None], y)
    samples = {"k_length": jnp.ones((3, 1)), "k_scale": jnp.ones(3),
               "noise": 0.5 * jnp.ones(3)}
    Xn = jnp.linspace(-1, 1, 10)[:, None]
    mean_n, samp_n = m.predict(get_keys()[1], Xn, samples, noiseless=False)
    mean_nl, samp_nl = m.predict(get_keys()[1], Xn, samples, noiseless=True)
    np.testing.assert_allclose(np.asarray(mean_n), np.asarray(mean_nl), rtol=1e-5)
    assert not np.allclose(np.asarray(samp_n), np.asarray(samp_nl))


def test_same_key_reproducibility():
    X, y = get_dummy_data()
    m1 = ExactGP(1, "RBF")
    m1.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
           print_summary=False, progress_bar=False)
    m2 = ExactGP(1, "RBF")
    m2.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
           print_summary=False, progress_bar=False)
    np.testing.assert_allclose(
        np.asarray(m1.get_samples()["noise"]), np.asarray(m2.get_samples()["noise"])
    )


def test_predict_in_batches(fitted_gp):
    X_new = jnp.linspace(-1, 1, 25)[:, None]
    mean, sampled = fitted_gp.predict_in_batches(get_keys()[1], X_new, batch_size=10)
    assert mean.shape == (25,)
    assert sampled.shape[-1] == 25


def test_sample_from_prior():
    X, _ = get_dummy_data()
    m = ExactGP(1, "RBF")
    draws = m.sample_from_prior(get_keys()[0], X, num_samples=6)
    assert draws.shape == (6, 8)
    assert np.isfinite(np.asarray(draws)).all()


def test_mean_fn_and_prior():
    import gpax_tpu.distributions as dist
    from gpax_tpu import ppl

    X, y = get_dummy_data()

    def mean_fn(x, params):
        return params["a"] * x.squeeze() ** 2

    def mean_fn_prior():
        return {"a": ppl.sample("a", dist.Normal(10.0, 1.0))}

    m = ExactGP(1, "RBF", mean_fn=mean_fn, mean_fn_prior=mean_fn_prior)
    m.fit(get_keys()[0], X, y, num_warmup=60, num_samples=60,
          print_summary=False, progress_bar=False)
    samples = m.get_samples()
    assert "a" in samples
    # the quadratic coefficient should be identified near 10
    assert abs(np.asarray(samples["a"]).mean() - 10) < 2.0
    mean, _ = m.predict(get_keys()[1], X)
    assert np.isfinite(np.asarray(mean)).all()


def test_custom_noise_prior_dist():
    import gpax_tpu.distributions as dist

    X, y = get_dummy_data()
    m = ExactGP(1, "RBF", noise_prior_dist=dist.HalfNormal(0.1))
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    noise = np.asarray(m.get_samples()["noise"])
    assert (noise > 0).all()
    # tight prior keeps noise small
    assert noise.mean() < 0.5


def test_bucketed_fit_matches_unpadded():
    """pad_to_multiple adds ignored rows: predictions ~ unpadded predictions.

    (Hyperparameter posterior means at n=8 are too weakly identified to compare
    across chains; predictive means are the meaningful invariant.)"""
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(-1, 1, 24), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(X)) + 0.05 * rng.normal(size=24), jnp.float32)
    Xt = jnp.linspace(-1, 1, 11)
    m1 = ExactGP(1, "RBF")
    m1.fit(get_keys()[0], X, y, num_warmup=200, num_samples=200,
           print_summary=False, progress_bar=False)
    m2 = ExactGP(1, "RBF")
    m2.fit(get_keys()[0], X, y, num_warmup=200, num_samples=200,
           print_summary=False, progress_bar=False, pad_to_multiple=32)
    # training data stored unpadded
    assert m2.X_train.shape == (24, 1)
    mean1, _ = m1.predict(get_keys()[1], Xt, noiseless=True)
    mean2, _ = m2.predict(get_keys()[1], Xt, noiseless=True)
    np.testing.assert_allclose(np.asarray(mean1), np.asarray(mean2), atol=0.1)
    assert np.isfinite(np.asarray(mean2)).all()


def test_predict_moments_matches_sampled(fitted_gp):
    """Closed-form mixture moments == large-n sampled moments."""
    X_new = jnp.linspace(-1, 1, 15)
    mean_exact, var_exact = fitted_gp.predict_moments(get_keys()[1], X_new)
    _, y_sampled = fitted_gp.predict(get_keys()[1], X_new, n=200)
    flat = np.asarray(y_sampled).reshape(-1, 15)
    # atol: the mixture mean's MC error is governed by the S=100 posterior
    # samples (the n=200 within-sample draws don't shrink between-sample
    # variance) — se ~ sd/sqrt(S) ~ 0.02, so 0.02 was a 1-sigma bound that
    # flaked whenever the fixture's chain shifted; 0.045 is ~2 sigma.
    np.testing.assert_allclose(np.asarray(mean_exact), flat.mean(0), rtol=0.05, atol=0.045)
    # var atol: same S=100 between-sample MC error dominates; the sampled
    # variance's se at the observed scale is ~0.01, so 0.02 was ~2 sigma and
    # flaked (observed diff 0.0261 in the r03 full-suite run); 0.035 is ~3 sigma.
    np.testing.assert_allclose(np.asarray(var_exact), flat.var(0), rtol=0.25, atol=0.035)


def test_fit_target_accept_prob():
    """fit(target_accept_prob=t): lower targets adapt LARGER step sizes."""
    X, y = get_dummy_data()
    eps = {}
    # wide target gap + enough warmup for dual averaging to separate them:
    # at 60 steps / 0.9-vs-0.6 the frozen averages are within DA noise of each
    # other (the mass-window restarts leave few converged iterates), and the
    # ordering flipped on an unrelated PRNG-plumbing change (r04)
    for ta in (0.95, 0.5):
        m = ExactGP(1, "RBF")
        m.fit(get_keys()[0], X, y, num_warmup=150, num_samples=10,
              target_accept_prob=ta, print_summary=False, progress_bar=False)
        assert m.mcmc.kernel.target_accept_prob == ta
        eps[ta] = float(np.asarray(m.mcmc.get_extra_fields()["step_size"])[-1])
    assert eps[0.5] > eps[0.95]


def test_fit_max_tree_depth_cap():
    """fit(max_tree_depth=d) caps every trajectory at 2^d - 1 leapfrogs."""
    X, y = get_dummy_data()
    m = ExactGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_warmup=30, num_samples=30,
          max_tree_depth=3, print_summary=False, progress_bar=False)
    num_steps = np.asarray(m.mcmc.get_extra_fields()["num_steps"])
    assert num_steps.max() <= 7


def test_fit_under_x64(monkeypatch):
    """enable_x64 parity: the whole stack must run in double precision too."""
    import gpax_tpu

    gpax_tpu.enable_x64(True)
    try:
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-1, 1, 10))
        y = jnp.asarray(np.sin(3 * np.asarray(X)))
        m = ExactGP(1, "RBF")
        m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
              print_summary=False, progress_bar=False)
        s = m.get_samples()
        assert s["noise"].dtype == jnp.float64
        mean, _ = m.predict(get_keys()[1], X)
        assert np.isfinite(np.asarray(mean)).all()
    finally:
        gpax_tpu.enable_x64(False)


def test_auto_segment_size_policy():
    """TPU device-call bounding policy (N8192_NOTE.md): no segmenting on CPU
    or for small runs; bounded segments for large-n long runs."""
    import unittest.mock as mock

    from gpax_tpu.models.gp import _auto_segment_size

    # CPU backend (what tests run under): never auto-segment
    assert _auto_segment_size(8192, 200) is None

    with mock.patch("jax.default_backend", return_value="tpu"):
        assert _auto_segment_size(256, 200) is None      # tiny: one call fine
        seg = _auto_segment_size(8192, 200)
        assert seg is not None and 1 <= seg <= 5          # ~13.8 s/transition
        seg4k = _auto_segment_size(4096, 200)
        assert seg4k is not None and 10 <= seg4k <= 60    # ~1.7 s/transition
