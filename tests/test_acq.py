"""Acquisition layer: mock-model plumbing tests (reference style, tests/test_acq.py)
plus analytic sanity checks on the base functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu
from gpax_tpu import ExactGP
from gpax_tpu.acquisition import EI, KG, POI, Thompson, UCB, UE, qEI, qKG, qPOI, qUCB
from gpax_tpu.acquisition import optimize_acq
from gpax_tpu.acquisition.base_acq import ei, poi, ucb, ue
from gpax_tpu.acquisition.penalties import compute_penalty
from gpax_tpu.utils import get_keys


class mock_GP(ExactGP):
    """Fitted-GP stand-in: canned posterior samples, real predict path."""

    def __init__(self):
        super().__init__(1, "RBF")
        rng = np.random.default_rng(0)
        X = jnp.asarray(rng.uniform(-1, 1, 8))
        y = jnp.asarray(np.sin(3 * np.asarray(X)))
        self._set_training_data(X[:, None], y)
        self.mcmc = 1  # signals "fully Bayesian" to the acquisition layer
        self._samples = {
            "k_length": jnp.ones((10, 1)),
            "k_scale": jnp.ones(10),
            "noise": 0.1 * jnp.ones(10),
        }

    def get_samples(self, chain_dim=False):
        return self._samples


class mock_MAP_GP(mock_GP):
    def __init__(self):
        super().__init__()
        self.mcmc = None
        self._map = {k: v[0] for k, v in self._samples.items()}

    def get_samples(self, chain_dim=False):
        return self._map

    def predict(self, rng_key, X_new, samples=None, noiseless=False, **kwargs):
        X_new = self._set_data(X_new)
        mean, cov = self.get_mvn_posterior(X_new, self._map, noiseless, **kwargs)
        return mean, cov.diagonal()

    def sample_from_posterior(self, rng_key, X_new, n=1, noiseless=False, **kwargs):
        X_new = self._set_data(X_new)
        mean, cov = self.get_mvn_posterior(X_new, self._map, noiseless, **kwargs)
        from gpax_tpu.ops.linalg import mvn_sample_from_cov

        return mean, mvn_sample_from_cov(rng_key, mean, cov, n)


X_cand = jnp.linspace(-1.5, 1.5, 20)


def test_base_acq_analytic():
    mean = jnp.array([0.0, 1.0, 2.0])
    var = jnp.array([1.0, 1.0, 1e-8])
    # ue is sqrt(var) (quirk preserved)
    np.testing.assert_allclose(np.asarray(ue((mean, var))), np.sqrt(np.asarray(var)))
    # maximize EI: the high-mean/low-var point has near-zero EI; the uncertain ones don't
    acq = ei((mean, var), maximize=True)
    assert acq[2] < acq[1]
    # ucb sign convention: minimization returns negated value
    acq_min = ucb((mean, var), beta=4.0, maximize=False)
    np.testing.assert_allclose(np.asarray(acq_min), -(np.asarray(mean) - 2 * np.sqrt(np.asarray(var))), rtol=1e-6)
    # poi in [0, 1]
    p = poi((mean, var), maximize=True)
    assert ((np.asarray(p) >= 0) & (np.asarray(p) <= 1)).all()


@pytest.mark.parametrize("acq_fn", [EI, UCB, POI, UE])
def test_single_acq_hmc(acq_fn):
    m = mock_GP()
    acq = acq_fn(get_keys()[0], m, X_cand, n=2)
    assert acq.shape == (20,)
    assert np.isfinite(np.asarray(acq)).all()


@pytest.mark.parametrize("acq_fn", [EI, UCB, POI, UE])
def test_single_acq_map(acq_fn):
    m = mock_MAP_GP()
    acq = acq_fn(get_keys()[0], m, X_cand)
    assert acq.shape == (20,)
    assert np.isfinite(np.asarray(acq)).all()


def test_penalized_acq():
    m = mock_GP()
    recent = np.asarray(X_cand[:2])[:, None]
    acq_plain = UCB(get_keys()[0], m, X_cand)
    acq_pen = UCB(get_keys()[0], m, X_cand, penalty="delta",
                  recent_points=recent)
    assert np.isneginf(np.asarray(acq_pen)[:2]).all()
    np.testing.assert_allclose(np.asarray(acq_pen)[2:], np.asarray(acq_plain)[2:], rtol=1e-5)


def test_inverse_distance_penalty():
    X = jnp.linspace(0, 1, 5)[:, None]
    recent = jnp.asarray([[0.0]])
    pen = compute_penalty(X, recent, "inverse_distance", 2.0)
    assert pen.shape == (5,)
    assert pen[0] > pen[-1] > 0


@pytest.mark.parametrize("acq_fn", [qEI, qUCB, qPOI])
def test_batch_acq(acq_fn):
    m = mock_GP()
    acq = acq_fn(get_keys()[0], m, X_cand, subsample_size=3)
    assert acq.shape == (3, 20)
    assert np.isfinite(np.asarray(acq)).all()


def test_batch_acq_maximize_distance():
    m = mock_GP()
    acq = qEI(get_keys()[0], m, X_cand, subsample_size=2, maximize_distance=True,
              n_evals=3)
    assert acq.shape == (2, 20)


def test_batch_acq_single_cached_program():
    """The whole q-acquisition fan-out executes as ONE compiled program,
    cached on the model instance — a second call with the same shapes reuses
    it instead of recompiling (VERDICT r03 item 4)."""
    m = mock_GP()
    m.__dict__.pop("_prog_cache", None)
    a1 = qEI(get_keys()[0], m, X_cand, subsample_size=3)
    cache = m.__dict__.get("_prog_cache")
    assert cache is not None and len(cache) == 1
    prog1 = next(iter(cache.values()))[1]
    a2 = qEI(get_keys()[1], m, X_cand, subsample_size=3)
    assert len(cache) == 1
    assert next(iter(cache.values()))[1] is prog1
    assert a1.shape == a2.shape == (3, 20)
    # different flags compile (and cache) a distinct program
    qEI(get_keys()[0], m, X_cand, subsample_size=2)
    assert len(cache) == 2


def test_batch_acq_hyperparams_in_cache_key():
    """Closure-baked acquisition hyperparameters are part of the compiled-
    program cache identity: qUCB(beta=0.25) then qUCB(beta=4.0) on the same
    model must yield DIFFERENT values, not a stale cache hit (advisor r04,
    high)."""
    m = mock_GP()
    m.__dict__.pop("_prog_cache", None)
    key = get_keys()[0]
    a_lo = qUCB(key, m, X_cand, beta=0.25, subsample_size=3)
    a_hi = qUCB(key, m, X_cand, beta=4.0, subsample_size=3)
    assert len(m.__dict__["_prog_cache"]) == 2
    assert not np.allclose(np.asarray(a_lo), np.asarray(a_hi))
    # same key + same hyperparams reproduces exactly (cache hit, same program)
    np.testing.assert_allclose(
        np.asarray(qUCB(key, m, X_cand, beta=0.25, subsample_size=3)),
        np.asarray(a_lo), rtol=1e-6)
    # maximize flip on qEI is likewise a distinct program with distinct values
    e_min = qEI(key, m, X_cand, maximize=False, subsample_size=3)
    e_max = qEI(key, m, X_cand, maximize=True, subsample_size=3)
    assert not np.allclose(np.asarray(e_min), np.asarray(e_max))


def test_qkg_fresh_fantasy_key_per_call():
    """qKG's fantasy draws must follow the per-call rng_key (the key is a
    traced program ARGUMENT): two calls with different keys on a cached
    program give different values; the same key reproduces (advisor r04,
    medium)."""
    m = mock_GP()
    m.__dict__.pop("_prog_cache", None)
    k1, k2 = get_keys()
    a1 = qKG(k1, m, X_cand, subsample_size=2)
    assert len(m.__dict__["_prog_cache"]) == 1
    a2 = qKG(k2, m, X_cand, subsample_size=2)
    assert len(m.__dict__["_prog_cache"]) == 1  # same program served both
    assert not np.allclose(np.asarray(a1), np.asarray(a2))
    np.testing.assert_allclose(
        np.asarray(qKG(k1, m, X_cand, subsample_size=2)), np.asarray(a1),
        rtol=1e-6)


def test_batch_acq_exact_moments_match_mvn_diag():
    """The diagonal fast path (get_predictive_mean_var) must reproduce the
    reference's full-covariance-then-diagonal moments."""
    m = mock_GP()
    samples = {k: v[:2] for k, v in m.get_samples().items()}

    def diag_moments(params):
        mean, cov = m.get_mvn_posterior(X_cand[:, None], params, False)
        return mean, cov.diagonal()

    def fast_moments(params):
        return m.get_predictive_mean_var(X_cand[:, None], params, False)

    for i in range(2):
        p = {k: v[i] for k, v in samples.items()}
        m1, v1 = diag_moments(p)
        m2, v2 = fast_moments(p)
        np.testing.assert_allclose(np.asarray(m1), np.asarray(m2),
                                   rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-3, atol=1e-5)


def test_batch_acq_requires_bayesian():
    m = mock_MAP_GP()
    with pytest.raises(ValueError):
        qEI(get_keys()[0], m, X_cand)


def test_kg_hmc_and_map():
    m = mock_GP()
    acq = KG(get_keys()[0], m, X_cand[:6], n=2)
    assert acq.shape == (10, 6)
    m2 = mock_MAP_GP()
    acq2 = KG(get_keys()[0], m2, X_cand[:6], n=2)
    assert acq2.shape == (6,)


def test_thompson():
    m = mock_GP()
    t = Thompson(get_keys()[0], m, X_cand)
    assert t.squeeze().shape == (20,)
    m2 = mock_MAP_GP()
    t2 = Thompson(get_keys()[0], m2, X_cand)
    assert t2.squeeze().shape == (20,)


def test_optimize_acq_ondevice():
    m = mock_GP()
    x_opt = optimize_acq(get_keys()[0], m, UE, num_initial_guesses=8,
                         lower_bound=-1.5, upper_bound=1.5, num_steps=20)
    assert x_opt.shape == (1,)
    assert -1.5 <= float(x_opt[0]) <= 1.5
