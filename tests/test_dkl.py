"""DKL / viDKL / BNN / sPM: tiny real inference (reference test scale)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu.models import BNN, DKL, sPM, viDKL
from gpax_tpu.utils import get_keys


def get_dummy_features(n=21, d=36):
    rng = np.random.default_rng(0)
    X = rng.normal(size=(n, d))
    y = np.sin(X[:, 0]) + 0.05 * rng.normal(size=n)
    return jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)


def test_dkl_fit_predict():
    X, y = get_dummy_features()
    m = DKL(X.shape[-1], z_dim=2, kernel="RBF", hidden_dim=[8, 4])
    m.fit(get_keys()[0], X, y, num_warmup=60, num_samples=60,
          print_summary=False, progress_bar=False)
    samples = m.get_samples()
    assert "w0" in samples and "b0" in samples
    assert samples["w0"].shape == (60, 36, 8)
    mean, sampled = m.predict(get_keys()[1], X, n=1)
    assert mean.shape == (21,)
    assert np.isfinite(np.asarray(mean)).all()
    z = m.embed(X)
    assert z.shape == (60, 21, 2)


def test_vidkl_fit_predict_map():
    X, y = get_dummy_features()
    m = viDKL(X.shape[-1], z_dim=2, kernel="RBF")
    m.fit(get_keys()[0], X, y, num_steps=120, print_summary=False, progress_bar=False)
    nn_params, k_params = m.get_samples()
    assert "linear_0" in nn_params
    assert set(k_params) >= {"k_length", "k_scale", "noise"}
    mean, var = m.predict(get_keys()[1], X)
    assert mean.shape == (21,)
    assert var.shape == (21,)
    assert (np.asarray(var) > 0).all()
    z = m.embed(X)
    assert z.shape == (21, 2)


def test_vidkl_mle_mode():
    X, y = get_dummy_features()
    m = viDKL(X.shape[-1], z_dim=2, nn_prior=False)
    m.fit(get_keys()[0], X, y, num_steps=120, print_summary=False, progress_bar=False)
    mean, var = m.predict(get_keys()[1], X)
    assert np.isfinite(np.asarray(mean)).all()


def test_vidkl_multichannel():
    """2-D y (channels, n): the whole SVI fit vmaps across channels."""
    X, y1 = get_dummy_features()
    y = jnp.stack([y1, -y1 + 1.0])
    m = viDKL(X.shape[-1], z_dim=2)
    m.fit(get_keys()[0], X, y, num_steps=80, print_summary=False, progress_bar=False)
    assert m.kernel_params["noise"].shape == (2,)
    mean, var = m.predict(get_keys()[1], X)
    assert mean.shape == (2, 21)
    assert var.shape == (2, 21)
    z = m.embed(X)
    assert z.shape == (2, 21, 2)


def test_vidkl_fit_predict_ensemble():
    X, y = get_dummy_features(n=12, d=8)
    m = viDKL(8, z_dim=2)
    mean, var = m.fit_predict(
        get_keys()[0], X, y, X, num_steps=50, n_models=2,
        ensemble_method="vectorized", print_summary=False, progress_bar=False,
    )
    assert mean.shape == (2, 12)
    assert var.shape == (2, 12)


def test_vidkl_fit_predict_ensemble_parallel_parity():
    """'parallel' shards the model axis over the 8-device conftest mesh and
    must reproduce 'vectorized' exactly on the same keys — it is the same
    vmapped program with a NamedSharding on the key axis (VERDICT r04 item 5;
    reference multi-device path: gpax/models/vidkl.py:358-365)."""
    import jax

    assert len(jax.devices()) > 1  # conftest forces 8 virtual CPU devices
    X, y = get_dummy_features(n=12, d=8)
    m_v = viDKL(8, z_dim=2)
    mean_v, var_v = m_v.fit_predict(
        get_keys()[0], X, y, X, num_steps=50, n_models=4,
        ensemble_method="vectorized", print_summary=False, progress_bar=False,
    )
    m_p = viDKL(8, z_dim=2)
    mean_p, var_p = m_p.fit_predict(
        get_keys()[0], X, y, X, num_steps=50, n_models=4,
        ensemble_method="parallel", print_summary=False, progress_bar=False,
    )
    assert mean_p.shape == (4, 12) and var_p.shape == (4, 12)
    np.testing.assert_allclose(np.asarray(mean_p), np.asarray(mean_v),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(var_p), np.asarray(var_v),
                               rtol=1e-5, atol=1e-6)


def test_spm_fit_predict():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(0, 2, 25), jnp.float32)
    y = 3.0 * X + 1.0 + 0.05 * jnp.asarray(rng.normal(size=25), jnp.float32)

    import gpax_tpu.distributions as dist
    from gpax_tpu import ppl

    def line(x, params):
        return params["a"] * x + params["b"]

    def line_prior():
        return {
            "a": ppl.sample("a", dist.Normal(0.0, 10.0)),
            "b": ppl.sample("b", dist.Normal(0.0, 10.0)),
        }

    m = sPM(line, line_prior)
    m.fit(get_keys()[0], X, y, num_warmup=150, num_samples=150,
          print_summary=False, progress_bar=False)
    means = m.get_param_means()
    assert abs(means["a"] - 3.0) < 0.3
    assert abs(means["b"] - 1.0) < 0.3
    y_pred, y_sampled = m.predict(get_keys()[1], X)
    assert y_pred.shape == (25,)
    assert y_sampled.shape == (150, 25)
    prior_draws = m.sample_from_prior(get_keys()[0], X, num_samples=5)
    assert prior_draws.shape == (5, 25)


def test_bnn_fit_predict():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 20), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(X)), jnp.float32)
    m = BNN(1, 1, hidden_dim=[8, 4])
    m.fit(get_keys()[0], X, y, num_warmup=60, num_samples=60,
          print_summary=False, progress_bar=False)
    y_pred, y_sampled = m.predict(get_keys()[1], X[:, None])
    assert y_pred.shape == (20, 1)
    assert np.isfinite(np.asarray(y_pred)).all()
