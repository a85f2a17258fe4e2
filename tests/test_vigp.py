"""viGP / viSparseGP / LinReg: tiny real SVI runs (reference test style)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu.models import LinReg, viGP, viSparseGP
from gpax_tpu.utils import get_keys


def get_dummy_data(n=16):
    rng = np.random.default_rng(0)
    X = rng.uniform(-1, 1, n)
    y = np.sin(3 * X) + rng.normal(0, 0.05, n)
    return jnp.asarray(X), jnp.asarray(y)


@pytest.mark.parametrize("guide", ["delta", "normal"])
def test_vigp_fit_predict(guide):
    X, y = get_dummy_data()
    m = viGP(1, "RBF", guide=guide)
    m.fit(get_keys()[0], X, y, num_steps=200, print_summary=False, progress_bar=False)
    params = m.get_samples()
    assert set(params) >= {"k_length", "k_scale", "noise"}
    mean, var = m.predict(get_keys()[1], jnp.linspace(-1, 1, 12))
    assert mean.shape == (12,)
    assert var.shape == (12,)
    assert (np.asarray(var) > 0).all()


def test_vigp_map_fits_data():
    X, y = get_dummy_data(30)
    m = viGP(1, "Matern")
    m.fit(get_keys()[0], X, y, num_steps=1000, print_summary=False, progress_bar=False)
    mean, _ = m.predict(get_keys()[1], X, noiseless=True)
    rmse = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
    assert rmse < 0.15


def test_vigp_losses_decrease():
    X, y = get_dummy_data()
    m = viGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_steps=500, print_summary=False, progress_bar=False)
    losses = np.asarray(m.loss)
    assert losses[-1] < losses[0]


def test_vigp_predict_in_batches():
    X, y = get_dummy_data()
    m = viGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_steps=100, print_summary=False, progress_bar=False)
    mean, var = m.predict_in_batches(get_keys()[1], jnp.linspace(-1, 1, 23), batch_size=10)
    assert mean.shape == (23,)
    assert var.shape == (23,)


def test_sparse_gp_fit_predict():
    X, y = get_dummy_data(50)
    m = viSparseGP(1, "RBF")
    m.fit(get_keys()[0], X, y, inducing_points_ratio=0.2,
          num_steps=500, print_summary=False, progress_bar=False)
    assert m.Xu.shape == (10, 1)
    mean, var = m.predict(get_keys()[1], jnp.linspace(-1, 1, 15))
    assert mean.shape == (15,)
    assert (np.asarray(var) > 0).all()
    # inducing points must have moved from initialization
    Xu0 = np.sort(np.asarray(m.X_train[np.arange(10), 0]))
    assert np.isfinite(np.asarray(m.Xu)).all()


def test_sparse_gp_accuracy():
    X, y = get_dummy_data(80)
    m = viSparseGP(1, "RBF")
    m.fit(get_keys()[0], X, y, inducing_points_ratio=0.25,
          num_steps=1000, print_summary=False, progress_bar=False)
    mean, _ = m.predict(get_keys()[1], X, noiseless=True)
    rmse = float(jnp.sqrt(jnp.mean((mean - y) ** 2)))
    assert rmse < 0.2


def test_linreg():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(40, 2)))
    w_true = jnp.asarray([1.5, -2.0])
    y = x @ w_true + 0.7 + 0.05 * jnp.asarray(rng.normal(size=40))
    m = LinReg()
    m.train(x, y, learning_rate=0.05, num_iterations=1500)
    p = m.get_params()
    np.testing.assert_allclose(np.asarray(p["beta"]), np.asarray(w_true), atol=0.15)
    np.testing.assert_allclose(np.asarray(p["alpha"]), 0.7, atol=0.15)
    pred = m.predict(x)
    assert float(jnp.sqrt(jnp.mean((pred - y) ** 2))) < 0.15
