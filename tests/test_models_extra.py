"""Specialty models: vExactGP, VarNoiseGP, UIGP, MeasuredNoiseGP, MultiTaskGP,
CoregGP, iBNN, vi_iBNN, viMTDKL — tiny real inference in the reference style."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu.models import (
    CoregGP,
    MeasuredNoiseGP,
    MultiTaskGP,
    UIGP,
    VarNoiseGP,
    iBNN,
    vExactGP,
    vi_iBNN,
    viMTDKL,
)
from gpax_tpu.utils import get_keys


def test_vexactgp():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, (2, 12)), jnp.float32)      # (tasks, n)
    y = jnp.asarray(np.sin(3 * np.asarray(X)), jnp.float32)
    m = vExactGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    s = m.get_samples()
    assert s["k_length"].shape == (50, 2, 1)
    assert s["noise"].shape == (50, 2)
    X_new = jnp.asarray(rng.uniform(-1, 1, (2, 7)), jnp.float32)
    mean, sampled = m.predict(get_keys()[1], X_new)
    assert mean.shape == (2, 7)
    assert sampled.shape[-2:] == (2, 7)


def test_varnoise_gp():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 16), jnp.float32)
    # heteroskedastic noise: grows with |x|
    y = jnp.asarray(
        np.sin(3 * np.asarray(X)) + np.abs(np.asarray(X)) * rng.normal(0, 0.5, 16),
        jnp.float32,
    )
    m = VarNoiseGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_warmup=60, num_samples=60,
          print_summary=False, progress_bar=False)
    s = m.get_samples()
    assert "k_noise_length" in s and "log_var" in s
    assert s["log_var"].shape == (60, 16)
    var_samples = m.get_data_var_samples()
    assert var_samples.shape == (60, 16)
    assert (np.asarray(var_samples) > 0).all()
    mean, sampled = m.predict(get_keys()[1], jnp.linspace(-1, 1, 9))
    assert mean.shape == (9,)


def test_uigp():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(0, 1, 12), jnp.float32)
    y = jnp.asarray(np.sin(5 * np.asarray(X)), jnp.float32)
    m = UIGP(1, "RBF")
    with pytest.warns(UserWarning):
        m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
              print_summary=False, progress_bar=False)
    s = m.get_samples()
    assert s["sigma_x"].shape == (50, 1)
    assert s["X_prime"].shape == (50, 12, 1)
    mean, sampled = m.predict(get_keys()[1], jnp.linspace(0, 1, 7), n=2)
    assert mean.shape == (7,)


def test_measured_noise_gp():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 14), jnp.float32)
    noise = jnp.asarray(rng.uniform(0.01, 0.05, 14), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(X)), jnp.float32)
    m = MeasuredNoiseGP(1, "RBF")
    m.fit(get_keys()[0], X, y, noise, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    s = m.get_samples()
    np.testing.assert_allclose(np.asarray(s["noise"]), 0.0)  # fixed to deterministic 0
    mean, sampled = m.predict(get_keys()[1], jnp.linspace(-1, 1, 8), n=2,
                              noise_prediction_method="linreg")
    assert mean.shape == (8,)
    assert sampled.shape == (50, 2, 8)


def _mt_data():
    """Two correlated tasks on different input points (indexed format)."""
    rng = np.random.default_rng(0)
    X0 = rng.uniform(-1, 1, 10)
    X1 = rng.uniform(-1, 1, 8)
    X = np.concatenate([
        np.column_stack([X0, np.zeros(10)]),
        np.column_stack([X1, np.ones(8)]),
    ])
    y = np.concatenate([np.sin(3 * X0), 0.5 * np.sin(3 * X1)])
    return jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)


def test_multitask_gp():
    X, y = _mt_data()
    m = MultiTaskGP(1, "Matern", num_latents=1, num_tasks=2, rank=2)
    m.X_train = X  # model() may need it to infer task count
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    s = m.get_samples()
    assert s["W"].shape == (50, 1, 2, 2)
    assert s["v"].shape == (50, 1, 2)
    assert s["noise"].shape == (50, 2)
    mean, sampled = m.predict(get_keys()[1], X)
    assert mean.shape == (18,)


def test_coreg_gp():
    X, y = _mt_data()
    m = CoregGP(1, "RBF", rank=1)
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    s = m.get_samples()
    assert s["W"].shape == (50, 2, 1)
    mean, _ = m.predict(get_keys()[1], X)
    assert mean.shape == (18,)


def test_ibnn():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 10), jnp.float32)
    y = jnp.asarray(np.sin(2 * np.asarray(X)), jnp.float32)
    m = iBNN(1, depth=2, activation="erf")
    m.fit(get_keys()[0], X, y, num_warmup=50, num_samples=50,
          print_summary=False, progress_bar=False)
    s = m.get_samples()
    assert "var_b" in s and "var_w" in s
    mean, _ = m.predict(get_keys()[1], X)
    assert np.isfinite(np.asarray(mean)).all()


def test_vi_ibnn():
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 10), jnp.float32)
    y = jnp.asarray(np.sin(2 * np.asarray(X)), jnp.float32)
    m = vi_iBNN(1, depth=2, activation="relu")
    m.fit(get_keys()[0], X, y, num_steps=100, print_summary=False, progress_bar=False)
    mean, var = m.predict(get_keys()[1], X)
    assert np.isfinite(np.asarray(mean)).all()
    assert (np.asarray(var) > 0).all()


def test_vi_mtdkl():
    rng = np.random.default_rng(0)
    n0, n1, d = 8, 6, 5
    X = np.concatenate([
        np.column_stack([rng.normal(size=(n0, d)), np.zeros(n0)]),
        np.column_stack([rng.normal(size=(n1, d)), np.ones(n1)]),
    ])
    y = np.concatenate([np.sin(X[:n0, 0]), np.cos(X[n0:, 0])])
    X, y = jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32)
    m = viMTDKL(d, z_dim=2, data_kernel="RBF", num_latents=1, num_tasks=2, rank=1)
    m.X_train = X
    m.fit(get_keys()[0], X, y, num_steps=80, print_summary=False, progress_bar=False)
    nn_params, k_params = m.get_samples()
    assert "W" in k_params and k_params["noise"].shape == (2,)
    mean, var = m.predict(get_keys()[1], X)
    assert mean.shape == (14,)
    assert (np.asarray(var) > 0).all()
