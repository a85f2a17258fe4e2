"""Fully-Bayesian GP regression on sparse noisy 1-D data.

Script equivalent of the reference's gpax_simpleGP.ipynb: fit ExactGP with NUTS,
predict with uncertainty, sample from the prior.  Set SMOKE=1 for tiny budgets.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np

import gpax_tpu

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
BUDGET = dict(num_warmup=100, num_samples=100) if SMOKE else dict(num_warmup=2000, num_samples=2000)


def main():
    rng = np.random.default_rng(0)
    n = 12 if SMOKE else 50
    X = rng.uniform(-2.0, 2.0, n)
    f = lambda x: np.sin(2.5 * x) * np.exp(-0.2 * x**2)
    y = f(X) + 0.1 * rng.normal(size=n)

    key_fit, key_pred = gpax_tpu.utils.get_keys()
    gp = gpax_tpu.ExactGP(input_dim=1, kernel="Matern")

    # prior predictive sanity check
    prior_draws = gp.sample_from_prior(key_fit, jnp.asarray(X), num_samples=4)
    print("prior draws:", prior_draws.shape)

    gp.fit(key_fit, jnp.asarray(X), jnp.asarray(y),
           progress_bar=False, print_summary=not SMOKE, **BUDGET)

    X_test = jnp.linspace(-2.5, 2.5, 101)
    y_pred, y_samples = gp.predict(key_pred, X_test, noiseless=True)
    lo, hi = np.percentile(np.asarray(y_samples).reshape(-1, 101), [2.5, 97.5], axis=0)
    rmse = float(jnp.sqrt(jnp.mean((y_pred - jnp.asarray(f(np.asarray(X_test)))) ** 2)))
    cover = float(np.mean((f(np.asarray(X_test)) > lo) & (f(np.asarray(X_test)) < hi)))
    print(f"RMSE vs truth: {rmse:.4f}; 95% interval coverage: {cover:.2f}")
    return rmse


if __name__ == "__main__":
    main()
