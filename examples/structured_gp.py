"""Structured (physics-informed mean function) GP vs plain GP.

Script equivalent of the reference's GP_sGP.ipynb: a GP whose prior mean is a
parametric physical model (here a damped oscillator with unknown amplitude /
decay) extrapolates far better than a zero-mean GP, while the GP part absorbs
model misspecification.  Set SMOKE=1 for tiny budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu
from gpax_tpu import distributions as dist
from gpax_tpu import ppl

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
BUDGET = (dict(num_warmup=50, num_samples=50) if SMOKE
          else dict(num_warmup=1000, num_samples=1000))


def oscillator(x, params):
    """Parametric hypothesis: A·sin(w·x)·exp(−d·x)."""
    return (params["A"] * jnp.sin(params["w"] * x)
            * jnp.exp(-params["d"] * x)).squeeze()


def oscillator_prior():
    return {
        "A": ppl.sample("A", dist.LogNormal(0.0, 0.5)),
        "w": ppl.sample("w", dist.Uniform(3.0, 7.0)),
        "d": ppl.sample("d", dist.LogNormal(0.0, 0.5)),
    }


def main():
    rng = np.random.default_rng(0)
    truth = lambda x: 1.2 * np.sin(5.0 * x) * np.exp(-0.8 * x)
    n = 12 if SMOKE else 30
    # observe only the first half of the domain; extrapolate the rest
    X = np.sort(rng.uniform(0.0, 1.2, n))
    y = truth(X) + 0.05 * rng.normal(size=n)
    X_test = np.linspace(0.0, 2.4, 97)

    key_fit, key_pred = gpax_tpu.utils.get_keys()

    sgp = gpax_tpu.ExactGP(1, "Matern", mean_fn=oscillator,
                           mean_fn_prior=oscillator_prior)
    sgp.fit(key_fit, jnp.asarray(X), jnp.asarray(y), progress_bar=False,
            print_summary=False, **BUDGET)
    mean_s, _ = sgp.predict(key_pred, jnp.asarray(X_test), noiseless=True)

    gp = gpax_tpu.ExactGP(1, "Matern")
    gp.fit(key_fit, jnp.asarray(X), jnp.asarray(y), progress_bar=False,
           print_summary=False, **BUDGET)
    mean_p, _ = gp.predict(key_pred, jnp.asarray(X_test), noiseless=True)

    extrap = X_test > 1.2
    rmse_s = float(np.sqrt(np.mean(
        (np.asarray(mean_s)[extrap] - truth(X_test[extrap])) ** 2)))
    rmse_p = float(np.sqrt(np.mean(
        (np.asarray(mean_p)[extrap] - truth(X_test[extrap])) ** 2)))
    print(f"extrapolation RMSE  structured-GP: {rmse_s:.4f}   plain GP: {rmse_p:.4f}")
    if not SMOKE:
        assert rmse_s < rmse_p, "structured mean should extrapolate better"
    return rmse_s, rmse_p


if __name__ == "__main__":
    main()
