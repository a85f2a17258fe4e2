"""Model comparison on one dataset: ExactGP (Matern) vs iBNN (NNGP kernel) vs
fully-Bayesian DKL.

Script equivalent of the reference's compare_GPs.ipynb: fit several GP
flavors to the same sparse noisy observations and compare predictive RMSE and
negative log predictive density on held-out points.  Set SMOKE=1 for tiny
budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
BUDGET = (dict(num_warmup=50, num_samples=50) if SMOKE
          else dict(num_warmup=1000, num_samples=1000))


def nlpd(mean, var, y):
    var = np.clip(np.asarray(var), 1e-6, None)
    return float(np.mean(0.5 * np.log(2 * np.pi * var)
                         + 0.5 * (np.asarray(y) - np.asarray(mean)) ** 2 / var))


def main():
    rng = np.random.default_rng(1)
    n = 16 if SMOKE else 60
    f = lambda x: np.sign(x) * 0.6 + 0.3 * np.sin(4 * x)  # discontinuous target
    X = np.sort(rng.uniform(-1.5, 1.5, n))
    y = f(X) + 0.1 * rng.normal(size=n)
    X_test = np.linspace(-1.4, 1.4, 81)
    y_test = f(X_test)

    key_fit, key_pred = gpax_tpu.utils.get_keys()
    results = {}

    gp = gpax_tpu.ExactGP(1, "Matern")
    gp.fit(key_fit, jnp.asarray(X), jnp.asarray(y), progress_bar=False,
           print_summary=False, **BUDGET)
    mean, var = gp.predict_moments(key_pred, jnp.asarray(X_test), noiseless=True)
    results["ExactGP-Matern"] = (
        float(np.sqrt(np.mean((np.asarray(mean) - y_test) ** 2))),
        nlpd(mean, var, y_test))

    ibnn = gpax_tpu.iBNN(1, depth=3)
    ibnn.fit(key_fit, jnp.asarray(X), jnp.asarray(y), progress_bar=False,
             print_summary=False, **BUDGET)
    mean_i, samples_i = ibnn.predict(key_pred, jnp.asarray(X_test), noiseless=True)
    flat = np.asarray(samples_i).reshape(-1, X_test.shape[0])
    results["iBNN"] = (
        float(np.sqrt(np.mean((np.asarray(mean_i) - y_test) ** 2))),
        nlpd(mean_i, flat.var(0), y_test))

    dkl = gpax_tpu.DKL(1, z_dim=2, kernel="RBF",
                       hidden_dim=[8, 8] if SMOKE else [32, 16])
    dkl.fit(key_fit, jnp.asarray(X), jnp.asarray(y), progress_bar=False,
            print_summary=False, **BUDGET)
    mean_d, samples_d = dkl.predict(key_pred, jnp.asarray(X_test), noiseless=True)
    flat_d = np.asarray(samples_d).reshape(-1, X_test.shape[0])
    results["DKL"] = (
        float(np.sqrt(np.mean((np.asarray(mean_d) - y_test) ** 2))),
        nlpd(mean_d, flat_d.var(0), y_test))

    print(f"{'model':<16} {'RMSE':>8} {'NLPD':>8}")
    for name, (rmse, nl) in results.items():
        print(f"{name:<16} {rmse:>8.4f} {nl:>8.3f}")
    best = min(results, key=lambda k: results[k][0])
    print(f"best RMSE: {best}")
    return results


if __name__ == "__main__":
    main()
