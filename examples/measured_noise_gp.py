"""GP regression with measured (per-point) noise variances.

Script equivalent of the reference's MeasuredNoiseGP.ipynb.  Set SMOKE=1 for
tiny budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
BUDGET = dict(num_warmup=100, num_samples=100) if SMOKE else dict(num_warmup=1500, num_samples=1500)


def main():
    rng = np.random.default_rng(0)
    n = 14 if SMOKE else 50
    X = np.sort(rng.uniform(-1, 1, n))
    # each point was measured repeatedly: mean + known variance of the mean
    repeats = rng.integers(3, 20, n)
    true_sd = 0.3
    y_mean = np.sin(3 * X) + true_sd / np.sqrt(repeats) * rng.normal(size=n)
    measured_var = true_sd**2 / repeats

    key_fit, key_pred = gpax_tpu.utils.get_keys()
    model = gpax_tpu.MeasuredNoiseGP(input_dim=1, kernel="Matern")
    model.fit(key_fit, jnp.asarray(X, jnp.float32), jnp.asarray(y_mean, jnp.float32),
              jnp.asarray(measured_var, jnp.float32),
              print_summary=not SMOKE, progress_bar=False, **BUDGET)

    grid = jnp.linspace(-1, 1, 41)
    mean, sampled = model.predict(key_pred, grid, n=2,
                                  noise_prediction_method="linreg")
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sin(3 * np.asarray(grid))) ** 2)))
    print(f"RMSE vs truth: {rmse:.4f}")
    print("sampled predictions:", sampled.shape)
    return rmse


if __name__ == "__main__":
    main()
