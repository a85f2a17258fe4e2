"""Large-grid reconstruction with an inducing-point sparse GP (VFE).

BASELINE.md config 3 workflow ("viSparseGP inducing-point large-grid
hyperspectral reconstruction"): many measured points, trainable inducing
locations, full-grid prediction.  Set SMOKE=1 for tiny budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu

SMOKE = bool(int(os.environ.get("SMOKE", "0")))


def main():
    rng = np.random.default_rng(0)
    n = 60 if SMOKE else 2000
    X = rng.uniform(0, 4, n)
    y = np.sin(3 * X) * np.exp(-0.3 * X) + 0.05 * rng.normal(size=n)

    key_fit, key_pred = gpax_tpu.utils.get_keys()
    model = gpax_tpu.viSparseGP(input_dim=1, kernel="RBF")
    model.fit(key_fit, jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
              inducing_points_ratio=0.2 if SMOKE else 0.05,
              inducing_points_selection="uniform",
              num_steps=300 if SMOKE else 3000,
              print_summary=not SMOKE, progress_bar=False)
    print(f"{model.Xu.shape[0]} inducing points optimized for {n} observations")

    grid = jnp.linspace(0, 4, 101 if SMOKE else 2001)
    mean, var = model.predict_in_batches(key_pred, grid, batch_size=512)
    truth = np.sin(3 * np.asarray(grid)) * np.exp(-0.3 * np.asarray(grid))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    print(f"grid reconstruction RMSE: {rmse:.4f} (noise level 0.05)")
    return rmse


if __name__ == "__main__":
    main()
