"""Heteroskedastic GP: infer input-dependent noise with a latent noise GP.

Script equivalent of the reference's heteroskedasticGP.ipynb.  Set SMOKE=1 for
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
    n = 16 if SMOKE else 80
    X = np.sort(rng.uniform(-1, 1, n))
    noise_sd = 0.05 + 0.4 * (X + 1) / 2          # noise grows left -> right
    y = np.sin(4 * X) + noise_sd * rng.normal(size=n)

    key_fit, key_pred = gpax_tpu.utils.get_keys()
    model = gpax_tpu.VarNoiseGP(input_dim=1, kernel="RBF", noise_kernel="RBF")
    model.fit(key_fit, jnp.asarray(X, jnp.float32), jnp.asarray(y, jnp.float32),
              print_summary=not SMOKE, progress_bar=False, **BUDGET)

    # inferred per-point training noise should increase along x
    var_samples = model.get_data_var_samples()
    inferred_sd = np.sqrt(np.asarray(var_samples).mean(0))
    left, right = inferred_sd[: n // 4].mean(), inferred_sd[-n // 4:].mean()
    print(f"inferred noise sd: left {left:.3f} vs right {right:.3f} "
          f"(truth {noise_sd[:n//4].mean():.3f} vs {noise_sd[-n//4:].mean():.3f})")

    mean, sampled = model.predict(key_pred, jnp.linspace(-1, 1, 50))
    print("predictive mean finite:", bool(jnp.isfinite(mean).all()))
    return left, right


if __name__ == "__main__":
    main()
