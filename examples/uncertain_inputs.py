"""Uncertain-input GP: jointly infer latent true inputs and the function.

Script equivalent of the reference's gpax_UIGP.ipynb.  Set SMOKE=1 for tiny budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu

SMOKE = bool(int(os.environ.get("SMOKE", "0")))
BUDGET = dict(num_warmup=100, num_samples=100) if SMOKE else dict(num_warmup=1500, num_samples=1500)


def main():
    rng = np.random.default_rng(0)
    n = 14 if SMOKE else 60
    X_true = np.sort(rng.uniform(0, 1, n))
    X_obs = np.clip(X_true + 0.03 * rng.normal(size=n), 0, 1)  # noisy coordinates
    y = np.sin(6 * X_true)

    key_fit, key_pred = gpax_tpu.utils.get_keys()
    model = gpax_tpu.UIGP(input_dim=1, kernel="Matern",
                          sigma_x_prior_dist=gpax_tpu.priors.halfnormal_dist(0.05))
    model.fit(key_fit, jnp.asarray(X_obs, jnp.float32), jnp.asarray(y, jnp.float32),
              print_summary=not SMOKE, progress_bar=False, **BUDGET)

    s = model.get_samples()
    sigma_x = float(np.asarray(s["sigma_x"]).mean())
    X_prime = np.asarray(s["X_prime"]).mean(0)[:, 0]
    improve = np.abs(X_obs - X_true).mean() - np.abs(X_prime - X_true).mean()
    print(f"inferred input noise sd: {sigma_x:.4f} (truth 0.03)")
    print(f"latent-input recovery improvement: {improve:+.4f} (positive = better)")

    mean, sampled = model.predict(key_pred, jnp.linspace(0, 1, 40), n=2)
    print("predictive mean finite:", bool(jnp.isfinite(mean).all()))
    return sigma_x


if __name__ == "__main__":
    main()
