"""Deep-kernel-learning active learning on high-dimensional inputs.

Script equivalent of the reference's viDKL active-learning workflow
(gpax_viDKL_plasmons.ipynb shape): image-patch-like inputs, viDKL embedding to a
2-D latent space, uncertainty-driven acquisition.  Set SMOKE=1 for tiny budgets.
"""

import os

import jax.numpy as jnp
import numpy as np

import gpax_tpu

SMOKE = bool(int(os.environ.get("SMOKE", "0")))


def main():
    rng = np.random.default_rng(0)
    n_pool, d = (40, 16) if SMOKE else (400, 64)
    # latent 2-D structure embedded in d dims
    latent = rng.normal(size=(n_pool, 2))
    mix = rng.normal(size=(2, d)) / np.sqrt(2)
    X_pool = latent @ mix + 0.01 * rng.normal(size=(n_pool, d))
    y_pool = np.sin(latent[:, 0] * 2.0) + 0.3 * latent[:, 1]

    measured = list(rng.choice(n_pool, size=8, replace=False))
    key_fit, key_pred = gpax_tpu.utils.get_keys()

    steps = 2 if SMOKE else 10
    for it in range(steps):
        unmeasured = [i for i in range(n_pool) if i not in measured]
        X_m = jnp.asarray(X_pool[measured], jnp.float32)
        y_m = jnp.asarray(y_pool[measured], jnp.float32)
        dkl = gpax_tpu.viDKL(input_dim=d, z_dim=2, kernel="RBF")
        dkl.fit(key_fit, X_m, y_m, num_steps=100 if SMOKE else 1000,
                print_summary=False, progress_bar=False)
        mean, var = dkl.predict(key_pred, jnp.asarray(X_pool[unmeasured], jnp.float32))
        nxt = unmeasured[int(jnp.argmax(var))]
        measured.append(nxt)
        rmse = float(jnp.sqrt(jnp.mean((mean - jnp.asarray(y_pool[unmeasured])) ** 2)))
        print(f"AL step {it:02d}: pool RMSE {rmse:.4f}, acquired point {nxt}")

    z = dkl.embed(jnp.asarray(X_pool, jnp.float32))
    print("latent embedding:", z.shape)
    return rmse


if __name__ == "__main__":
    main()
