"""Headline benchmark: ExactGP NUTS fit wall-clock (BASELINE.md config 1).

Config: ExactGP, RBF kernel, 1D regression, n=2048 training points, NUTS with
100 warmup + 100 samples, max_tree_depth=8, f32, one TPU chip.

vs_baseline: speedup over the reference-equivalent CPU cost, estimated as
(measured leapfrog count) x (measured per-leapfrog potential+grad wall-clock of
THIS framework on the driver host CPU: 0.750 s/eval at n=2048, single core,
measured 2026-08-16).  The reference (gpax+numpyro on CPU) pays at least that per
leapfrog plus Python MCMC-driver overhead, so the reported speedup is conservative.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/gpax_tpu_jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

CPU_SECONDS_PER_LEAPFROG_N2048 = 0.750  # measured on this host (see module docstring)

N = 2048
NUM_WARMUP = 100
NUM_SAMPLES = 100
MAX_DEPTH = 8


def main():
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (N, 1)), dtype=jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=N), dtype=jnp.float32)

    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))

    fit = jax.jit(
        lambda k: run_nuts(
            info.potential_fn, info.init_unconstrained, k,
            NUM_WARMUP, NUM_SAMPLES, max_tree_depth=MAX_DEPTH,
        )[:2]
    )
    # compile (cached across rounds via the persistent cache)
    zs, stats = fit(jax.random.PRNGKey(1))
    jax.block_until_ready(zs)
    # measure
    t0 = time.time()
    zs, stats = fit(jax.random.PRNGKey(2))
    jax.block_until_ready(zs)
    fit_s = time.time() - t0

    leapfrogs = float(np.asarray(stats["num_steps"]).sum()) + NUM_WARMUP + NUM_SAMPLES
    baseline_s = leapfrogs * CPU_SECONDS_PER_LEAPFROG_N2048
    print(json.dumps({
        "metric": f"exactgp_rbf1d_n{N}_nuts{NUM_WARMUP}+{NUM_SAMPLES}_fit_wallclock",
        "value": round(fit_s, 3),
        "unit": "s",
        "vs_baseline": round(baseline_s / fit_s, 1),
    }))


if __name__ == "__main__":
    main()
