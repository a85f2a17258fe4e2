"""Diagnose the low sampling accept at n=8192 under a 50-step warmup.

Runs the bench's exactgp8k config with collect_warmup telemetry and prints:
per-10-transition accept means, the step-size trace (live during warmup,
frozen during sampling), and divergence counts; then the same with
num_warmup=100.  One process, runs chained (one TPU process at a time).
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

OUT = pathlib.Path("/root/repo/PROFILE_r03.jsonl")


def record(**kv):
    kv = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in kv.items()}
    print(json.dumps(kv), flush=True)
    with OUT.open("a") as fh:
        fh.write(json.dumps(kv) + "\n")


def run(num_warmup, num_samples, n=8192, max_tree_depth=7, segment_size=2,
        dense_mass=0):
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))

    t0 = time.time()
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
        num_warmup=num_warmup, num_samples=num_samples,
        max_tree_depth=max_tree_depth, segment_size=segment_size,
        dense_mass=bool(dense_mass), collect_warmup=True)
    total_s = time.time() - t0

    acc = np.asarray(stats["accept_prob"], np.float64)
    eps = np.asarray(stats["step_size"], np.float64)
    div = np.asarray(stats["diverging"])
    nst = np.asarray(stats["num_steps"], np.float64)
    chunks = [round(float(acc[i:i + 10].mean()), 3) for i in range(0, len(acc), 10)]
    record(probe=f"warmup_diag_{n}", n=n, max_tree_depth=max_tree_depth,
           dense_mass=bool(dense_mass),
           num_warmup=num_warmup,
           num_samples=num_samples, total_s=total_s,
           accept_sampling=float(acc[num_warmup:].mean()),
           accept_last25_warmup=float(acc[max(0, num_warmup - 25):num_warmup].mean()),
           eps_frozen=float(eps[-1]),
           eps_trace=[round(float(e), 5) for e in eps[:: max(1, len(eps) // 20)]],
           accept_per10=chunks,
           divergences=int(div.sum()),
           leapfrogs_per_transition=float(nst.mean()))


if __name__ == "__main__":
    if len(sys.argv) > 2:
        run(*[int(a) for a in sys.argv[1:]])
    else:
        run(50, 50)
