"""A/B: fused vs composed likelihood INSIDE segmented NUTS (warm, per-leapfrog).

The standalone potgrad ablation says fused is faster (153 vs 186 ms at
n=8192), but the instrumented bench suggested fused-in-NUTS is slower per
leapfrog at n=4096.  This probe measures exactly that, one mode per process:

    python scripts/tpu_fused_ab.py never [n]   # composed path
    python scripts/tpu_fused_ab.py auto  [n]   # fused path

Reports warm ms/leapfrog from segments 2+ (segment 1 carries compile).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = int(sys.argv[2]) if len(sys.argv) > 2 else 4096


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "auto"
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented

    gpax_tpu.set_config(use_fused_likelihood=mode)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (N, 1)), dtype=jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=N), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))

    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
        num_warmup=30, num_samples=30, max_tree_depth=6, segment_size=10,
        progress=False,
    )
    seg_wall = np.asarray(stats["segment_wall_s"])
    # leapfrogs per segment from per-draw num_steps is sliced to samples only;
    # use total leapfrogs and total-warm time for the rate instead
    leapfrogs = float(np.asarray(stats["num_steps"]).sum()) + 60
    warm_s = float(seg_wall[1:].sum())
    warm_frac = len(seg_wall[1:]) / len(seg_wall)
    print(json.dumps({
        "mode": mode, "n": N,
        "segments_s": [round(float(s), 2) for s in seg_wall],
        "leapfrogs": leapfrogs,
        "warm_ms_per_leapfrog": 1e3 * warm_s / max(leapfrogs * warm_frac, 1),
        "accept": float(np.asarray(stats["accept_prob"]).mean()),
    }), flush=True)


if __name__ == "__main__":
    main()
