"""n=8192 NUTS device-fault probe (VERDICT r01 item 2).

Round-1 finding (CLAUDE.md): n=8192 NUTS faulted the chip at runtime
(UNAVAILABLE "kernel fault") even solo and even segmented, while n=4096 worked.
The program has since changed materially: the per-leapfrog MVN density now goes
through ops.linalg.mvn_log_prob_centered (one XLA Cholesky + blocked Pallas
trtri + matvec forward; closed-form matmul backward) instead of a generic
Cholesky-VJP graph.  This probe re-tests 8192 under the new program.

Variants (pass as argv[1]; run each in its OWN process — a fault wedges the
device for ~1 min):
  short   — 10+10 segmented NUTS, max_depth 6 (smallest program that faulted)
  potgrad — 200 standalone potential+grad evals (known-good control at r01)

Run:  python scripts/tpu_n8192_probe.py short
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

N = 8192


def make_problem():
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (N, 1)), dtype=jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=N), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    return initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))


def variant_short(max_depth=6, segment_size=5):
    from gpax_tpu.infer.nuts import run_nuts_segmented

    info = make_problem()
    t0 = time.time()
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(1),
        num_warmup=10, num_samples=10, max_tree_depth=max_depth,
        segment_size=segment_size, progress=True,
    )
    jax.block_until_ready(stats["accept_prob"])
    return {"fit_s": time.time() - t0,
            "leapfrogs": float(np.asarray(stats["num_steps"]).sum()),
            "accept": float(np.asarray(stats["accept_prob"]).mean()),
            "segment_wall_s": [round(float(s), 2)
                               for s in np.asarray(stats["segment_wall_s"])]}


def variant_depth7():
    """Candidate next-round headline config: deeper trees (better adaptation,
    higher accept) with segment 2 keeping worst-case call duration bounded."""
    return variant_short(max_depth=7, segment_size=2)


def variant_legacy():
    """r01-style program (use_pallas_chol='never': safe_cholesky +
    solve_triangular density, generic VJP) — the path that faulted at r01.
    Run ONLY to attribute a fix if 'short' succeeds."""
    import gpax_tpu

    gpax_tpu.set_config(use_pallas_chol="never")
    return variant_short()


def variant_potgrad():
    import jax.flatten_util

    info = make_problem()
    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    pg = jax.jit(jax.value_and_grad(lambda z: info.potential_fn(unravel(z))))
    u, g = pg(zf)
    jax.block_until_ready(g)
    t0 = time.time()
    z = zf
    for _ in range(200):
        u, g = pg(z)
        z = z - 1e-5 * g
    jax.block_until_ready(g)
    return {"evals_200_s": time.time() - t0, "final_potential": float(u)}


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "short"
    fn = {"short": variant_short, "potgrad": variant_potgrad,
          "legacy": variant_legacy, "depth7": variant_depth7}[variant]
    try:
        out = fn()
        out.update(variant=variant, n=N, ok=True)
    except Exception as e:
        out = {"variant": variant, "n": N, "ok": False, "error": repr(e)[:400]}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
