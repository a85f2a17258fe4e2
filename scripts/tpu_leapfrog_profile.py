"""Per-leapfrog cost decomposition on the real chip.

Times each component of the NUTS leapfrog at n in {2048, 4096, 8192} with
data-dependent iterations inside ONE jit program (amortizing the ~1.7 ms
per-dispatch floor of this runtime):

    gram         fused Pallas RBF gram (HIGHEST)
    gram_comp    fused Pallas RBF gram (compensated split-bf16)
    chol         XLA native Cholesky
    trtri        blocked Pallas triangular inverse
    wtw          WᵀW (the dominant backward matmul, HIGHEST)
    potgrad      full value_and_grad of the ExactGP potential

Writes LEAPFROG_PROFILE_r02.json.  Run: python scripts/tpu_leapfrog_profile.py
"""

import json
import pathlib
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from gpax_tpu.ops.pallas_gram import gram  # noqa: E402
from gpax_tpu.ops.chol import blocked_trtri  # noqa: E402

OUT = pathlib.Path("/root/repo/LEAPFROG_PROFILE_r02.json")
HI = jax.lax.Precision.HIGHEST


def loop_time(fn, X, reps):
    @jax.jit
    def looped(X):
        def body(i, acc):
            out = fn(X * (1.0 + 1e-9 * jnp.float32(i)))
            return acc + jnp.ravel(out)[0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    r = looped(X)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = looped(X)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def profile_n(n, reps):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    kl = jnp.ones(1, jnp.float32)
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
    L = jnp.linalg.cholesky(K)
    W = blocked_trtri(L)

    out = {"n": n}
    out["gram_ms"] = loop_time(
        lambda X: gram(X, X, kl, 1.0, 0.1, precision="highest"), X, reps) * 1e3
    out["gram_comp_ms"] = loop_time(
        lambda X: gram(X, X, kl, 1.0, 0.1, precision="compensated"),
        X, reps) * 1e3
    out["chol_ms"] = loop_time(jnp.linalg.cholesky, K, reps) * 1e3
    out["trtri_ms"] = loop_time(blocked_trtri, L, reps) * 1e3
    out["wtw_ms"] = loop_time(
        lambda W: jnp.matmul(W.T, W, precision=HI), W, reps) * 1e3
    out["wtw_default_ms"] = loop_time(
        lambda W: jnp.matmul(W.T, W, precision=jax.lax.Precision.DEFAULT),
        W, reps) * 1e3

    # ablations: forward-only density, density fwd+vjp on a prebuilt gram,
    # gram fwd+vjp — brackets where potgrad time beyond raw components goes
    from gpax_tpu.ops.linalg import mvn_log_prob_centered

    diff = jnp.asarray(rng.normal(size=n), jnp.float32)
    Kpd = K  # SPD by construction above
    out["mvn_fwd_ms"] = loop_time(
        lambda K: mvn_log_prob_centered(K, diff), Kpd, reps) * 1e3

    def mvn_vjp(K):
        v, gr = jax.value_and_grad(
            lambda K: mvn_log_prob_centered(K, diff))(K)
        return v + gr[0, 0]

    out["mvn_vjp_ms"] = loop_time(mvn_vjp, Kpd, reps) * 1e3

    def gram_vjp(X):
        v, gr = jax.value_and_grad(
            lambda X: gram(X, X, kl, 1.0, 0.1).sum())(X)
        return v + gr[0, 0]

    out["gram_vjp_ms"] = loop_time(gram_vjp, X, reps) * 1e3

    # the fused-density op alone (fwd+closed-form bwd), outside the PPL layer
    from gpax_tpu.ops.fused_density import gp_mvn_log_prob

    diff2 = jnp.asarray(rng.normal(size=n), jnp.float32)
    jb = 4.0 * n * float(jnp.finfo(jnp.float32).eps)

    def fused_vjp(X):
        v, gr = jax.value_and_grad(
            lambda kl: gp_mvn_log_prob(X, kl, jnp.float32(1.2),
                                       jnp.float32(0.1 + jb), diff2, "rbf"))(
            jnp.ones(X.shape[1], jnp.float32))
        return v + gr[0]

    out["fused_vjp_ms"] = loop_time(fused_vjp, X, reps) * 1e3

    import gpax_tpu
    from gpax_tpu.ppl import initialize_model

    y = jnp.sin(2 * X[:, 0])
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))

    @jax.jit
    def pot_loop(z):
        def body(i, z):
            u, g = pg(z)
            return z - 1e-6 * g
        return jax.lax.fori_loop(0, reps, body, z)

    r = pot_loop(zf)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = pot_loop(zf)
    jax.block_until_ready(r)
    out["potgrad_ms"] = (time.perf_counter() - t0) / reps * 1e3

    pot = lambda z: info.potential_fn(unravel(z))  # noqa: E731

    @jax.jit
    def pot_fwd_loop(z):
        def body(i, z):
            return z + 1e-9 * pot(z)
        return jax.lax.fori_loop(0, reps, body, z)

    r = pot_fwd_loop(zf)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = pot_fwd_loop(zf)
    jax.block_until_ready(r)
    out["pot_fwd_ms"] = (time.perf_counter() - t0) / reps * 1e3

    # composed (pre-fusion) potential for A/B: dispatch forced off
    gpax_tpu.set_config(use_fused_likelihood="never")
    try:
        info_c = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
        pg_c = jax.value_and_grad(lambda z: info_c.potential_fn(unravel(z)))

        @jax.jit
        def pot_loop_c(z):
            def body(i, z):
                u, g = pg_c(z)
                return z - 1e-6 * g
            return jax.lax.fori_loop(0, reps, body, z)

        r = pot_loop_c(zf)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = pot_loop_c(zf)
        jax.block_until_ready(r)
        out["potgrad_composed_ms"] = (time.perf_counter() - t0) / reps * 1e3
    finally:
        gpax_tpu.set_config(use_fused_likelihood="auto")
    print(json.dumps(out), flush=True)
    return out


def main():
    results = {"device": str(jax.devices()[0]), "profiles": []}
    for n, reps in [(2048, 16), (4096, 8), (8192, 4)]:
        try:
            results["profiles"].append(profile_n(n, reps))
        except Exception as e:
            print(json.dumps({"n": n, "error": repr(e)[:300]}), flush=True)
    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT}")


if __name__ == "__main__":
    main()
