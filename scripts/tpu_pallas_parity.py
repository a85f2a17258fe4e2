"""On-hardware Pallas parity + timing artifact (VERDICT r01 item 9).

Runs ON THE REAL TPU CHIP (one process, one program family at a time per
CLAUDE.md) and records:

  * compiled-Pallas vs XLA gram parity (values + VJP) at several shapes,
    including the d<=64 dispatch boundary,
  * 'compensated' (split-f32 hi+lo bf16) vs 'highest' gram error + speed,
  * blocked Pallas trtri vs XLA solve_triangular parity + speed,
  * measured Pallas-vs-XLA crossover timings justifying the dispatch
    thresholds in kernels._pallas_eligible / chol.blocked_eligible.

Writes PALLAS_PARITY_r02.json at the repo root.

Run:  python scripts/tpu_pallas_parity.py
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

from gpax_tpu.kernels import MaternKernel, RBFKernel  # noqa: E402
from gpax_tpu.ops.pallas_gram import gram  # noqa: E402
from gpax_tpu.ops.chol import blocked_trtri  # noqa: E402
from jax.scipy.linalg import solve_triangular  # noqa: E402

OUT = pathlib.Path("/root/repo/PALLAS_PARITY_r02.json")
results = {"device": str(jax.devices()[0]), "checks": []}


def timeit(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def loop_timeit(fn, X, reps=16):
    """On-device per-call time: `reps` data-dependent iterations inside ONE jit
    program, so tunnel dispatch latency (~5 ms/call through axon) amortizes
    away and the number reflects the kernel itself."""
    @jax.jit
    def looped(X):
        def body(i, acc):
            out = fn(X * (1.0 + 1e-9 * jnp.float32(i)))
            return acc + out[0, 0]
        return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))

    r = looped(X)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = looped(X)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def check(name, **kw):
    kw["name"] = name
    results["checks"].append(kw)
    print(json.dumps(kw), flush=True)


def gram_parity():
    rng = np.random.default_rng(0)
    for kind, ref_k in [("rbf", RBFKernel), ("matern52", MaternKernel)]:
        for n, d in [(512, 1), (2048, 2), (2048, 64), (4096, 8)]:
            X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
            kl = jnp.asarray(rng.uniform(0.5, 2.0, d), jnp.float32)
            ks = jnp.asarray(1.5, jnp.float32)
            nz = jnp.asarray(0.1, jnp.float32)

            pall = jax.jit(lambda X: gram(X, X, kl, ks, nz, kind=kind))
            xla = jax.jit(lambda X: ref_k(
                X, X, {"k_length": kl, "k_scale": ks}, nz))
            t_p = loop_timeit(lambda X: gram(X, X, kl, ks, nz, kind=kind), X)
            t_x = loop_timeit(
                lambda X: ref_k(X, X, {"k_length": kl, "k_scale": ks}, nz), X)
            out_p, out_x = pall(X), xla(X)
            err = float(jnp.max(jnp.abs(out_p - out_x)))

            # VJP parity through both paths
            gp = jax.jit(jax.grad(lambda X: jnp.sum(jnp.sin(
                gram(X, X, kl, ks, nz, kind=kind)))))(X)
            gx = jax.jit(jax.grad(lambda X: jnp.sum(jnp.sin(
                ref_k(X, X, {"k_length": kl, "k_scale": ks}, nz)))))(X)
            gerr = float(jnp.max(jnp.abs(gp - gx)) /
                         (jnp.max(jnp.abs(gx)) + 1e-12))
            check(f"gram_{kind}_n{n}_d{d}",
                  pallas_ms=t_p * 1e3, xla_ms=t_x * 1e3,
                  max_abs_err=err, rel_grad_err=gerr,
                  ok=bool(err < 1e-4 and gerr < 1e-3))


def compensated():
    rng = np.random.default_rng(1)
    for n, d in [(2048, 64), (4096, 64), (4096, 8)]:
        X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
        kl = jnp.ones(d, jnp.float32)
        t_h = loop_timeit(
            lambda X: gram(X, X, kl, 1.0, 1e-3, precision="highest"), X)
        t_c = loop_timeit(
            lambda X: gram(X, X, kl, 1.0, 1e-3, precision="compensated"), X)
        out_h = jax.jit(lambda X: gram(X, X, kl, 1.0, 1e-3,
                                       precision="highest"))(X)
        out_c = jax.jit(lambda X: gram(X, X, kl, 1.0, 1e-3,
                                       precision="compensated"))(X)
        err = float(jnp.max(jnp.abs(out_h - out_c)))
        pd = bool(jnp.all(jnp.isfinite(jnp.linalg.cholesky(out_c))))
        # ok = numerically sound (PD + bounded error); the speedup is DATA, not
        # a gate — measured: GP gram shapes are latency/bandwidth-bound on
        # v5e, so compensated does not pay there (see Config.gram_precision)
        check(f"compensated_gram_n{n}_d{d}",
              highest_ms=t_h * 1e3, compensated_ms=t_c * 1e3,
              speedup=t_h / t_c, max_abs_err=err, chol_pd=pd,
              ok=bool(err < 2.5e-3 and pd))


def trtri():
    rng = np.random.default_rng(2)
    for n in [512, 2048, 4096]:
        A = rng.normal(size=(n, n)).astype(np.float32)
        K = jnp.asarray(A @ A.T + n * np.eye(n, dtype=np.float32))
        L = jnp.linalg.cholesky(K)
        eye = jnp.eye(n, dtype=jnp.float32)
        f_p = jax.jit(lambda L: blocked_trtri(L))
        f_x = jax.jit(lambda L: solve_triangular(L, eye, lower=True))
        t_p = loop_timeit(lambda L: blocked_trtri(L), L)
        t_x = loop_timeit(lambda L: solve_triangular(L, eye, lower=True), L)
        W_p, W_x = f_p(L), f_x(L)
        # residual-based check: ||L @ W - I||_max (conditioning-appropriate)
        res_p = float(jnp.max(jnp.abs(L @ W_p - eye)))
        res_x = float(jnp.max(jnp.abs(L @ W_x - eye)))
        check(f"trtri_n{n}", pallas_ms=t_p * 1e3, xla_ms=t_x * 1e3,
              speedup=t_x / t_p, residual_pallas=res_p, residual_xla=res_x,
              ok=bool(res_p < 10 * max(res_x, 1e-6)))


def main():
    for fn in (gram_parity, compensated, trtri):
        try:
            fn()
        except Exception as e:  # record, keep going
            check(f"FAILED_{fn.__name__}", error=repr(e)[:300], ok=False)
    results["all_ok"] = all(c.get("ok", True) for c in results["checks"])
    OUT.write_text(json.dumps(results, indent=1))
    print(f"wrote {OUT} all_ok={results['all_ok']}")


if __name__ == "__main__":
    main()
