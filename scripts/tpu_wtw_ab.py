"""On-chip A/B for Config.hmc_wtw_precision (VERDICT r04 item 3).

Measures at n=8192.  Each invocation is ONE phase in its own process (a
second large fit in one process can fault the device — CLAUDE.md):

  python scripts/tpu_wtw_ab.py potgrad            # bare potgrad walls + grad err
  python scripts/tpu_wtw_ab.py nuts compensated   # short NUTS, exact-grad mode
  python scripts/tpu_wtw_ab.py nuts default       # short NUTS, bf16-grad mode

phase potgrad — bare potential+grad wall under wtw_precision 'compensated'
vs 'default' (bf16 single-pass backward WᵀW), loop-benchmarked with the
perturbation threaded through the ACCUMULATING carry (CLAUDE.md hoisting
rule) and a one-scalar host fetch barrier; plus the on-chip gradient
rel-error between the two modes.  These are 12-iteration probes, small
enough to share a process.

phase nuts — short segmented NUTS (40 warmup + 20 samples, depth 7,
segment 2) under the given mode: accept rate, warm per-leapfrog wall (from
segment telemetry, skipping the compile segment), posterior noise/length
mean±sd so statistical equivalence is visible next to the speed.

Chain:  nohup bash scripts/tpu_wtw_ab.sh > /tmp/wtw_ab.log 2>&1 &
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.flatten_util
import jax.numpy as jnp
import numpy as np

import gpax_tpu
from gpax_tpu.config import set_config
from gpax_tpu.infer.nuts import _host_sync

N = 8192
OUT = "/tmp/wtw_ab_results.jsonl"


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as fh:
        fh.write(line + "\n")


def make_data(n):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    return X, y


def build_potgrad(X, y):
    from gpax_tpu.ppl import initialize_model

    gp = gpax_tpu.ExactGP(1, "RBF")
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
    z0, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)

    def pot(z):
        return info.potential_fn(unravel(z))

    return jax.value_and_grad(pot), z0


def loop_bench(pg, z0, iters=12):
    """Per-iteration potgrad wall: perturbation rides the accumulating carry."""

    def body(carry, _):
        z, s = carry
        u, g = pg(z + s * 1e-20)
        return (z0 + 1e-6 * g, s + u * 1e-30), u

    prog = jax.jit(lambda z: jax.lax.scan(
        body, (z, jnp.zeros((), z.dtype)), None, length=iters))
    t0 = time.perf_counter()
    (zf, sf), us = prog(z0)
    _host_sync(sf)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    (zf, sf), us = prog(z0)
    _host_sync(sf)
    wall = time.perf_counter() - t0
    return wall / iters, compile_s


def phase_potgrad():
    X, y = make_data(N)
    grads = {}
    for mode in ("compensated", "default"):
        set_config(wtw_precision=mode)
        pg, z0 = build_potgrad(X, y)
        per_iter, compile_s = loop_bench(pg, z0)
        u, g = jax.jit(pg)(z0)
        _host_sync(u)
        grads[mode] = np.asarray(g, np.float64)
        emit(phase="potgrad", mode=mode, n=N,
             potgrad_ms=round(per_iter * 1e3, 2), compile_s=round(compile_s, 1),
             potential=float(u))
    rel = float(np.max(np.abs(grads["default"] - grads["compensated"])
                       / (np.abs(grads["compensated"]) + 1e-6)))
    emit(phase="grad_err", n=N, rel_err_default_vs_compensated=rel)


def phase_nuts(mode):
    X, y = make_data(N)
    set_config(hmc_wtw_precision=None if mode == "compensated" else mode)
    gp = gpax_tpu.ExactGP(1, "RBF")
    t0 = time.perf_counter()
    gp.fit(jax.random.PRNGKey(0), X, y, num_warmup=40, num_samples=20,
           max_tree_depth=7, segment_size=2, print_summary=False,
           progress_bar=False)
    fit_s = time.perf_counter() - t0
    st = gp.mcmc.get_extra_fields()
    seg_wall = np.asarray(st["segment_wall_s"], np.float64)
    seg_leap = np.asarray(st["segment_leapfrogs"], np.float64)
    warm = slice(1, None)  # segment 0 carries the compile
    leap_ms = 1e3 * seg_wall[warm].sum() / max(seg_leap[warm].sum(), 1.0)
    samples = gp.get_samples()
    emit(phase="nuts", mode=mode, n=N,
         fit_s=round(fit_s, 1),
         accept=float(np.asarray(st["accept_prob"]).mean()),
         divergences=int(np.asarray(st["diverging"]).sum()),
         warm_ms_per_leapfrog=round(float(leap_ms), 2),
         leapfrogs=float(seg_leap.sum()),
         noise_mean=float(np.mean(np.asarray(samples["noise"]))),
         noise_sd=float(np.std(np.asarray(samples["noise"]))),
         length_mean=float(np.mean(np.asarray(samples["k_length"]))),
         step_size=float(np.asarray(st["step_size"])[-1]))


if __name__ == "__main__":
    phase = sys.argv[1]
    if phase == "potgrad":
        phase_potgrad()
    else:
        phase_nuts(sys.argv[2])
    print("PHASE DONE", phase, flush=True)
