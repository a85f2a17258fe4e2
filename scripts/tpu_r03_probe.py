"""Round-3 on-chip probes.  Each subcommand runs in its own process (one TPU
process at a time; one big fit per process — CLAUDE.md) and appends one JSON
line to PROFILE_r03.jsonl:

    python scripts/tpu_r03_probe.py mtgp_prof     # small-n LCM potential + NUTS rate
    python scripts/tpu_r03_probe.py exact8k_ab    # bare potgrad vs in-NUTS @8192
    python scripts/tpu_r03_probe.py mvn_ablate    # mvn_log_prob_centered VJP breakdown
    python scripts/tpu_r03_probe.py fused_ab      # fused vs composed potgrad @8192

Same-process A/B everywhere (tunnel service throughput varies 2-10x between
runs — CLAUDE.md), warm rates from per-segment telemetry.
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

OUT = pathlib.Path("/root/repo/PROFILE_r03.jsonl")
HI = jax.lax.Precision.HIGHEST


def record(**kv):
    kv = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in kv.items()}
    print(json.dumps(kv), flush=True)
    with OUT.open("a") as fh:
        fh.write(json.dumps(kv) + "\n")


def loop_time_z(pg, z, reps):
    """Time value_and_grad in a fori_loop (amortizes dispatch)."""
    @jax.jit
    def looped(z):
        def body(i, z):
            u, g = pg(z)
            return z - 1e-7 * g
        return jax.lax.fori_loop(0, reps, body, z)

    r = looped(z)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = looped(z)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / reps


def hlo_op_count(fn, *args):
    """Instruction count of the optimized HLO (rough op-floor predictor)."""
    try:
        comp = jax.jit(fn).lower(*args).compile()
        txt = comp.as_text()
        n = sum(1 for ln in txt.splitlines()
                if "=" in ln and not ln.lstrip().startswith(("//", "ENTRY", "}")))
        return n
    except Exception:
        return -1


def _mtgp_setup(rank=2):
    import gpax_tpu

    rng = np.random.default_rng(0)
    n_lo, n_hi = 40, 8
    X_lo, X_hi = rng.uniform(0, 2, n_lo), rng.uniform(0, 2, n_hi)
    X = np.concatenate([np.column_stack([X_lo, np.zeros(n_lo)]),
                        np.column_stack([X_hi, np.ones(n_hi)])])
    y = np.concatenate([0.8 * np.sin(5 * X_lo) * np.exp(-X_lo),
                        np.sin(5 * X_hi) * np.exp(-X_hi)])
    # noisy observations: noiseless targets collapse the noise posterior onto
    # the jitter floor (log-noise ≈ −9, exploding curvature, ε → 0.0016,
    # max-depth trees) — see bench.py bench_mtgp_bo
    y = y + 0.05 * np.random.default_rng(7).normal(size=y.shape)
    mtgp = gpax_tpu.MultiTaskGP(1, "Matern", num_latents=1, num_tasks=2,
                                rank=rank)
    X = jnp.asarray(X, jnp.float32)
    y = jnp.asarray(y, jnp.float32)
    mtgp.X_train, mtgp.y_train = X, y
    return mtgp, X, y


def mtgp_prof(rank=2, tag="mtgp_prof"):
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented

    mtgp, X, y = _mtgp_setup(rank)
    info = initialize_model(mtgp.model, jax.random.PRNGKey(0), (X, y))
    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))

    ops = hlo_op_count(lambda z: pg(z)[1], zf)
    potgrad_ms = loop_time_z(pg, zf, 64) * 1e3

    t0 = time.time()
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
        num_warmup=100, num_samples=100, max_tree_depth=10, segment_size=50)
    total_s = time.time() - t0
    seg_wall = np.asarray(stats["segment_wall_s"])
    seg_leap = np.asarray(stats["segment_leapfrogs"], np.float64)
    warm_ms = 1e3 * seg_wall[1:].sum() / max(seg_leap[1:].sum(), 1)
    record(probe=tag, rank=rank, hlo_ops_potgrad=ops, potgrad_ms=potgrad_ms,
           nuts_total_s=total_s,
           warm_ms_per_leapfrog=float(warm_ms),
           leapfrogs=float(seg_leap.sum()),
           accept=float(np.asarray(stats["accept_prob"]).mean()),
           seg_wall=[round(float(s), 2) for s in seg_wall],
           projected_1000x1000_s=float(warm_ms / 1e3 * seg_leap.sum() * 10))


def mtgp_floor():
    """Decompose small-n NUTS wall-clock into per-TRANSITION fixed cost and
    per-LEAPFROG cost: two same-process runs with different depth caps give
    wall = T*c_trans + L*c_leap with the same T and very different L.
    Motivated by the mtgp bench: cutting leapfrogs 6.1x (target_accept 0.7)
    left wall-clock unchanged (149.5 -> 178/214 s across tunnel variance)."""
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented

    mtgp, X, y = _mtgp_setup(rank=1)
    info = initialize_model(mtgp.model, jax.random.PRNGKey(0), (X, y))

    T = 200  # 100 warmup + 100 samples
    out = {"probe": "mtgp_floor", "transitions": T}
    meas = {}
    for depth in (2, 10):
        t0 = time.time()
        zs, stats, _ = run_nuts_segmented(
            info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
            num_warmup=100, num_samples=100, max_tree_depth=depth,
            target_accept_prob=0.7, segment_size=50)
        total_s = time.time() - t0
        seg_wall = np.asarray(stats["segment_wall_s"])
        seg_leap = np.asarray(stats["segment_leapfrogs"], np.float64)
        # warm segments only (segment 1 carries the compile)
        warm_wall = float(seg_wall[1:].sum())
        warm_leap = float(seg_leap[1:].sum())
        warm_T = T - 50
        meas[depth] = (warm_wall, warm_leap, warm_T)
        out[f"d{depth}_total_s"] = total_s
        out[f"d{depth}_warm_wall_s"] = warm_wall
        out[f"d{depth}_warm_leapfrogs"] = warm_leap
        out[f"d{depth}_seg_wall"] = [round(float(s), 2) for s in seg_wall]
    (w2, l2, t2), (w10, l10, t10) = meas[2], meas[10]
    # same warm transition count: subtract to isolate the leapfrog term
    c_leap = (w10 - w2) / max(l10 - l2, 1.0)
    c_trans = (w2 - l2 * c_leap) / t2
    out["ms_per_leapfrog"] = c_leap * 1e3
    out["ms_per_transition_fixed"] = c_trans * 1e3
    record(**out)


def mtgp_setup_cost():
    """Timestamp the pre-segment phases of a small-n fit: the mtgp bench
    measured 7.8 s IN segments and ~86 s outside them (seg telemetry)."""
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented
    from gpax_tpu.infer.hmc_util import find_reasonable_step_size

    mtgp, X, y = _mtgp_setup(rank=1)
    out = {"probe": "mtgp_setup_cost"}

    t0 = time.time()
    info = initialize_model(mtgp.model, jax.random.PRNGKey(0), (X, y))
    out["initialize_model_s"] = time.time() - t0

    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))

    t0 = time.time()
    u0, g0 = jax.jit(pg)(zf)
    jax.block_until_ready(u0)
    out["potgrad_jit_s"] = time.time() - t0

    inv_mass = jnp.ones((zf.shape[0],), zf.dtype)
    t0 = time.time()
    eps0 = jax.jit(lambda k: find_reasonable_step_size(pg, zf, inv_mass, k, 1.0))(
        jax.random.PRNGKey(1))
    jax.block_until_ready(eps0)
    out["find_eps_jit_s"] = time.time() - t0

    t0 = time.time()
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
        num_warmup=100, num_samples=100, max_tree_depth=10,
        target_accept_prob=0.7, segment_size=50)
    out["run_100_100_s"] = time.time() - t0
    out["seg_wall"] = [round(float(s), 2)
                       for s in np.asarray(stats["segment_wall_s"])]

    # the model-level path (what the bench pays), second time in-process
    t0 = time.time()
    mtgp.fit(jax.random.PRNGKey(3), X, y, num_warmup=100, num_samples=100,
             target_accept_prob=0.7, segment_size=50,
             print_summary=False, progress_bar=False)
    out["model_fit_100_100_s"] = time.time() - t0
    record(**out)


def exact8k_ab():
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented

    n = 8192
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))

    bare_ms = loop_time_z(pg, zf, 4) * 1e3

    t0 = time.time()
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
        num_warmup=10, num_samples=10, max_tree_depth=7, segment_size=2)
    total_s = time.time() - t0
    seg_wall = np.asarray(stats["segment_wall_s"])
    seg_leap = np.asarray(stats["segment_leapfrogs"], np.float64)
    warm_ms = 1e3 * seg_wall[1:].sum() / max(seg_leap[1:].sum(), 1)
    record(probe="exact8k_ab", bare_potgrad_ms=bare_ms,
           in_nuts_warm_ms_per_leapfrog=float(warm_ms),
           ratio=float(warm_ms / bare_ms),
           leapfrogs=float(seg_leap.sum()),
           accept=float(np.asarray(stats["accept_prob"]).mean()),
           nuts_total_s=total_s,
           seg_wall=[round(float(s), 2) for s in seg_wall],
           seg_leap=[int(v) for v in seg_leap])


def exact16k():
    """Capability probe at n=16384 (2x the north star): bare potential+grad
    cost and a small bounded NUTS run.  depth 6 / segment 1 keeps the
    worst-case device call at 64 leapfrogs x ~0.5 s ~= 32 s, inside the
    duration-fault line (N8192_NOTE.md)."""
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts_segmented

    n = 16384
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))

    bare_ms = loop_time_z(pg, zf, 2) * 1e3
    record(probe="exact16k_potgrad", bare_potgrad_ms=bare_ms)

    t0 = time.time()
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(2),
        num_warmup=10, num_samples=10, max_tree_depth=6, segment_size=1)
    total_s = time.time() - t0
    seg_wall = np.asarray(stats["segment_wall_s"])
    seg_leap = np.asarray(stats["segment_leapfrogs"], np.float64)
    warm_ms = 1e3 * seg_wall[1:].sum() / max(seg_leap[1:].sum(), 1)
    record(probe="exact16k_nuts", bare_potgrad_ms=bare_ms,
           in_nuts_warm_ms_per_leapfrog=float(warm_ms),
           ratio=float(warm_ms / bare_ms),
           leapfrogs=float(seg_leap.sum()),
           accept=float(np.asarray(stats["accept_prob"]).mean()),
           nuts_total_s=total_s,
           seg_wall=[round(float(s), 2) for s in seg_wall],
           seg_leap=[int(v) for v in seg_leap])


def mvn_ablate():
    from gpax_tpu.ops.linalg import (
        chol_tri_factors, mvn_log_prob_centered, _mvn_lp_fwd)
    from gpax_tpu.ops.chol import blocked_trtri

    n = 8192
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
    diff = jnp.asarray(rng.normal(size=n), jnp.float32)
    reps = 4

    def loop_time(fn, X, reps=reps):
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

    out = {"probe": "mvn_ablate", "n": n}
    out["fwd_ms"] = loop_time(lambda K: mvn_log_prob_centered(K, diff), K) * 1e3
    out["factors_ms"] = loop_time(lambda K: chol_tri_factors(K)[1], K) * 1e3
    out["chol_ms"] = loop_time(jnp.linalg.cholesky, K, reps) * 1e3
    L = jnp.linalg.cholesky(K)
    out["trtri_ms"] = loop_time(blocked_trtri, L) * 1e3

    def vjp_full(K):
        v, gr = jax.value_and_grad(lambda K: mvn_log_prob_centered(K, diff))(K)
        return v + gr[0, 0]
    out["vjp_full_ms"] = loop_time(vjp_full, K) * 1e3

    # backward alone on fixed residuals: beta, WtW, outer, dK assembly
    W = blocked_trtri(L)
    alpha = W @ diff

    def bwd_only(W):
        beta = jnp.einsum("ji,j->i", W, alpha)
        Kinv = jnp.einsum("ki,kj->ij", W, W)
        bb = jnp.einsum("i,j->ij", beta, beta)
        return (0.5 * (bb - Kinv)).sum()
    out["bwd_only_ms"] = loop_time(bwd_only, W) * 1e3

    def bwd_dot_general(W):
        beta = jax.lax.dot_general(W, alpha, (((0,), (0,)), ((), ())),
                                   precision=HI)
        Kinv = jax.lax.dot_general(W, W, (((0,), (0,)), ((), ())),
                                   precision=HI)
        return (0.5 * (beta[:, None] * beta[None, :] - Kinv)).sum()
    out["bwd_dot_general_hi_ms"] = loop_time(bwd_dot_general, W) * 1e3

    def bwd_default(W):
        Kinv = jax.lax.dot_general(W, W, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.DEFAULT)
        beta = jax.lax.dot_general(W, alpha, (((0,), (0,)), ((), ())),
                                   precision=jax.lax.Precision.DEFAULT)
        return (0.5 * (beta[:, None] * beta[None, :] - Kinv)).sum()
    out["bwd_default_ms"] = loop_time(bwd_default, W) * 1e3

    # fwd+bwd but WITHOUT the cond escalation: plain chol + trtri + closed bwd
    def vjp_nocond(K):
        L = jnp.linalg.cholesky(K)
        W = blocked_trtri(L)
        a = W @ diff
        lp = -0.5 * (a * a).sum() - jnp.log(jnp.abs(jnp.diagonal(L))).sum()
        beta = jax.lax.dot_general(W, a, (((0,), (0,)), ((), ())), precision=HI)
        Kinv = jax.lax.dot_general(W, W, (((0,), (0,)), ((), ())), precision=HI)
        dK = 0.5 * (beta[:, None] * beta[None, :] - Kinv)
        return lp + dK[0, 0]
    out["manual_fwd_bwd_ms"] = loop_time(vjp_nocond, K) * 1e3
    record(**out)


def fused_ab():
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model

    n = 8192
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y

    out = {"probe": "fused_ab", "n": n}
    for mode, label in (("always", "fused"), ("never", "composed")):
        gpax_tpu.set_config(use_fused_likelihood=mode)
        info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
        zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
        pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))
        out[f"potgrad_{label}_ms"] = loop_time_z(pg, zf, 4) * 1e3
        ops = hlo_op_count(lambda z: pg(z)[1], zf)
        out[f"hlo_ops_{label}"] = ops
    gpax_tpu.set_config(use_fused_likelihood="auto")
    record(**out)


def bwd_ablate():
    """Locate the non-matmul cost inside the MVN VJP backward at n=8192."""
    from gpax_tpu.ops.linalg import wtw_compensated, _mvn_lp_bwd
    from gpax_tpu.ops.chol import blocked_trtri

    n = 8192
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
    diff = jnp.asarray(rng.normal(size=n), jnp.float32)
    L = jnp.linalg.cholesky(K)
    W = blocked_trtri(L)
    alpha = W @ diff
    reps = 8

    def loop_time(fn, X):
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

    out = {"probe": "bwd_ablate", "n": n}
    g = jnp.float32(1.0)
    out["bwd_exact_ms"] = loop_time(
        lambda W: _mvn_lp_bwd((W, alpha, diff.shape), g)[0], W) * 1e3
    out["wtw_comp_ms"] = loop_time(wtw_compensated, W) * 1e3
    out["wtw_matmul_hi_ms"] = loop_time(
        lambda W: jnp.matmul(W.T, W, precision=HI), W) * 1e3
    out["wtw_dotgen_hi_ms"] = loop_time(
        lambda W: jax.lax.dot_general(W, W, (((0,), (0,)), ((), ())),
                                      precision=HI), W) * 1e3

    def assembly(W):
        Wm = jnp.where(jnp.isfinite(W), W, 0.0)
        beta = jnp.einsum("ji,j->i", Wm, alpha)
        bb = jnp.einsum("i,j->ij", beta, beta)
        return 0.5 * (bb - Wm)  # Wm stands in for Kinv: same-shape traffic
    out["assembly_no_matmul_ms"] = loop_time(assembly, W) * 1e3

    def beta_only(W):
        return jnp.einsum("ji,j->i", W, alpha)
    out["beta_einsum_ms"] = loop_time(beta_only, W) * 1e3
    record(**out)


def bwd_variants():
    """Op-diet candidates for the MVN VJP backward at n=8192, measured with
    the ADDITIVE accumulating-carry harness (CLAUDE.md): bwd_ablate's
    multiplicative perturbation X*(1+1e-9 i) is foldable for bilinear ops —
    (cX)т(cX) = c² XтX lets XLA hoist the matmul out of the loop, which is
    why its wtw_matmul_hi "measured" 3.6 ms (6 bf16 passes of 8192³ cannot
    run under ~60 ms)."""
    from gpax_tpu.ops.linalg import wtw_compensated, _mvn_lp_bwd
    from gpax_tpu.ops.chol import blocked_trtri

    n = 8192
    rng = np.random.default_rng(0)
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))
    diff = jnp.asarray(rng.normal(size=n), jnp.float32)
    L = jnp.linalg.cholesky(K)
    W = blocked_trtri(L)
    alpha = W @ diff
    reps = 8
    g = jnp.float32(1.0)

    def loop_time(fn, X):
        # Ghost-proof harness: ADDITIVE accumulating perturbation (defeats
        # hoisting — CLAUDE.md) AND a full-output reduction into the carry
        # (defeats slice-pruning: carrying ravel(out)[0] lets XLA prune the
        # whole matmul to one output element — the r03 bwd_variants first run
        # "measured" 0.017 ms for an 8192^3 WtW).
        @jax.jit
        def looped(X):
            def body(i, acc):
                out = fn(X + acc * 1e-20)
                return acc + jnp.ravel(out).sum() * 1e-20 + 1e-24
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        r = looped(X)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = looped(X)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    def tdot(a, b):
        return jnp.matmul(jnp.swapaxes(a, -1, -2), b,
                          preferred_element_type=jnp.float32)

    def wtw_2cross(W):
        hi = W.astype(jnp.bfloat16)
        lo = (W - hi.astype(W.dtype)).astype(jnp.bfloat16)
        # symmetric-consumer equivalence: <2 cross, S> == <cross + crossT, S>
        # for symmetric S (every dK consumer contracts against a symmetric
        # dK/dtheta) — drops the n² transpose pass
        return tdot(hi, hi) + 2.0 * tdot(hi, lo)

    def bwd_current(W):
        return _mvn_lp_bwd((W, alpha, diff.shape), g)[0]

    def bwd_scalar_mask(W):
        Wb, ab = jax.lax.optimization_barrier((W, alpha))
        beta = jnp.einsum("ji,j->i", Wb, ab)
        Kinv = wtw_compensated(Wb)
        bb = jnp.einsum("i,j->ij", beta, beta)
        dK = 0.5 * g * (bb - Kinv)
        ok = jnp.isfinite(jnp.diagonal(Wb)).all()
        return jnp.where(ok, dK, 0.0)

    def bwd_2cross_scalar_mask(W):
        Wb, ab = jax.lax.optimization_barrier((W, alpha))
        beta = jnp.einsum("ji,j->i", Wb, ab)
        Kinv = wtw_2cross(Wb)
        bb = jnp.einsum("i,j->ij", beta, beta)
        dK = 0.5 * g * (bb - Kinv)
        ok = jnp.isfinite(jnp.diagonal(Wb)).all()
        return jnp.where(ok, dK, 0.0)

    out = {"probe": "bwd_variants", "n": n}
    out["wtw_comp_ms"] = loop_time(wtw_compensated, W) * 1e3
    out["wtw_2cross_ms"] = loop_time(wtw_2cross, W) * 1e3
    out["wtw_matmul_hi_ms"] = loop_time(
        lambda X: jnp.matmul(X.T, X, precision=HI), W) * 1e3
    out["wtw_matmul_default_ms"] = loop_time(
        lambda X: jnp.matmul(X.T, X), W) * 1e3
    out["bwd_current_ms"] = loop_time(bwd_current, W) * 1e3
    out["bwd_scalar_mask_ms"] = loop_time(bwd_scalar_mask, W) * 1e3
    out["bwd_2cross_scalar_mask_ms"] = loop_time(bwd_2cross_scalar_mask, W) * 1e3
    # the WIRED dispatch: _mvn_lp_bwd under Config.mvn_dk_gauge (config is
    # read at trace time; fresh lambda => fresh trace)
    from gpax_tpu import set_config
    set_config(mvn_dk_gauge="symmetric_equivalent")
    out["bwd_gauge_ms"] = loop_time(
        lambda W: _mvn_lp_bwd((W, alpha, diff.shape), g)[0], W) * 1e3
    set_config(mvn_dk_gauge="exact")
    # parity of the 2cross trick under a symmetric consumer
    dK_a = _mvn_lp_bwd((W, alpha, diff.shape), g)[0]
    dK_b = bwd_2cross_scalar_mask(W)
    S = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32))
    S = S + S.T
    err = float(jnp.abs(jnp.vdot(dK_a, S) - jnp.vdot(dK_b, S))
                / jnp.abs(jnp.vdot(dK_a, S)))
    out["sym_contract_rel_err"] = err
    record(**out)


def fused_ablate():
    """Break the fused-density op into fwd / bwd at n=8192: the full fused
    potgrad (160 ms) far exceeds its parts (~60 ms) — find the hidden cost."""
    from gpax_tpu.ops import fused_density as fd

    n = 8192
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    diff = jnp.asarray(rng.normal(size=n), jnp.float32)
    kl = jnp.ones(1, jnp.float32)
    ks = jnp.float32(1.2)
    ne = jnp.float32(0.1)
    reps = 4

    def loop_time(fn, A):
        @jax.jit
        def looped(A):
            def body(i, acc):
                out = fn(A * (1.0 + 1e-9 * jnp.float32(i)))
                return acc + jnp.ravel(out)[0]
            return jax.lax.fori_loop(0, reps, body, jnp.float32(0.0))
        r = looped(A)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = looped(A)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / reps

    # DCE-proof measurements only: the forward returns a scalar that depends
    # on everything; the vjp's k_length cotangent depends on the full dXs
    # chain.  Big arrays stay ARGUMENTS (a jitted closure over n² constants
    # overflows the remote-compile request: HTTP 413).
    out = {"probe": "fused_ablate", "n": n}
    out["fwd_ms"] = loop_time(
        lambda X: fd.gp_mvn_log_prob(X, kl, ks, ne, diff, "rbf"), X) * 1e3
    out["vjp_klength_ms"] = loop_time(
        lambda X: jax.value_and_grad(
            lambda kl_: fd.gp_mvn_log_prob(X, kl_, ks, ne, diff, "rbf"))(
            kl)[1], X) * 1e3

    def vjp_all(X):
        v, grads = jax.value_and_grad(
            lambda a: fd.gp_mvn_log_prob(X, a[0], a[1], a[2], diff, "rbf")
        )(jnp.asarray([1.0, 1.2, 0.1], jnp.float32))
        return v + grads.sum()
    out["vjp_all_ms"] = loop_time(vjp_all, X) * 1e3
    record(**out)


def fused_ab_n(n):
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y

    out = {"probe": "fused_ab", "n": n}
    reps = max(4, 32768 // n)
    for mode, label in (("always", "fused"), ("never", "composed")):
        gpax_tpu.set_config(use_fused_likelihood=mode)
        info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
        zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
        pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))
        out[f"potgrad_{label}_ms"] = loop_time_z(pg, zf, reps) * 1e3
    gpax_tpu.set_config(use_fused_likelihood="auto")
    record(**out)


def composed_bwd_ab(n=8192):
    """Same-process A/B of the three backward-WᵀW modes at the full-potential
    level (the only DCE-proof measurement on this runtime)."""
    import gpax_tpu
    from gpax_tpu.ppl import initialize_model

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    gpax_tpu.set_config(use_fused_likelihood="never")
    out = {"probe": "composed_bwd_ab", "n": n}
    try:
        info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
        zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
        for mode in ("compensated", "highest", "default"):
            gpax_tpu.set_config(wtw_precision=mode)
            pg = jax.value_and_grad(lambda z: info.potential_fn(unravel(z)))
            out[f"potgrad_{mode}_ms"] = loop_time_z(pg, zf, 4) * 1e3
    finally:
        gpax_tpu.set_config(use_fused_likelihood="auto",
                            wtw_precision="compensated")
    record(**out)


def fused_ab_4096():
    fused_ab_n(4096)


def fused_ab_2048():
    fused_ab_n(2048)


def mtgp_prof_rank1():
    """Reference-default rank (= num_tasks − 1): removes the W-rotation flat
    direction that drove max-depth trees in the rank-2 config."""
    mtgp_prof(rank=1, tag="mtgp_prof_rank1")


if __name__ == "__main__":
    globals()[sys.argv[1]]()
