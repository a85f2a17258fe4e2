"""Measure single-core CPU anchors for the bench configs whose vs_baseline
was null (vigp / visparsegp / vidkl / mtgp).

numpyro is not installed on this host, so the anchor is THIS framework's own
fit on the host CPU — the same convention as the ExactGP configs' 0.750
s/leapfrog anchor (bench.py docstring): the reference (gpax+numpyro, CPU)
pays at least the same linear-algebra cost per step plus its Python-driver
overhead, so speedups computed against these anchors are conservative.

Run:  JAX_PLATFORMS=cpu python scripts/cpu_anchor.py [config ...]
Emits one JSON line per config:
  {"anchor": name, "cold_s": ..., "warm_s": ..., "per_unit": ...}
where per_unit is seconds per SVI step (SVI configs) or seconds per leapfrog
(mtgp).  The WARM number is what bench.py should use (the reference user's
steady state; the TPU side keeps its compile included → conservative).
"""

import json
import os
import sys
import time

os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
# CLAUDE.md: the persistent compile cache miscompiles on XLA:CPU here — keep OFF

import jax.numpy as jnp
import numpy as np


def _timed(fn):
    """fn must end with a host fetch (np.asarray of a result) — JAX dispatch
    is async even on CPU, so an un-fetched fit leaks work past the timer
    (observed: visparsegp 'cold' 4.1 s vs 'warm' 20 s before the barriers)."""
    t0 = time.time()
    out = fn()
    return out, time.time() - t0


def anchor_vigp():
    """r05 shape: the reference notebook's actual workload — a 128x128
    sparse image (gpax_viGP.ipynb: X_full = 16384, num_steps=250,
    step_size=0.05), n_train ≈ 2458 at the 15% mask.  A full 250-step fit
    on one CPU core takes minutes, so the anchor measures a 50-step warm
    fit and scales per-step x 250 — SVI steps are identical computations,
    so per-step cost is constant (the same convention as the per-leapfrog
    ExactGP anchors)."""
    import gpax_tpu
    from gpax_tpu.utils import preprocess_sparse_image

    rng = np.random.default_rng(0)
    size = 128
    steps_measure, steps_full = 50, 250
    xx, yy = np.meshgrid(np.arange(size), np.arange(size))
    truth = np.sin(xx / 16.0) * np.cos(yy / 21.0) + 1.5
    mask = rng.uniform(size=truth.shape) < 0.15
    coords, values, _ = preprocess_sparse_image(np.where(mask, truth, 0.0))

    def run():
        model = gpax_tpu.viGP(input_dim=2, kernel="Matern")
        model.fit(jax.random.PRNGKey(0), jnp.asarray(coords), jnp.asarray(values),
                  num_steps=steps_measure, step_size=0.05,
                  print_summary=False, progress_bar=False)
        np.asarray(jax.tree_util.tree_leaves(model.get_samples())[0])
        return model

    _, cold = _timed(run)
    _, warm = _timed(run)
    per_step = warm / steps_measure
    return dict(cold_s=cold, warm_s=warm, per_unit=per_step,
                anchor_full_s=per_step * steps_full,
                unit=f"svi_step_n2458; anchor = per_unit x {steps_full}")


def anchor_visparsegp():
    import gpax_tpu

    rng = np.random.default_rng(0)
    n = 2000
    X = rng.uniform(0, 4, n)
    y = np.sin(3 * X) * np.exp(-0.3 * X) + 0.05 * rng.normal(size=n)

    def run():
        model = gpax_tpu.viSparseGP(input_dim=1, kernel="RBF")
        model.fit(jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32),
                  jnp.asarray(y, jnp.float32), inducing_points_ratio=0.05,
                  inducing_points_selection="uniform", num_steps=3000,
                  print_summary=False, progress_bar=False)
        np.asarray(jax.tree_util.tree_leaves(model.get_samples())[0])
        return model

    _, cold = _timed(run)
    _, warm = _timed(run)
    return dict(cold_s=cold, warm_s=warm, per_unit=warm / 3000.0, unit="svi_step")


def anchor_vidkl():
    import gpax_tpu

    # r05 shape: 8-model ensemble fit_predict on image-patch-scale inputs,
    # matching bench_vidkl_al (d=784, 2000-candidate pool, 256 measured —
    # the reference's recommended UQ workflow and its only multi-device
    # path, ref vidkl.py:358-365 + the plasmons notebook)
    rng = np.random.default_rng(0)
    n_pool, d = 2000, 784
    n_models = 8
    latent = rng.normal(size=(n_pool, 2))
    mix = rng.normal(size=(2, d)) / np.sqrt(2)
    X_pool = latent @ mix + 0.01 * rng.normal(size=(n_pool, d))
    y_pool = np.sin(latent[:, 0] * 2.0) + 0.3 * latent[:, 1]
    measured = rng.choice(n_pool, size=256, replace=False)
    Xm = jnp.asarray(X_pool[measured], jnp.float32)
    ym = jnp.asarray(y_pool[measured], jnp.float32)

    def run():
        dkl = gpax_tpu.viDKL(input_dim=d, z_dim=2, kernel="RBF")
        mean, _ = dkl.fit_predict(
            jax.random.PRNGKey(0), Xm, ym,
            jnp.asarray(X_pool, jnp.float32), num_steps=1000,
            n_models=n_models, ensemble_method="vectorized",
            print_summary=False, progress_bar=False)
        np.asarray(mean)
        return dkl

    _, cold = _timed(run)
    _, warm = _timed(run)
    return dict(cold_s=cold, warm_s=warm, per_unit=warm / 1000.0,
                unit="svi_step_plus_pool_predict_ens8")


def anchor_mtgp():
    """r05 shape: n=320+64 multi-fidelity campaign, SAME segmented runner
    path as bench_mtgp_bo (the old anchor's 4.82e-4 s/leapfrog came from the
    non-segmented CPU path, which is ~6x slower per leapfrog than the
    segmented op-diet path the bench actually exercises — measured
    2026-08-20: 396k leapfrogs in 29.2 s warm at n=48).  Per-leapfrog cost
    is n-bound, so a short 100+150 run anchors the full 1000+4000 config."""
    import gpax_tpu

    def f_hi(x):
        return np.sin(5 * x) * np.exp(-x)

    def f_lo(x):
        return 0.8 * f_hi(x) + 0.2 * np.cos(3 * x)

    rng = np.random.default_rng(0)
    n_lo, n_hi = 320, 64
    X_lo, X_hi = rng.uniform(0, 2, n_lo), rng.uniform(0, 2, n_hi)
    X = np.concatenate([np.column_stack([X_lo, np.zeros(n_lo)]),
                        np.column_stack([X_hi, np.ones(n_hi)])])
    y = np.concatenate([f_lo(X_lo), f_hi(X_hi)]) + 0.05 * rng.normal(size=n_lo + n_hi)

    def run():
        mtgp = gpax_tpu.MultiTaskGP(1, "Matern", num_latents=1, num_tasks=2)
        mtgp.fit(jax.random.PRNGKey(0), jnp.asarray(X, jnp.float32),
                 jnp.asarray(y, jnp.float32), num_warmup=50, num_samples=50,
                 segment_size=100, target_accept_prob=0.7,
                 print_summary=False, progress_bar=False)
        np.asarray(jax.tree_util.tree_leaves(mtgp.get_samples())[0])
        return mtgp

    mtgp, cold = _timed(run)
    stats = mtgp.mcmc.get_extra_fields()
    seg = np.asarray(stats.get("segment_leapfrogs", []), dtype=np.float64)
    leapfrogs = float(seg.sum()) if seg.size else float(
        np.asarray(stats["num_steps"]).sum())
    mtgp2, warm = _timed(run)
    seg2 = np.asarray(mtgp2.mcmc.get_extra_fields().get(
        "segment_leapfrogs", []), dtype=np.float64)
    leapfrogs2 = float(seg2.sum()) if seg2.size else leapfrogs
    return dict(cold_s=cold, warm_s=warm, leapfrogs=leapfrogs2,
                per_unit=warm / max(leapfrogs2, 1.0), unit="leapfrog_n384")


ANCHORS = {
    "vigp": anchor_vigp,
    "visparsegp": anchor_visparsegp,
    "vidkl": anchor_vidkl,
    "mtgp": anchor_mtgp,
}


if __name__ == "__main__":
    names = sys.argv[1:] or list(ANCHORS)
    for name in names:
        res = ANCHORS[name]()
        res = {k: (round(v, 4) if isinstance(v, float) else v)
               for k, v in res.items()}
        print(json.dumps({"anchor": name, **res}), flush=True)
