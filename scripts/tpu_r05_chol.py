"""Round-5 on-chip Cholesky probes (VERDICT r04 item 2).

XLA's Cholesky forward is ~18.7 ms of the ~40 ms per-leapfrog floor at
n=8192.  The r03 Pallas panel attempt lost 4x (blocking DMA + serialized
tiles), so this round probes ALGORITHM changes: recursive blocked
factorization with XLA-chol leaves and MXU-matmul Schur updates/TRSMs —
if XLA's chol cost is superlinear in n, pushing half the spectrum into
matmuls wins.

    python scripts/tpu_r05_chol.py micro      # scaling + candidates, one process

All loop probes thread the output back into the next iteration's input
(X + 1e-12*f(X) accumulating carry) — loop-invariant perturbations get
hoisted and single-element carries get pruned/folded on this runtime
(CLAUDE.md harness rules, r02/r03 ghosts).

Appends JSON lines to PROFILE_r05.jsonl.
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

from gpax_tpu.ops.chol import blocked_trtri, chol_inv  # noqa: E402

OUT = pathlib.Path("/root/repo/PROFILE_r05.jsonl")
HI = jax.lax.Precision.HIGHEST


def record(**kv):
    kv = {k: (round(v, 4) if isinstance(v, float) else v) for k, v in kv.items()}
    print(json.dumps(kv), flush=True)
    with OUT.open("a") as fh:
        fh.write(json.dumps(kv) + "\n")


def host_fetch(x):
    # one-scalar host fetch: block_until_ready can acknowledge at enqueue
    # time under load on this runtime (CLAUDE.md)
    return float(np.asarray(jnp.ravel(x)[0]))


def loop_time(fn, X, reps=8):
    """Time fn in a fori_loop; the carry IS the input, nudged by the output
    each iteration (full-rank dependency: no hoisting, no pruning)."""
    @jax.jit
    def looped(X):
        def body(i, X):
            out = fn(X)
            return X + 1e-12 * out
        return jax.lax.fori_loop(0, reps, body, X)

    r = looped(X)
    host_fetch(r)
    t0 = time.perf_counter()
    r = looped(X)
    host_fetch(r)
    return (time.perf_counter() - t0) / reps


def spd(n, seed=0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)).astype(np.float32)
    return jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32))


# --------------------------------------------------------------- candidates

def _split(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(a.dtype)).astype(jnp.bfloat16)
    return hi, lo


def mm_comp(a, b):
    """Split-f32 compensated matmul: 3 one-pass MXU matmuls, ~1e-6 rel err
    (same scheme as ops.linalg.wtw_compensated, generalized to a@b)."""
    ah, al = _split(a)
    bh, bl = _split(b)

    def dot(x, y):
        return jnp.matmul(x, y, preferred_element_type=jnp.float32)

    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _assemble(B11, B21, B22):
    h, w = B11.shape[-2], B22.shape[-1]
    top = jnp.concatenate([B11, jnp.zeros((h, w), B11.dtype)], axis=-1)
    bot = jnp.concatenate([B21, B22], axis=-1)
    return jnp.concatenate([top, bot], axis=-2)


def hybrid_pair(K, levels, mm):
    """(L, W=L^-1) by recursive 2x2 blocking: XLA chol + blocked_trtri at the
    leaves, `mm` matmuls for TRSM / Schur / inverse off-diagonals."""
    if levels == 0:
        L = jnp.linalg.cholesky(K)
        return L, blocked_trtri(L)
    n = K.shape[-1]
    h = n // 2
    L11, W11 = hybrid_pair(K[:h, :h], levels - 1, mm)
    L21 = mm(K[h:, :h], W11.T)
    S = K[h:, h:] - mm(L21, L21.T)
    L22, W22 = hybrid_pair(S, levels - 1, mm)
    W21 = -mm(W22, mm(L21, W11))
    return _assemble(L11, L21, L22), _assemble(W11, W21, W22)


def hybrid_chol(K, levels, mm):
    """L only (no inverse): leaf TRSM via blocked_trtri of the leading factor."""
    if levels == 0:
        return jnp.linalg.cholesky(K)
    n = K.shape[-1]
    h = n // 2
    L11 = hybrid_chol(K[:h, :h], levels - 1, mm)
    W11 = blocked_trtri(L11)
    L21 = mm(K[h:, :h], W11.T)
    S = K[h:, h:] - mm(L21, L21.T)
    L22 = hybrid_chol(S, levels - 1, mm)
    return _assemble(L11, L21, L22)


def micro():
    out = {"probe": "chol_scaling"}
    # dispatch floor reference: one trivial elementwise op on an n=8192 matrix
    K8 = spd(8192)
    out["floor_elemwise_ms"] = loop_time(lambda X: X * 1.0000001, K8) * 1e3
    for n in (512, 1024, 2048, 4096, 8192):
        K = spd(n)
        out[f"xla_chol_{n}_ms"] = loop_time(jnp.linalg.cholesky, K) * 1e3
    for n in (2048, 4096, 8192):
        L = jnp.linalg.cholesky(spd(n))
        out[f"trtri_{n}_ms"] = loop_time(blocked_trtri, L) * 1e3
    # matmul anchors at half-size (the recursion's off-diagonal work)
    A = jnp.asarray(np.random.default_rng(1).normal(size=(4096, 4096)),
                    jnp.float32)
    out["mm4096_hi_ms"] = loop_time(
        lambda X: jnp.matmul(X, X.T, precision=HI), A) * 1e3
    out["mm4096_comp_ms"] = loop_time(lambda X: mm_comp(X, X.T), A) * 1e3
    out["mm4096_bf16_ms"] = loop_time(
        lambda X: jnp.matmul(X, X.T), A) * 1e3
    record(**out)

    # ---- candidates at 8192 and 4096 ----
    for n in (8192, 4096):
        K = spd(n)
        res = {"probe": "chol_candidates", "n": n}
        res["pair_baseline_ms"] = loop_time(
            lambda X: jnp.linalg.cholesky(X) + 0.0, K) * 1e3  # chol alone
        res["pair_xla_trtri_ms"] = loop_time(
            lambda X: blocked_trtri(jnp.linalg.cholesky(X)), K) * 1e3
        def pair_sum(X, lv, mm):
            L, W = hybrid_pair(X, lv, mm)
            return L + W  # both factors materialize (production needs both)

        for lv in (1, 2, 3):
            res[f"hyb_chol_l{lv}_comp_ms"] = loop_time(
                lambda X, lv=lv: hybrid_chol(X, lv, mm_comp), K) * 1e3
            res[f"hyb_pair_l{lv}_comp_ms"] = loop_time(
                lambda X, lv=lv: pair_sum(X, lv, mm_comp), K) * 1e3
        res["hyb_pair_l1_hi_ms"] = loop_time(
            lambda X: pair_sum(X, 1, lambda a, b: jnp.matmul(
                a, b, precision=HI)), K) * 1e3
        # existing all-Pallas recursion for the record (TILE=128 leaves)
        if n == 8192:
            res["pallas_chol_inv_ms"] = loop_time(
                lambda X: chol_inv(X)[1], K) * 1e3

        # numeric parity vs the XLA factor on the same f32 input
        L_ref = jnp.linalg.cholesky(K)
        W_ref = blocked_trtri(L_ref)
        for lv in (1, 2):
            L_h, W_h = hybrid_pair(K, lv, mm_comp)
            res[f"relerr_L_l{lv}"] = float(
                jnp.max(jnp.abs(L_h - L_ref)) / jnp.max(jnp.abs(L_ref)))
            res[f"relerr_W_l{lv}"] = float(
                jnp.max(jnp.abs(W_h - W_ref)) / jnp.max(jnp.abs(W_ref)))
            ld_ref = jnp.log(jnp.abs(jnp.diagonal(L_ref))).sum()
            ld_h = jnp.log(jnp.abs(jnp.diagonal(L_h))).sum()
            res[f"logdet_absdiff_l{lv}"] = float(jnp.abs(ld_h - ld_ref))
        record(**res)


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "micro"
    {"micro": micro}[cmd]()
