#!/bin/bash
# Round-4 TPU validation chain: ONE process at a time (two TPU processes
# wedge the chip — CLAUDE.md).  Step 1 is a cheap fused-program sanity fit;
# step 2 is the full recalibrated bench end-to-end with the default hostile
# budget.  Run from /root/repo:  nohup bash scripts/tpu_r04_validate.sh &
set -u
cd /root/repo

echo "=== step 1: fused-program TPU sanity (n=1024) $(date -u +%H:%M:%S) ==="
timeout 900 python - <<'EOF'
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache_tpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax.numpy as jnp, numpy as np
import gpax_tpu
print("backend:", jax.default_backend(), flush=True)

rng = np.random.default_rng(0)
n = 1024
X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
gp = gpax_tpu.ExactGP(1, "RBF")
t0 = time.time()
calls = []
gp.fit(jax.random.PRNGKey(0), X, y, num_warmup=40, num_samples=40,
       segment_size=20, max_tree_depth=6, print_summary=False,
       progress_bar=False, segment_callback=lambda d: calls.append(d))
print("fit_s", round(time.time() - t0, 1),
      "timing", {k: round(v, 1) for k, v in gp.mcmc.timing.items()},
      "segments", len(calls), flush=True)
st = gp.mcmc.get_extra_fields()
print("accept", float(np.asarray(st["accept_prob"]).mean()),
      "seg_wall", [round(float(s), 2) for s in np.asarray(st["segment_wall_s"])],
      flush=True)
mean, _ = gp.predict_in_batches(jax.random.PRNGKey(1),
                                jnp.linspace(-2, 2, 512)[:, None],
                                batch_size=512, noiseless=True)
rmse = float(np.sqrt(np.mean((np.asarray(mean) - np.sin(2*np.linspace(-2,2,512)))**2)))
print("rmse", rmse, flush=True)
assert rmse < 0.1
print("SANITY OK", flush=True)
EOF
rc=$?
echo "=== step 1 rc=$rc $(date -u +%H:%M:%S) ==="
if [ $rc -ne 0 ]; then echo "sanity failed; stopping chain"; exit $rc; fi
sleep 30

echo "=== step 2: full bench.py (default hostile budget) $(date -u +%H:%M:%S) ==="
timeout 2200 python bench.py
rc=$?
echo "=== step 2 rc=$rc $(date -u +%H:%M:%S) ==="
exit $rc
