"""Round-4 regression tests: HMC-scoped WᵀW-precision override, deferred-init
fused fit programs, deadline truncation, and segment telemetry callbacks."""

import time

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu
from gpax_tpu import ppl
from gpax_tpu.config import get_config, set_config
from gpax_tpu.distributions import LogNormal, Normal
from gpax_tpu.models import ExactGP
from gpax_tpu.utils import get_keys


def _toy(n=12, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32)
    y = jnp.sin(3 * X[:, 0]) + 0.05 * jnp.asarray(rng.normal(size=n), jnp.float32)
    return X, y


def test_hmc_wtw_precision_scoped_to_fit():
    """Config.hmc_wtw_precision binds the sampler's trace and is restored
    after — other consumers (predict, SVI) trace under the base policy."""
    seen = []

    def model(X, y=None):
        seen.append(get_config().wtw_precision)
        s = ppl.sample("scale", LogNormal(0.0, 1.0))
        ppl.sample("y", Normal(jnp.zeros(X.shape[0]), s), obs=y)

    X, y = _toy()
    from gpax_tpu.infer import MCMC, NUTS

    try:
        set_config(hmc_wtw_precision="highest")
        assert get_config().wtw_precision == "compensated"
        mcmc = MCMC(NUTS(model), num_warmup=10, num_samples=10)
        mcmc.run(get_keys()[0], X, y)
        assert seen and all(v == "highest" for v in seen)
        # restored after the fit
        assert get_config().wtw_precision == "compensated"
    finally:
        set_config(hmc_wtw_precision=None, wtw_precision="compensated")


def test_hmc_wtw_default_mode_posterior_equivalent_cpu():
    """On CPU both 'default' and 'highest' matmul precisions are the same
    exact-f32 gemm, so those two HMC gradient modes must produce the SAME
    realization; the 'compensated' baseline (which splits into bf16 hi+lo
    even on CPU) diverges chaotically but must agree statistically.  (On TPU
    the bf16 mode only changes the PROPOSAL gradient: accept/multinomial
    weights use the exact potential, so the invariant distribution is exact
    by construction — the on-chip A/B checks acceptance, not correctness.)"""
    X, y = _toy(n=16, seed=3)
    stats = {}
    try:
        for mode in (None, "highest", "default"):
            set_config(hmc_wtw_precision=mode)
            gp = ExactGP(1, "RBF")
            gp.fit(get_keys()[0], X, y, num_warmup=100, num_samples=100,
                   print_summary=False, progress_bar=False)
            stats[mode] = float(np.mean(np.asarray(gp.get_samples()["noise"])))
    finally:
        set_config(hmc_wtw_precision=None)
    assert all(np.isfinite(v) for v in stats.values())
    # identical numerics on CPU → identical realization
    np.testing.assert_allclose(stats["default"], stats["highest"], rtol=1e-4)
    # vs the compensated baseline: statistically equivalent (true noise 0.05)
    np.testing.assert_allclose(stats["default"], stats[None], atol=0.05)


def test_segment_callback_telemetry():
    """segment_callback receives cumulative telemetry after every segment."""
    X, y = _toy()
    calls = []
    gp = ExactGP(1, "RBF")
    gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=20,
           segment_size=10, print_summary=False, progress_bar=False,
           segment_callback=calls.append)
    assert len(calls) == 4
    assert calls[-1]["steps_done"] == 40
    assert calls[-1]["segments_done"] == 4
    assert len(calls[-1]["segment_leapfrogs"]) == 4
    assert calls[0]["wall_s"] <= calls[-1]["wall_s"]


def test_deadline_truncates_mid_warmup_to_valid_posterior():
    """A deadline already in the past fires at the FIRST segment boundary:
    warmup freezes there (adaptation stops, plan flips to sampling) and one
    sampling segment is still taken — a valid, honestly-reported posterior."""
    X, y = _toy()
    gp = ExactGP(1, "RBF")
    gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=40,
           segment_size=10, print_summary=False, progress_bar=False,
           deadline=time.perf_counter() - 1.0)
    st = gp.mcmc.get_extra_fields()
    # warmup frozen at the first segment boundary (10 of the 20 planned)
    assert int(np.asarray(st["warmup_steps_run"]).ravel()[0]) == 10
    noise = np.asarray(gp.get_samples()["noise"])
    # exactly one post-freeze segment kept as draws
    assert noise.shape[0] == 10
    assert np.all(np.isfinite(noise))
    # posterior objects still work downstream
    mean, var = gp.predict(get_keys()[1], jnp.linspace(-1, 1, 7), noiseless=True)
    assert np.all(np.isfinite(np.asarray(mean)))


def test_far_deadline_runs_full_plan():
    """A far-future deadline leaves warmup and draw counts untouched."""
    X, y = _toy()
    gp = ExactGP(1, "RBF")
    gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=40,
           segment_size=10, print_summary=False, progress_bar=False,
           deadline=time.perf_counter() + 3600.0)
    st = gp.mcmc.get_extra_fields()
    assert int(np.asarray(st["warmup_steps_run"]).ravel()[0]) == 20
    assert np.asarray(gp.get_samples()["noise"]).shape[0] == 40


def test_warmup_depth_cap_bounds_early_trees():
    """warmup_depth_cap=(cap, k): the first k warmup transitions run trees of
    <= 2^cap - 1 leapfrogs; later transitions use the full depth; sampling
    draws stay finite and usable."""
    from gpax_tpu.infer.nuts import run_nuts_segmented
    from gpax_tpu.ppl import initialize_model

    X, y = _toy()
    gp = ExactGP(1, "RBF")
    info = initialize_model(gp.model, get_keys()[0], (X, y), defer_init=True)
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_fn, get_keys()[0],
        num_warmup=20, num_samples=25, segment_size=10, max_tree_depth=6,
        warmup_depth_cap=(2, 10), collect_warmup=True)
    ns = np.asarray(stats["num_steps"])
    assert ns[:10].max() <= 3          # capped head
    assert ns[10:].max() > 3           # full depth afterwards
    assert np.all(np.isfinite(np.asarray(zs)))
    # the public fit path accepts the option too
    gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=10,
           segment_size=10, max_tree_depth=6, warmup_depth_cap=(2, 10),
           print_summary=False, progress_bar=False)
    assert np.all(np.isfinite(np.asarray(gp.get_samples()["noise"])))


def test_deferred_init_matches_concrete_init():
    """initialize_model(defer_init=True).init_fn(key) reproduces the concrete
    init_unconstrained for the same key (same draws, same unconstrain)."""
    from gpax_tpu.ppl import initialize_model

    X, y = _toy()
    gp = ExactGP(1, "RBF")
    key = get_keys()[0]
    info_c = initialize_model(gp.model, key, (X, y))
    info_d = initialize_model(gp.model, key, (X, y), defer_init=True)
    assert info_d.init_unconstrained is None and info_d.init_fn is not None
    z_d = jax.jit(info_d.init_fn)(key)
    for name, v in info_c.init_unconstrained.items():
        np.testing.assert_allclose(np.asarray(z_d[name]), np.asarray(v),
                                   rtol=1e-6)
