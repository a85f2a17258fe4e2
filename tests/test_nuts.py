"""NUTS correctness: statistical parity on analytically known posteriors."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu.distributions as dist
from gpax_tpu import ppl
from gpax_tpu.infer import MCMC, NUTS, gelman_rubin
from gpax_tpu.infer.nuts import run_nuts


def test_standard_normal_posterior():
    """Sampling from N(0, I) in 3D: mean ~ 0, var ~ 1."""

    def model():
        ppl.sample("x", dist.Normal(jnp.zeros(3), jnp.ones(3)))

    mcmc = MCMC(NUTS(model), num_warmup=500, num_samples=1500)
    mcmc.run(jax.random.PRNGKey(0))
    x = np.asarray(mcmc.get_samples()["x"])
    assert x.shape == (1500, 3)
    np.testing.assert_allclose(x.mean(0), np.zeros(3), atol=0.15)
    np.testing.assert_allclose(x.std(0), np.ones(3), atol=0.15)


def test_correlated_gaussian():
    """2D Gaussian with strong correlation — tests mass adaptation + u-turns."""
    cov = jnp.asarray([[1.0, 0.9], [0.9, 1.0]])

    def model():
        ppl.sample("x", dist.MultivariateNormal(jnp.zeros(2), covariance_matrix=cov))

    mcmc = MCMC(NUTS(model), num_warmup=800, num_samples=2000)
    mcmc.run(jax.random.PRNGKey(1))
    x = np.asarray(mcmc.get_samples()["x"])
    emp_cov = np.cov(x.T)
    np.testing.assert_allclose(emp_cov, np.asarray(cov), atol=0.12)


def test_conjugate_normal_mean():
    """Known posterior: y ~ N(mu, 1), mu ~ N(0, 10) => analytic Gaussian posterior."""
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.normal(2.0, 1.0, size=50))

    def model(y):
        mu = ppl.sample("mu", dist.Normal(0.0, jnp.sqrt(10.0)))
        ppl.sample("y", dist.Normal(mu, 1.0), obs=y)

    n = 50
    post_var = 1.0 / (1.0 / 10.0 + n)
    post_mean = post_var * float(jnp.sum(y))

    mcmc = MCMC(NUTS(model), num_warmup=500, num_samples=2000)
    mcmc.run(jax.random.PRNGKey(2), y)
    mu = np.asarray(mcmc.get_samples()["mu"])
    assert abs(mu.mean() - post_mean) < 4 * np.sqrt(post_var)  # within MC error
    np.testing.assert_allclose(mu.std(), np.sqrt(post_var), rtol=0.2)


def test_positive_support_transform():
    """LogNormal latent: posterior samples must be positive and match prior when
    unconditioned (prior ~ LogNormal(0,1))."""

    def model():
        ppl.sample("s", dist.LogNormal(0.0, 1.0))

    mcmc = MCMC(NUTS(model), num_warmup=500, num_samples=3000)
    mcmc.run(jax.random.PRNGKey(3))
    s = np.asarray(mcmc.get_samples()["s"])
    assert (s > 0).all()
    # log s ~ N(0,1)
    np.testing.assert_allclose(np.log(s).mean(), 0.0, atol=0.12)
    np.testing.assert_allclose(np.log(s).std(), 1.0, atol=0.12)


def test_multichain_vectorized_rhat():
    def model():
        ppl.sample("x", dist.Normal(0.0, 1.0))

    mcmc = MCMC(NUTS(model), num_warmup=300, num_samples=600, num_chains=2,
                chain_method="vectorized")
    mcmc.run(jax.random.PRNGKey(4))
    grouped = mcmc.get_samples(group_by_chain=True)
    assert grouped["x"].shape == (2, 600)
    rhat = gelman_rubin(grouped["x"])
    assert rhat < 1.05
    flat = mcmc.get_samples()
    assert flat["x"].shape == (1200,)


def test_parallel_chains_on_mesh():
    """chain_method='parallel' shards chains over the 8 virtual CPU devices."""

    def model():
        ppl.sample("x", dist.Normal(0.0, 1.0))

    mcmc = MCMC(NUTS(model), num_warmup=200, num_samples=300, num_chains=4,
                chain_method="parallel")
    mcmc.run(jax.random.PRNGKey(5))
    assert mcmc.get_samples(group_by_chain=True)["x"].shape == (4, 300)


def test_deterministic_sites_collected():
    def model():
        x = ppl.sample("x", dist.Normal(0.0, 1.0))
        ppl.deterministic("x2", x * 2.0)

    mcmc = MCMC(NUTS(model), num_warmup=200, num_samples=300)
    mcmc.run(jax.random.PRNGKey(6))
    s = mcmc.get_samples()
    np.testing.assert_allclose(np.asarray(s["x2"]), 2 * np.asarray(s["x"]), rtol=1e-6)


def test_extra_fields_shapes():
    def model():
        ppl.sample("x", dist.Normal(0.0, 1.0))

    mcmc = MCMC(NUTS(model), num_warmup=100, num_samples=200)
    mcmc.run(jax.random.PRNGKey(7))
    ef = mcmc.get_extra_fields()
    assert ef["accept_prob"].shape == (200,)
    assert ef["num_steps"].dtype == jnp.int32
    assert not np.asarray(ef["diverging"]).any()


def test_segmented_matches_monolithic():
    """Segmented execution carries adaptation state exactly: same keys -> same draws."""
    import gpax_tpu.distributions as dist2
    from gpax_tpu import ppl as ppl2
    from gpax_tpu.ppl import initialize_model
    from gpax_tpu.infer.nuts import run_nuts, run_nuts_segmented

    def model():
        ppl2.sample("x", dist2.Normal(jnp.zeros(2), jnp.ones(2)))

    info = initialize_model(model, jax.random.PRNGKey(0))
    key = jax.random.PRNGKey(5)
    zs_mono, stats_mono = jax.jit(
        lambda k: run_nuts(info.potential_fn, info.init_unconstrained, k, 100, 200)[:2]
    )(key)
    zs_seg, stats_seg, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, key, 100, 200, segment_size=37
    )
    # f32 fusion differences between the two compiled programs diverge chaotically,
    # so compare distributions, not trajectories
    assert zs_seg.shape == zs_mono.shape
    np.testing.assert_allclose(np.asarray(zs_seg).mean(0), np.asarray(zs_mono).mean(0), atol=0.2)
    np.testing.assert_allclose(np.asarray(zs_seg).std(0), np.asarray(zs_mono).std(0), atol=0.2)
    assert np.asarray(stats_seg["accept_prob"]).mean() > 0.6


def test_segmented_through_model_fit():
    from gpax_tpu import ExactGP
    from gpax_tpu.utils import get_keys

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-1, 1, 10), jnp.float32)
    y = jnp.asarray(np.sin(3 * np.asarray(X)), jnp.float32)
    m = ExactGP(1, "RBF")
    m.fit(get_keys()[0], X, y, num_warmup=60, num_samples=60,
          print_summary=False, progress_bar=False, segment_size=25)
    s = m.get_samples()
    assert s["noise"].shape == (60,)
    assert np.isfinite(np.asarray(s["noise"])).all()


def test_sequential_chains():
    def model():
        ppl.sample("x", dist.Normal(0.0, 1.0))

    mcmc = MCMC(NUTS(model), num_warmup=150, num_samples=200, num_chains=2,
                chain_method="sequential")
    mcmc.run(jax.random.PRNGKey(8))
    g = mcmc.get_samples(group_by_chain=True)
    assert g["x"].shape == (2, 200)
    # chains must differ (different keys / jittered inits)
    assert not np.allclose(np.asarray(g["x"][0]), np.asarray(g["x"][1]))


def test_predictive_return_sites():
    def model(X, y=None):
        w = ppl.sample("w", dist.Normal(0.0, 1.0))
        mu = ppl.deterministic("mu", w * X)
        ppl.sample("y", dist.Normal(mu, 0.1), obs=y)

    X = jnp.linspace(0, 1, 5)
    pred = ppl.Predictive(model, num_samples=7, return_sites=["y"])
    out = pred(jax.random.PRNGKey(0), X)
    assert set(out) == {"y"}
    assert out["y"].shape == (7, 5)


def test_vectorized_chains_segmented():
    """Lockstep-vmapped chains in bounded segments (run_nuts_segmented_chains)
    match the analytic posterior and produce per-chain outputs."""
    import gpax_tpu
    import jax
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.uniform(-2, 2, (40, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=40), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.fit(jax.random.PRNGKey(0), X, y, num_warmup=80, num_samples=80,
           num_chains=2, chain_method="vectorized", segment_size=40,
           print_summary=False, progress_bar=False)
    by_chain = gp.mcmc.get_samples(group_by_chain=True)
    assert by_chain["k_length"].shape[:2] == (2, 80)
    flat = gp.get_samples()
    assert np.isfinite(np.asarray(flat["k_length"])).all()
    # both chains land in the same posterior region
    m0 = float(np.mean(np.asarray(by_chain["noise"][0])))
    m1 = float(np.mean(np.asarray(by_chain["noise"][1])))
    assert abs(m0 - m1) < 0.2, (m0, m1)


def test_dense_mass_correlated_gaussian():
    """A full-covariance metric unit-scales a strongly correlated Gaussian:
    posterior recovery AND far fewer leapfrogs than the diagonal metric.
    Parity surface: numpyro's NUTS(dense_mass=True) as used by gpax callers."""
    rho = 0.99
    cov = jnp.asarray([[1.0, rho], [rho, 1.0]])

    def model():
        ppl.sample("x", dist.MultivariateNormal(jnp.zeros(2), covariance_matrix=cov))

    leaps = {}
    for dense in (False, True):
        mcmc = MCMC(NUTS(model, dense_mass=dense), num_warmup=500, num_samples=1000)
        mcmc.run(jax.random.PRNGKey(3))
        ef = mcmc.get_extra_fields()
        leaps[dense] = float(np.asarray(ef["num_steps"]).sum())
        if dense:
            x = np.asarray(mcmc.get_samples()["x"])
            emp = np.cov(x.T)
            np.testing.assert_allclose(emp, np.asarray(cov), atol=0.15)
    # at rho=0.99 the diagonal metric needs much longer trajectories
    assert leaps[True] < 0.5 * leaps[False], leaps


def test_dense_mass_segmented_chains():
    """dense_mass through the lockstep-vmapped segmented chains path:
    (chains, dim, dim) inverse-mass carries work and match the posterior."""
    from gpax_tpu.infer.nuts import run_nuts_segmented_chains

    cov = jnp.asarray([[1.0, 0.9], [0.9, 1.0]])

    def model():
        ppl.sample("x", dist.MultivariateNormal(jnp.zeros(2), covariance_matrix=cov))

    from gpax_tpu.ppl.util import initialize_model
    info = initialize_model(model, jax.random.PRNGKey(0))
    z0s = jax.tree_util.tree_map(
        lambda v: jnp.broadcast_to(v, (2,) + jnp.shape(v)), info.init_unconstrained)
    zs, stats, _ = run_nuts_segmented_chains(
        info.potential_fn, z0s, jax.random.PRNGKey(4), num_chains=2,
        num_warmup=200, num_samples=400, segment_size=100, dense_mass=True)
    _, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)
    constrain = lambda z_flat: info.constrain_fn(unravel(z_flat))  # noqa: E731
    x = np.asarray(jax.vmap(jax.vmap(constrain))(zs)["x"]).reshape(-1, 2)
    np.testing.assert_allclose(np.cov(x.T), np.asarray(cov), atol=0.2)
    assert np.isfinite(x).all()


def test_collect_warmup_segmented():
    """collect_warmup=True returns warmup transitions too (the warmup-
    diagnosis surface: step-size traces and per-phase accept rates)."""
    from gpax_tpu.infer.nuts import run_nuts_segmented

    def model():
        ppl.sample("x", dist.Normal(jnp.zeros(2), 1.0))

    from gpax_tpu.ppl.util import initialize_model
    info = initialize_model(model, jax.random.PRNGKey(0))
    zs_all, stats_all, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(5),
        num_warmup=60, num_samples=40, segment_size=25, collect_warmup=True)
    assert zs_all.shape[0] == 100
    assert stats_all["accept_prob"].shape[0] == 100
    # live step size moves during warmup, frozen afterwards
    eps = np.asarray(stats_all["step_size"])
    assert np.unique(eps[:60]).size > 1
    assert np.unique(eps[60:]).size == 1
    zs, stats, _ = run_nuts_segmented(
        info.potential_fn, info.init_unconstrained, jax.random.PRNGKey(5),
        num_warmup=60, num_samples=40, segment_size=25)
    assert zs.shape[0] == 40
    # the sampling draws are identical with and without warmup collection
    np.testing.assert_allclose(np.asarray(zs_all[60:]), np.asarray(zs))
