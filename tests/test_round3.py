"""Round-3 regression tests: program-cache eviction, scalar-posterior hypo
step, viDKL functional (init, apply) adapter, sparse-GP posterior numerics,
small-n custom-VJP MVN density, and segmented-run telemetry."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu
from gpax_tpu.models import ExactGP, viDKL, viSparseGP
from gpax_tpu.utils import get_keys


def _toy(n=12, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-1, 1, (n, 1)), jnp.float32)
    y = jnp.sin(3 * X[:, 0]) + 0.05 * jnp.asarray(rng.normal(size=n), jnp.float32)
    return X, y


def test_prog_cache_bounded_over_al_iterations():
    """10 fit→predict cycles must not grow the program cache or pin stale
    training arrays (VERDICT r02 weak #6 / ADVICE: unbounded _prog_cache)."""
    gp = ExactGP(1, "RBF")
    X_new = jnp.linspace(-1, 1, 17)
    sizes, retained = [], []
    for it in range(10):
        X, y = _toy(n=12, seed=it)
        gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=20,
               print_summary=False, progress_bar=False)
        gp.predict(get_keys()[1], X_new)
        cache = gp.__dict__.get("_prog_cache", {})
        sizes.append(len(cache))
        retained.append(
            len({id(a) for st, _ in cache.values() for a in st if a is not None})
        )
    # steady state: exactly the current program set, only the live arrays
    assert sizes[-1] == sizes[1], sizes
    assert max(sizes) <= ExactGP._prog_cache_max
    assert retained[-1] == retained[1], retained
    # every retained array is the CURRENT training data
    cache = gp.__dict__["_prog_cache"]
    for st, _ in cache.values():
        for a, name in zip(st, gp._traced_constants):
            assert a is getattr(gp, name)


def test_prog_cache_shape_churn_capped():
    gp = ExactGP(1, "RBF")
    X, y = _toy()
    gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=20,
           print_summary=False, progress_bar=False)
    for m in range(5, 5 + ExactGP._prog_cache_max + 4):
        gp.predict(get_keys()[1], jnp.linspace(-1, 1, m))
    assert len(gp.__dict__["_prog_cache"]) <= ExactGP._prog_cache_max


def test_hypo_step_scalar_posterior():
    """A hypothesis model whose posterior has only scalar sites must not crash
    the r̂ gate (VERDICT r02 weak #8: max() on an empty list)."""
    from gpax_tpu import hypo

    def model(x, params):
        return params["a"] * x

    def model_prior():
        from gpax_tpu import distributions as dist
        from gpax_tpu import ppl

        return {"a": ppl.sample("a", dist.Normal(0.0, 1.0))}

    X = jnp.linspace(0, 1, 8)
    y = 2.0 * X + 0.01 * jnp.asarray(np.random.default_rng(0).normal(size=8),
                                     jnp.float32)
    obj, m = hypo.step(model, model_prior, X, y, X_unmeasured=X[:4],
                       num_warmup=50, num_samples=50, print_summary=False)
    assert np.all(np.isfinite(np.asarray(obj)))


def test_vidkl_functional_module_adapter():
    """viDKL accepts a plain (init_fn, apply_fn) pair — the reference's
    arbitrary-haiku-module extensibility (gpax/models/vidkl.py:60-99)."""

    def init_fn(key, x):
        d = x.reshape(x.shape[0], -1).shape[-1]
        k1, k2 = jax.random.split(key)
        return {"w1": 0.1 * jax.random.normal(k1, (d, 8), jnp.float32),
                "w2": 0.1 * jax.random.normal(k2, (8, 2), jnp.float32)}

    def apply_fn(params, x):
        h = jnp.tanh(x.reshape(x.shape[0], -1) @ params["w1"])
        return h @ params["w2"]

    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(16, 5)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(X).sum(-1)), jnp.float32)
    dkl = viDKL(input_dim=5, z_dim=2, nn=(init_fn, apply_fn))
    dkl.fit(get_keys()[0], X, y, num_steps=40, print_summary=False,
            progress_bar=False)
    mean, var = dkl.predict(get_keys()[1], X)
    assert mean.shape == (16,)
    assert np.all(np.isfinite(np.asarray(mean)))
    emb = dkl.embed(X)
    assert emb.shape == (16, 2)


def test_vidkl_module_object_adapter_rejects_garbage():
    from gpax_tpu.nn.modules import as_module

    with pytest.raises(TypeError):
        as_module(42)


def test_sparse_capacitance_pd_small_noise():
    """The m×m capacitance B = I + V D⁻¹ Vᵀ must stay factorable with small
    noise at m ≥ 512 (VERDICT r02 weak #5: precision of the sparse posterior)."""
    rng = np.random.default_rng(0)
    n, m = 1200, 512
    X = jnp.asarray(np.sort(rng.uniform(0, 4, n)), jnp.float32)
    y = jnp.sin(3 * X) + 0.01 * jnp.asarray(rng.normal(size=n), jnp.float32)
    model = viSparseGP(input_dim=1, kernel="RBF")
    model.X_train, model.y_train = X[:, None], y
    model.Xu = jnp.asarray(np.linspace(0, 4, m), jnp.float32)[:, None]
    params = {"k_length": jnp.asarray([0.5], jnp.float32),
              "k_scale": jnp.asarray(1.0, jnp.float32),
              "noise": jnp.asarray(1e-4, jnp.float32),
              "period": None}
    mean, cov = model.get_mvn_posterior(
        jnp.asarray(np.linspace(0, 4, 64), jnp.float32)[:, None], params)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.isfinite(np.asarray(cov)))
    var = np.diag(np.asarray(cov))
    assert np.all(var > -1e-3)


def test_sparse_posterior_matches_exact_at_full_inducing():
    """With Xu == X_train the VFE posterior reduces to the exact GP posterior —
    a math gate on the rewritten all-matmul form."""
    rng = np.random.default_rng(1)
    n = 40
    X = jnp.asarray(np.sort(rng.uniform(0, 3, n)), jnp.float32)[:, None]
    y = jnp.sin(2 * X[:, 0]) + 0.05 * jnp.asarray(rng.normal(size=n), jnp.float32)
    Xs = jnp.asarray(np.linspace(0.2, 2.8, 23), jnp.float32)[:, None]
    params = {"k_length": jnp.asarray([0.7], jnp.float32),
              "k_scale": jnp.asarray(1.2, jnp.float32),
              "noise": jnp.asarray(0.05, jnp.float32),
              "period": None}

    sp = viSparseGP(input_dim=1, kernel="RBF")
    sp.X_train, sp.y_train, sp.Xu = X, y, X
    mean_s, cov_s = sp.get_mvn_posterior(Xs, params)

    gp = ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    mean_e, cov_e = gp.get_mvn_posterior(Xs, params)

    np.testing.assert_allclose(np.asarray(mean_s), np.asarray(mean_e),
                               atol=2e-3, rtol=2e-2)
    np.testing.assert_allclose(np.diag(np.asarray(cov_s)),
                               np.diag(np.asarray(cov_e)), atol=5e-3)


def test_mvn_logprob_small_n_matches_dense_and_grads():
    """MVN.log_prob now routes through the matmul-only custom-VJP density at
    every n; value and gradient must match the straightforward formula."""
    from gpax_tpu import distributions as dist

    rng = np.random.default_rng(0)
    n = 23
    A = rng.normal(size=(n, n)).astype(np.float32)
    K = jnp.asarray(A @ A.T / n + 0.5 * np.eye(n, dtype=np.float32))
    yv = jnp.asarray(rng.normal(size=n), jnp.float32)
    loc = jnp.zeros(n, jnp.float32)

    lp = dist.MultivariateNormal(loc=loc, covariance_matrix=K).log_prob(yv)
    # dense reference via scipy-style formula (f64 on CPU path through numpy)
    import scipy.stats

    ref = scipy.stats.multivariate_normal(np.zeros(n), np.asarray(K)).logpdf(
        np.asarray(yv))
    assert abs(float(lp) - float(ref)) < 1e-2 * max(1.0, abs(ref))

    def f(theta):
        Ks = K * jnp.exp(theta)
        return dist.MultivariateNormal(loc=loc, covariance_matrix=Ks).log_prob(yv)

    g = jax.grad(f)(jnp.asarray(0.3, jnp.float32))
    eps = 1e-3
    fd = (f(jnp.asarray(0.3 + eps)) - f(jnp.asarray(0.3 - eps))) / (2 * eps)
    assert abs(float(g) - float(fd)) < 5e-2 * max(1.0, abs(float(fd)))


def test_wtw_compensated_accuracy():
    """Split-f32 WᵀW must be ~f32-accurate (the backward-pass n³ term rides it
    now); bound the relative error well below single-pass bf16's ~4e-3."""
    from gpax_tpu.ops.linalg import wtw_compensated

    rng = np.random.default_rng(0)
    W = jnp.asarray(np.tril(rng.normal(size=(256, 256))), jnp.float32)
    exact = np.asarray(
        jnp.matmul(W.T, W, precision=jax.lax.Precision.HIGHEST), np.float64)
    approx = np.asarray(wtw_compensated(W), np.float64)
    scale = np.abs(exact).max()
    assert np.abs(approx - exact).max() / scale < 5e-5
    # batched form
    Wb = jnp.stack([W, 2.0 * W])
    ab = np.asarray(wtw_compensated(Wb))
    np.testing.assert_allclose(ab[1], 4.0 * ab[0], rtol=1e-5, atol=1e-4)


def test_segmented_chains_telemetry():
    """run_nuts_segmented_chains reports per-segment wall/leapfrog telemetry
    (ADVICE r02: the chains variant omitted segment_wall_s)."""
    from gpax_tpu.infer.nuts import run_nuts_segmented_chains
    from gpax_tpu.ppl import initialize_model

    X, y = _toy(n=10)
    gp = ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
    z0 = jax.tree_util.tree_map(
        lambda x: jnp.stack([x, x + 0.1]), info.init_unconstrained)
    zs, stats, _ = run_nuts_segmented_chains(
        info.potential_fn, z0, jax.random.PRNGKey(1), num_chains=2,
        num_warmup=20, num_samples=20, segment_size=10, max_tree_depth=5)
    assert zs.shape[0] == 2 and zs.shape[1] == 20
    assert stats["segment_wall_s"].shape == (4,)
    assert stats["segment_leapfrogs"].shape == (4,)
    # honest accounting: totals include warmup trees
    assert int(stats["segment_leapfrogs"].sum()) >= int(
        np.asarray(stats["num_steps"]).sum())


def test_sequential_multichain_segmented():
    """chain_method='sequential' with multiple chains accepts segment_size
    (ADVICE r02: the documented fault trigger was unbounded sequential fits)."""
    X, y = _toy(n=10)
    gp = ExactGP(1, "RBF")
    gp.fit(get_keys()[0], X, y, num_warmup=20, num_samples=20, num_chains=2,
           chain_method="sequential", segment_size=10,
           print_summary=False, progress_bar=False)
    s = gp.get_samples(chain_dim=True)
    assert s["noise"].shape == (2, 20)


def test_mvn_dk_gauge_symmetric_equivalent():
    """'symmetric_equivalent' dK gauge: same symmetric part as 'exact' (so
    identical theta-gradients through any symmetric K construction), cheaper
    antisymmetric gauge otherwise."""
    from gpax_tpu import set_config
    from gpax_tpu.ops.linalg import mvn_log_prob_centered
    from gpax_tpu.kernels import get_kernel

    n = 96
    rng = np.random.default_rng(3)
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0])
    kern = get_kernel("RBF")

    def potential(theta):
        params = {"k_length": jnp.exp(theta[0]), "k_scale": jnp.exp(theta[1])}
        K = kern(X, X, params, noise=jnp.exp(theta[2]))
        return -mvn_log_prob_centered(K, y)

    theta = jnp.asarray([0.1, -0.2, -3.0], jnp.float32)
    K = kern(X, X, {"k_length": 1.0, "k_scale": 1.0}, noise=0.05)
    from gpax_tpu.config import get_config
    prior_gauge = get_config().mvn_dk_gauge
    try:
        set_config(mvn_dk_gauge="symmetric_equivalent")
        g_gauge = jax.grad(potential)(theta)
        dK_gauge = jax.grad(lambda K: mvn_log_prob_centered(K, y))(K)
        set_config(mvn_dk_gauge="exact")
        g_exact = jax.grad(potential)(theta)
        dK_exact = jax.grad(lambda K: mvn_log_prob_centered(K, y))(K)
    finally:
        set_config(mvn_dk_gauge=prior_gauge)

    # theta-gradients through the (symmetric) kernel construction agree to
    # f32 summation-order noise (the antisymmetric part cancels exactly in
    # real arithmetic; different accumulation orders leave ~1e-4 relative)
    np.testing.assert_allclose(np.asarray(g_gauge), np.asarray(g_exact),
                               rtol=1e-3, atol=1e-5)
    # raw dK differs only by an antisymmetric part: symmetric parts match
    sym_g = 0.5 * (dK_gauge + dK_gauge.T)
    sym_e = 0.5 * (dK_exact + dK_exact.T)
    scale = float(jnp.max(jnp.abs(sym_e)))
    assert float(jnp.max(jnp.abs(sym_g - sym_e))) / scale < 1e-4
    # and any symmetric contraction agrees
    S = jnp.asarray(rng.normal(size=(n, n)), jnp.float32)
    S = S + S.T
    a, b = float(jnp.vdot(dK_gauge, S)), float(jnp.vdot(dK_exact, S))
    assert abs(a - b) / max(abs(b), 1e-6) < 1e-3
