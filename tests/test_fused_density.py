"""Fused GP likelihood op (ops/fused_density.py): value/gradient parity with
the composed kernel()+MVN path, and end-to-end NUTS equivalence."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gpax_tpu
from gpax_tpu.ops.fused_density import gp_mvn_log_prob
from gpax_tpu.ppl import initialize_model


def _problem(n=96, d=2, seed=0):
    rng = np.random.default_rng(seed)
    X = jnp.asarray(rng.uniform(-2, 2, (n, d)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    return X, y


@pytest.mark.parametrize("kind,kname", [("rbf", "RBF"), ("matern52", "Matern")])
def test_fused_density_value_and_grads(kind, kname):
    from gpax_tpu.kernels import get_kernel
    from gpax_tpu.ops.linalg import mvn_log_prob_centered

    X, y = _problem()
    n = X.shape[0]
    kernel = get_kernel(kname)
    jbase = 4.0 * n * float(jnp.finfo(jnp.float32).eps)

    def composed(kl, ks, nz):
        K = kernel(X, X, {"k_length": kl, "k_scale": ks}, nz, jitter=1e-6)
        return mvn_log_prob_centered(K, y)

    def fused(kl, ks, nz):
        return gp_mvn_log_prob(X, kl, ks, nz + 1e-6 + jbase, y, kind)

    args = (jnp.asarray([0.7, 1.4]), jnp.asarray(1.3), jnp.asarray(0.05))
    v_c = composed(*args)
    v_f = fused(*args)
    np.testing.assert_allclose(float(v_f), float(v_c), rtol=2e-4)

    g_c = jax.grad(lambda *a: composed(*a), argnums=(0, 1, 2))(*args)
    g_f = jax.grad(lambda *a: fused(*a), argnums=(0, 1, 2))(*args)
    for a, b in zip(g_f, g_c):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_fused_density_vs_f64_ground_truth():
    """Gradient accuracy vs an f64 dense reference (the gate that caught the
    350x-worse hand-written Cholesky pullback in r01)."""
    X, y = _problem(n=48, d=1, seed=1)
    n = X.shape[0]
    jbase = 4.0 * n * float(jnp.finfo(jnp.float32).eps)
    args = (jnp.asarray([0.9]), jnp.asarray(1.1), jnp.asarray(0.08))

    def fused(kl, ks, nz):
        return gp_mvn_log_prob(X, kl, ks, nz + 1e-6 + jbase, y, "rbf")

    def dense64(kl, ks, nz):
        Xd = np.asarray(X, np.float64)
        r2 = ((Xd[:, None, :] / np.asarray(kl)) - (Xd[None, :, :] / np.asarray(kl))) ** 2
        K = np.asarray(ks) * np.exp(-0.5 * r2.sum(-1))
        K = K + (np.asarray(nz) + 1e-6 + jbase) * np.eye(n)
        L = np.linalg.cholesky(K)
        a = np.linalg.solve(L, np.asarray(y, np.float64))
        return (-0.5 * (a @ a + n * np.log(2 * np.pi))
                - np.log(np.diag(L)).sum())

    g_f = jax.grad(lambda *a: fused(*a), argnums=(0, 1, 2))(*args)
    eps = 1e-5
    for i, gi in enumerate(g_f):
        base = [np.asarray(a, np.float64) for a in args]
        hi = [b.copy() for b in base]
        lo = [b.copy() for b in base]
        hi[i] = hi[i] + eps
        lo[i] = lo[i] - eps
        fd = (dense64(*hi) - dense64(*lo)) / (2 * eps)
        np.testing.assert_allclose(np.asarray(gi).sum(), fd, rtol=5e-3, atol=1e-3)


def test_fused_likelihood_nuts_posterior_parity():
    """Full NUTS fit with the fused likelihood forced ON matches the composed
    path's posterior (same key, same model) within MC tolerance."""
    X, y = _problem(n=64, d=1, seed=2)
    key = jax.random.PRNGKey(0)

    gpax_tpu.set_config(use_fused_likelihood="always")
    try:
        gp_f = gpax_tpu.ExactGP(1, "RBF")
        gp_f.fit(key, X, y, num_warmup=100, num_samples=100,
                 print_summary=False, progress_bar=False)
        s_f = gp_f.get_samples()
    finally:
        gpax_tpu.set_config(use_fused_likelihood="never")
    try:
        gp_c = gpax_tpu.ExactGP(1, "RBF")
        gp_c.fit(key, X, y, num_warmup=100, num_samples=100,
                 print_summary=False, progress_bar=False)
        s_c = gp_c.get_samples()
    finally:
        gpax_tpu.set_config(use_fused_likelihood="auto")

    for site in ("k_length", "k_scale", "noise"):
        mf, mc = float(np.mean(s_f[site])), float(np.mean(s_c[site]))
        sc = float(np.std(s_c[site])) + 1e-6
        assert abs(mf - mc) < 4 * sc, (site, mf, mc, sc)


def test_fused_likelihood_potential_matches_composed():
    """initialize_model potentials agree between dispatch modes (trace-level
    wiring: the factor site replaces the obs site exactly)."""
    import jax.flatten_util

    X, y = _problem(n=80, d=1, seed=3)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y

    gpax_tpu.set_config(use_fused_likelihood="always")
    try:
        info_f = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
        zf, unravel = jax.flatten_util.ravel_pytree(info_f.init_unconstrained)
        u_f, g_f = jax.value_and_grad(
            lambda z: info_f.potential_fn(unravel(z)))(zf + 0.2)
    finally:
        gpax_tpu.set_config(use_fused_likelihood="never")
    try:
        info_c = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
        u_c, g_c = jax.value_and_grad(
            lambda z: info_c.potential_fn(unravel(z)))(zf + 0.2)
    finally:
        gpax_tpu.set_config(use_fused_likelihood="auto")

    np.testing.assert_allclose(float(u_f), float(u_c), rtol=2e-4)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_c),
                               rtol=3e-3, atol=3e-3)
