"""Mesh-sharded blocked Cholesky / MVN likelihood (parallel/distributed_chol.py).

Runs on the 8-virtual-CPU mesh from conftest — the shardings and collectives
are real; only the transport is fake.
"""

import jax
import jax.numpy as jnp
import numpy as np

import gpax_tpu
from gpax_tpu.parallel import (
    get_mesh,
    make_sharded_mvn_log_prob,
    sharded_chol_inv,
    sharded_linalg,
)
from gpax_tpu.ppl import initialize_model


def _spd(n, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(n, n)).astype(np.float32)
    return jnp.asarray(A @ A.T / n + np.eye(n, dtype=np.float32), dtype)


def test_sharded_chol_inv_parity():
    mesh = get_mesh(8)
    n = 320  # NOT a multiple of leaf -> exercises identity padding
    K = _spd(n)
    L, W = jax.jit(lambda K: sharded_chol_inv(K, mesh, leaf=64))(K)
    L_ref = jnp.linalg.cholesky(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(L_ref),
                               rtol=2e-4, atol=2e-4)
    # W is the factor inverse: L @ W = I
    res = float(jnp.max(jnp.abs(L @ W - jnp.eye(n))))
    assert res < 5e-4, res


def test_sharded_mvn_log_prob_value_and_grad():
    mesh = get_mesh(8)
    n = 256
    K = _spd(n, seed=1)
    rng = np.random.default_rng(2)
    diff = jnp.asarray(rng.normal(size=n), jnp.float32)
    lp_sharded = make_sharded_mvn_log_prob(mesh, leaf=64)

    def ref_lp(K, diff):
        from gpax_tpu.ops.linalg import _jitter_scales
        j_base, _, eye = _jitter_scales(K)
        L = jnp.linalg.cholesky(K + j_base * eye)
        a = jax.scipy.linalg.solve_triangular(L, diff, lower=True)
        return (-0.5 * (a @ a + n * jnp.log(2 * jnp.pi))
                - jnp.log(jnp.diagonal(L)).sum())

    v_s = jax.jit(lp_sharded)(K, diff)
    v_r = ref_lp(K, diff)
    np.testing.assert_allclose(float(v_s), float(v_r), rtol=1e-4)

    g_s = jax.jit(jax.grad(lp_sharded, argnums=(0, 1)))(K, diff)
    g_r = jax.grad(ref_lp, argnums=(0, 1))(K, diff)
    for a, b in zip(g_s, g_r):
        scale = float(jnp.max(jnp.abs(b))) + 1e-12
        err = float(jnp.max(jnp.abs(a - b))) / scale
        assert err < 5e-3, err


def test_sharded_linalg_potential_matches_unsharded():
    """ExactGP potential + gradient under the sharded_linalg context must agree
    with the single-device path — the model-parallel NUTS correctness gate."""
    import jax.flatten_util

    mesh = get_mesh(8)
    rng = np.random.default_rng(0)
    n = 192
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0])
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.X_train, gp.y_train = X, y
    info = initialize_model(gp.model, jax.random.PRNGKey(0), (X, y))
    zf, unravel = jax.flatten_util.ravel_pytree(info.init_unconstrained)

    pg_plain = jax.jit(jax.value_and_grad(
        lambda z: info.potential_fn(unravel(z))))
    u0, g0 = pg_plain(zf + 0.1)

    with sharded_linalg(mesh, leaf=64):
        pg_sharded = jax.jit(jax.value_and_grad(
            lambda z: info.potential_fn(unravel(z))))
        u1, g1 = pg_sharded(zf + 0.1)
        jax.block_until_ready(g1)

    np.testing.assert_allclose(float(u1), float(u0), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               rtol=1e-3, atol=1e-3)


def test_sharded_linalg_nuts_smoke():
    """One short model-parallel NUTS fit end-to-end under the mesh context."""
    mesh = get_mesh(8)
    rng = np.random.default_rng(0)
    n = 128
    X = jnp.asarray(rng.uniform(-2, 2, (n, 1)), jnp.float32)
    y = jnp.sin(2 * X[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n), jnp.float32)
    gp = gpax_tpu.ExactGP(1, "RBF")
    with sharded_linalg(mesh, leaf=64):
        gp.fit(jax.random.PRNGKey(0), X, y, num_warmup=30, num_samples=30,
               max_tree_depth=5, print_summary=False, progress_bar=False)
    s = gp.get_samples()
    assert np.isfinite(np.asarray(s["k_length"])).all()
    assert float(np.asarray(s["noise"]).mean()) < 1.0
