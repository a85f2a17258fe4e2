"""Pallas-vs-XLA parity for the fused gram kernels (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpax_tpu.kernels import MaternKernel, RBFKernel
from gpax_tpu.ops.pallas_gram import gram


@pytest.mark.parametrize("kind,ref_kernel", [("rbf", RBFKernel), ("matern52", MaternKernel)])
@pytest.mark.parametrize("n,m,d", [(16, 16, 1), (40, 40, 3), (40, 24, 2)])
def test_pallas_gram_parity(kind, ref_kernel, n, m, d):
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(m, d)), jnp.float32) if (n, d) != (m, d) else X
    params = {
        "k_length": jnp.asarray(rng.uniform(0.5, 2.0, d), jnp.float32),
        "k_scale": jnp.asarray(1.7, jnp.float32),
    }
    noise = jnp.asarray(0.3, jnp.float32)
    ref = ref_kernel(X, Z, params, noise, jitter=1e-6)
    out = gram(X, Z, params["k_length"], params["k_scale"], noise,
               kind=kind, jitter=1e-6, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_pallas_gram_vector_noise():
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.normal(size=(12, 2)), jnp.float32)
    noise_vec = jnp.asarray(rng.uniform(0.1, 0.5, 12), jnp.float32)
    params = {"k_length": jnp.ones(2), "k_scale": jnp.asarray(2.0)}
    ref = RBFKernel(X, X, params, noise_vec, jitter=1e-6)
    out = gram(X, X, params["k_length"], params["k_scale"], noise_vec,
               kind="rbf", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)


@pytest.mark.parametrize("kind,ref_kernel", [("rbf", RBFKernel), ("matern52", MaternKernel)])
def test_pallas_gram_gradients_match_xla(kind, ref_kernel):
    """custom-VJP backward must agree with XLA autodiff for all three params."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(20, 2)), jnp.float32)
    noise = jnp.asarray(0.2, jnp.float32)
    args = (jnp.asarray([0.8, 1.3]), jnp.asarray(1.5), noise)

    def loss_p(kl, ks, nz):
        return jnp.sum(jnp.sin(gram(X, X, kl, ks, nz, kind=kind, interpret=True)))

    def loss_x(kl, ks, nz):
        return jnp.sum(jnp.sin(ref_kernel(X, X, {"k_length": kl, "k_scale": ks}, nz)))

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(*args)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(*args)
    for a, b in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=1e-5)


def test_pallas_gram_vmap_and_vmap_grad():
    """Sample-batched (vmapped) grams and their grads — the predict fan-out path."""
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.normal(size=(16, 2)), jnp.float32)
    noise = jnp.asarray(0.2, jnp.float32)
    kls = jnp.asarray(rng.uniform(0.5, 2.0, (4, 2)), jnp.float32)
    vm_p = jax.vmap(
        lambda kl: gram(X, X, kl, jnp.asarray(1.0), noise, kind="rbf", interpret=True)
    )(kls)
    vm_x = jax.vmap(
        lambda kl: RBFKernel(X, X, {"k_length": kl, "k_scale": jnp.asarray(1.0)}, noise)
    )(kls)
    np.testing.assert_allclose(np.asarray(vm_p), np.asarray(vm_x), rtol=2e-5, atol=2e-5)
    gv = jax.vmap(jax.grad(
        lambda kl: jnp.sum(gram(X, X, kl, jnp.asarray(1.0), noise, kind="rbf", interpret=True))
    ))(kls)
    assert gv.shape == (4, 2)
    assert np.isfinite(np.asarray(gv)).all()


@pytest.mark.parametrize("kind", ["rbf", "matern52"])
def test_pallas_gram_compensated_error_bound(kind):
    """Split-f32 (hi+lo bf16) gram: error vs HIGHEST bounded well below the
    n-scaled noise floor, and the result stays PD with a small noise diagonal
    (the CLAUDE.md failure mode the compensation must not reintroduce)."""
    rng = np.random.default_rng(3)
    n, d = 96, 64  # d at the Pallas dispatch boundary — worst accumulation case
    X = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    kl = jnp.asarray(rng.uniform(0.5, 2.0, d), jnp.float32)
    noise = jnp.asarray(1e-3, jnp.float32)
    hi = gram(X, X, kl, jnp.asarray(1.0), noise, kind=kind,
              interpret=True, precision="highest")
    co = gram(X, X, kl, jnp.asarray(1.0), noise, kind=kind,
              interpret=True, precision="compensated")
    err = float(jnp.max(jnp.abs(hi - co)))
    # dropped lo*lo term: <= ~2^-18 per product * d accumulated ~ 2.4e-4 in r²;
    # RBF maps it ~1:1, Matérn's sqrt(r²) amplifies near r=0 (~sqrt of the
    # error) — both must stay below the 1e-3 noise floor
    assert err < (5e-4 if kind == "rbf" else 1e-3), err
    L = jnp.linalg.cholesky(co)
    assert bool(jnp.all(jnp.isfinite(L)))


def test_compensated_gram_gradients_finite():
    rng = np.random.default_rng(4)
    X = jnp.asarray(rng.normal(size=(24, 8)), jnp.float32)

    def loss(kl):
        return jnp.sum(gram(X, X, kl, jnp.asarray(1.0), jnp.asarray(0.1),
                            kind="rbf", interpret=True, precision="compensated"))

    g = jax.grad(loss)(jnp.ones(8))
    g_ref = jax.grad(lambda kl: jnp.sum(
        gram(X, X, kl, jnp.asarray(1.0), jnp.asarray(0.1),
             kind="rbf", interpret=True, precision="highest")))(jnp.ones(8))
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), rtol=1e-3, atol=1e-4)


def test_pallas_dispatch_boundary():
    """_pallas_eligible: the fused path takes 2-D inputs with d <= 64 and
    n*m >= pallas_min_elems on TPU; everything else falls back to XLA.
    DKL embeddings (z_dim <= 64) ride the fused path; wider features and
    batched (vmapped) calls must not."""
    from gpax_tpu.config import set_config
    from gpax_tpu.kernels.kernels import _pallas_eligible

    rng = np.random.default_rng(0)
    big = jnp.asarray(rng.normal(size=(256, 64)), jnp.float32)
    wide = jnp.asarray(rng.normal(size=(256, 65)), jnp.float32)
    small = jnp.asarray(rng.normal(size=(8, 2)), jnp.float32)
    batched = jnp.asarray(rng.normal(size=(3, 64, 2)), jnp.float32)

    set_config(use_pallas="always")
    try:
        assert _pallas_eligible(big, big, {})
        assert not _pallas_eligible(batched, batched, {})  # vmapped: XLA path
    finally:
        set_config(use_pallas="auto")

    # on CPU (auto) nothing is eligible; on TPU the same predicate enforces
    # the d<=64 / min_elems boundary — assert the pure-shape parts here
    assert not _pallas_eligible(small, small, {})
    if jax.default_backend() in ("tpu", "axon"):
        assert _pallas_eligible(big, big, {})
        assert not _pallas_eligible(wide, wide, {})

    set_config(use_pallas="never")
    try:
        assert not _pallas_eligible(big, big, {})
    finally:
        set_config(use_pallas="auto")


def test_pallas_gram_cross_no_noise():
    """Cross-covariance (different shapes) must NOT get the diagonal noise."""
    rng = np.random.default_rng(2)
    X = jnp.asarray(rng.normal(size=(10, 2)), jnp.float32)
    Z = jnp.asarray(rng.normal(size=(7, 2)), jnp.float32)
    params = {"k_length": jnp.ones(2), "k_scale": jnp.asarray(1.0)}
    ref = RBFKernel(X, Z, params, 99.0, jitter=1e-6)  # noise ignored off-diagonal
    out = gram(X, Z, params["k_length"], params["k_scale"], 99.0,
               kind="rbf", interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-5)
