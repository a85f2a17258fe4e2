"""GP covariance kernels, TPU-first.

API parity with the reference kernel layer (gpax/kernels/kernels.py:17-241): every
kernel has signature ``k(X, Z, params, noise=0, jitter=1e-6, **kw) -> (n, m)`` and
adds ``noise + jitter`` to the diagonal **only when X.shape == Z.shape** (the
reference's train/train vs cross-covariance rule, kernels.py:63-64 — preserved).

TPU design notes:
  * Scaled squared distances are computed in MXU form (‖x‖² − 2·XZᵀ + ‖z‖²) so the
    O(n·m·d) work runs on the systolic array as one matmul; elementwise maps fuse
    into the matmul epilogue under XLA.
  * The NNGP kernel is a closed-form *matrix-level* layer recursion carrying the
    full (n, m) gram plus the two diagonals — mathematically identical to the
    reference's per-pair recursion (kernels.py:120-183) but O(depth) fused matrix
    ops instead of an O(n·m) double-vmap of scalar recursions (kernels.py:219).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, Dict, Union

import jax
import jax.numpy as jnp

from ..config import get_config

kernel_fn_type = Callable[..., jnp.ndarray]

_SQRT5 = math.sqrt(5.0)


def _pallas_eligible(X, Z, params) -> bool:
    """Dispatch rule for the fused Pallas gram path (ops/pallas_gram.py)."""
    cfg = get_config()
    if cfg.use_pallas == "never":
        return False
    if X.ndim != 2 or Z.ndim != 2:
        return False  # batched (vmapped) calls stay on the XLA path
    if cfg.use_pallas == "always":
        return True
    return (
        jax.default_backend() in ("tpu", "axon")
        and X.shape[0] * Z.shape[0] >= cfg.pallas_min_elems
        and X.shape[-1] <= 64
    )


def _add_diag_noise(k, X, Z, noise, jitter):
    """Reference semantics: noise lands on the diagonal only for same-shaped inputs."""
    if X.shape == Z.shape:
        n = X.shape[0]
        idx = jnp.arange(n)
        return k.at[idx, idx].add(noise + jitter)
    return k


def square_scaled_distance(X: jnp.ndarray, Z: jnp.ndarray,
                           lengthscale: Union[jnp.ndarray, float] = 1.0) -> jnp.ndarray:
    """‖(x − z) / ℓ‖² for all pairs, in MXU (matmul) form, clipped at 0.

    The cross term runs at HIGHEST matmul precision: TPU's default f32 matmul
    truncates inputs to bf16, whose ~1e-2 relative errors exceed small noise
    diagonals and render gram matrices numerically indefinite (NaN Cholesky in
    the likelihood exactly where the posterior concentrates)."""
    Xs = X / lengthscale
    Zs = Z / lengthscale
    x2 = jnp.sum(Xs * Xs, axis=-1)
    z2 = jnp.sum(Zs * Zs, axis=-1)
    # 'compensated' gram_precision maps to Precision.HIGH — the hardware 3-pass
    # bf16 split, arithmetically the hi/lo scheme of ops/pallas_gram.py
    prec = (jax.lax.Precision.HIGH
            if get_config().gram_precision == "compensated"
            else jax.lax.Precision.HIGHEST)
    cross = jnp.dot(Xs, Zs.T, preferred_element_type=Xs.dtype, precision=prec)
    r2 = x2[:, None] - 2.0 * cross + z2[None, :]
    return jnp.clip(r2, 0.0, None)


def RBFKernel(X: jnp.ndarray, Z: jnp.ndarray, params: Dict[str, jnp.ndarray],
              noise=0, jitter: float = 1e-6, **kwargs) -> jnp.ndarray:
    """Squared-exponential kernel with ARD lengthscales ('k_length') and output
    scale ('k_scale').  Parity: gpax/kernels/kernels.py:44-65.
    Dispatches to the fused Pallas gram on TPU for large shapes."""
    if _pallas_eligible(X, Z, params):
        from ..ops.pallas_gram import gram

        return gram(X, Z, params["k_length"], params["k_scale"], noise,
                    kind="rbf", jitter=jitter,
                    interpret=jax.default_backend() not in ("tpu", "axon"))
    r2 = square_scaled_distance(X, Z, params["k_length"])
    k = params["k_scale"] * jnp.exp(-0.5 * r2)
    return _add_diag_noise(k, X, Z, noise, jitter)


def MaternKernel(X: jnp.ndarray, Z: jnp.ndarray, params: Dict[str, jnp.ndarray],
                 noise=0, jitter: float = 1e-6, **kwargs) -> jnp.ndarray:
    """Matérn-5/2 kernel.  Parity: gpax/kernels/kernels.py:68-91.

    f32 note: the reference regularizes with sqrt(r² + eps), whose gradient
    (0.5/sqrt(eps) ≈ 5e5 at r² = 0) amplifies the ±1e-7 rounding noise of the
    matmul-form diagonal distances into optimizer-destabilizing gradient noise on
    TPU/f32.  We use sqrt(max(r², eps)) instead: identical values off-diagonal,
    exactly-zero gradient below the floor.
    Dispatches to the fused Pallas gram on TPU for large shapes."""
    if _pallas_eligible(X, Z, params):
        from ..ops.pallas_gram import gram

        return gram(X, Z, params["k_length"], params["k_scale"], noise,
                    kind="matern52", jitter=jitter,
                    interpret=jax.default_backend() not in ("tpu", "axon"))
    r2 = square_scaled_distance(X, Z, params["k_length"])
    r = jnp.sqrt(jnp.maximum(r2, 1e-10))
    s5r = _SQRT5 * r
    k = params["k_scale"] * (1.0 + s5r + (5.0 / 3.0) * r2) * jnp.exp(-s5r)
    return _add_diag_noise(k, X, Z, noise, jitter)


def PeriodicKernel(X: jnp.ndarray, Z: jnp.ndarray, params: Dict[str, jnp.ndarray],
                   noise=0, jitter: float = 1e-6, **kwargs) -> jnp.ndarray:
    """Exp-sine-squared kernel with 'period'.  Parity: gpax/kernels/kernels.py:94-117.

    Needs true pairwise per-dimension differences, so it materializes an (n, m, d)
    intermediate; input dims for periodic GPs are small in practice."""
    diff = X[:, None, :] - Z[None, :, :]
    s = jnp.sin(math.pi * diff / params["period"]) / params["k_length"]
    k = params["k_scale"] * jnp.exp(-2.0 * jnp.sum(s * s, axis=-1))
    return _add_diag_noise(k, X, Z, noise, jitter)


# ---------------------------------------------------------------------------
# NNGP (infinite-width network) kernel — matrix-level recursion
# ---------------------------------------------------------------------------

def _nngp_base(X, Z, var_b, var_w):
    d = X.shape[-1]
    return var_b + var_w * jnp.dot(
        X, Z.T, preferred_element_type=X.dtype, precision=jax.lax.Precision.HIGHEST
    ) / d


def _nngp_base_diag(X, var_b, var_w):
    d = X.shape[-1]
    return var_b + var_w * jnp.sum(X * X, axis=-1) / d


def _nngp_erf_layer(K, kx, kz, var_b, var_w):
    """One erf-activation layer update for the cross gram K (n,m) and the two
    self-variance vectors kx (n,), kz (m,).  Same math as the scalar recursion at
    gpax/kernels/kernels.py:120-150, applied to whole matrices."""
    eps = 1e-7
    denom = jnp.sqrt((1.0 + 2.0 * kx)[:, None] * (1.0 + 2.0 * kz)[None, :])
    frac = jnp.clip(2.0 * K / denom, -1.0 + eps, 1.0 - eps)
    K_new = var_b + (2.0 * var_w / jnp.pi) * jnp.arcsin(frac)

    def diag_update(kv):
        fr = jnp.clip(2.0 * kv / (1.0 + 2.0 * kv), -1.0 + eps, 1.0 - eps)
        return var_b + (2.0 * var_w / jnp.pi) * jnp.arcsin(fr)

    return K_new, diag_update(kx), diag_update(kz)


def _nngp_relu_layer(K, kx, kz, var_b, var_w):
    """One ReLU (arc-cosine) layer update; math parity with kernels.py:153-183."""
    eps = 1e-7
    sq = jnp.sqrt(kx[:, None] * kz[None, :])
    frac = jnp.clip(K / sq, -1.0 + eps, 1.0 - eps)
    theta = jnp.arccos(frac)
    K_new = var_b + var_w / (2.0 * jnp.pi) * sq * (jnp.sin(theta) + (jnp.pi - theta) * frac)

    def diag_update(kv):
        # theta = arccos(clip(1)) -> arccos(1 - eps); reproduce the clipped scalar path
        fr = jnp.clip(jnp.ones_like(kv), -1.0 + eps, 1.0 - eps)
        th = jnp.arccos(fr)
        return var_b + var_w / (2.0 * jnp.pi) * kv * (jnp.sin(th) + (jnp.pi - th) * fr)

    return K_new, diag_update(kx), diag_update(kz)


def nngp_erf(x1, x2, var_b, var_w, depth: int = 3):
    """Single-pair NNGP value (erf); exported for API parity with the reference."""
    K = _nngp_base(x1[None], x2[None], var_b, var_w)
    kx = _nngp_base_diag(x1[None], var_b, var_w)
    kz = _nngp_base_diag(x2[None], var_b, var_w)
    for _ in range(depth):
        K, kx, kz = _nngp_erf_layer(K, kx, kz, var_b, var_w)
    return K[0, 0]


def nngp_relu(x1, x2, var_b, var_w, depth: int = 3):
    """Single-pair NNGP value (relu); exported for API parity with the reference."""
    K = _nngp_base(x1[None], x2[None], var_b, var_w)
    kx = _nngp_base_diag(x1[None], var_b, var_w)
    kz = _nngp_base_diag(x2[None], var_b, var_w)
    for _ in range(depth):
        K, kx, kz = _nngp_relu_layer(K, kx, kz, var_b, var_w)
    return K[0, 0]


def NNGPKernel(activation: str = "erf", depth: int = 3) -> kernel_fn_type:
    """Infinite-width-network kernel factory (params: 'var_b', 'var_w').

    Parity: gpax/kernels/kernels.py:186-224 — but the gram matrix is built by
    ``depth`` fused matrix updates rather than a double vmap over all pairs."""
    layer = _nngp_relu_layer if activation == "relu" else _nngp_erf_layer

    def nngp_kernel_fn(X, Z, params, noise=0, jitter: float = 1e-6, **kwargs):
        var_b, var_w = params["var_b"], params["var_w"]
        K = _nngp_base(X, Z, var_b, var_w)
        kx = _nngp_base_diag(X, var_b, var_w)
        kz = _nngp_base_diag(Z, var_b, var_w)
        for _ in range(depth):
            K, kx, kz = layer(K, kx, kz, var_b, var_w)
        return _add_diag_noise(K, X, Z, noise, jitter)

    return nngp_kernel_fn


def get_kernel(kernel: Union[str, kernel_fn_type] = "RBF", **kwargs) -> kernel_fn_type:
    """String registry (parity: gpax/kernels/kernels.py:227-241); callables pass
    through unchanged."""
    registry = {
        "RBF": RBFKernel,
        "Matern": MaternKernel,
        "Periodic": PeriodicKernel,
        "NNGP": NNGPKernel(**kwargs),
    }
    if isinstance(kernel, str):
        if kernel not in registry:
            raise KeyError(
                f"Unknown kernel '{kernel}'. Available: {sorted(registry)} "
                f"(or pass a callable with signature k(X, Z, params, noise, jitter))."
            )
        return registry[kernel]
    return kernel
