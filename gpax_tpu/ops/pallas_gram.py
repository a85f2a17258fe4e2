"""Fused Pallas gram-matrix kernels for stationary GP covariances.

One MXU-tiled pass computes, per (TM, TN) output tile:

    cross = Xs @ Zsᵀ                 (MXU)
    r²    = ‖xs‖² − 2·cross + ‖zs‖²  (VPU, fused)
    k     = map(r²)                  (RBF / Matérn-5/2 map, VPU)
    k    += noise_eff on the global diagonal (masked VPU op — no scatter kernel)

and the caller applies the output scale so that the final result equals
``k_scale · map(r²) + (noise + jitter) · I`` — the reference kernel contract
(gpax/kernels/kernels.py:44-91, including the same-shape diagonal rule).

XLA fuses the matmul+map adequately, but the diagonal update otherwise lowers to a
separate scatter kernel; fusing it here removes one full (n, m) HBM round-trip per
gram build — the op sitting inside every NUTS leapfrog step.

The XLA path in kernels.py remains the fallback (CPU, tiny shapes, custom kernels).
Parity is tested in tests/test_pallas.py (interpret mode on CPU; compiled on TPU).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SQRT5 = math.sqrt(5.0)

TILE_M = 256
TILE_N = 256


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _split_f32_dot_nt(xs, zs):
    """Compensated cross term: split each f32 operand into hi+lo bf16 halves and
    take three 1-pass bf16 MXU matmuls (hi·hi + hi·lo + lo·hi), accumulating in
    f32.  bf16×bf16→f32 products are exact (8+8 mantissa bits < 24), so the only
    dropped term is lo·lo ≤ 2⁻¹⁸·|x||z| per element — vs 6 passes for HIGHEST."""
    x_hi = xs.astype(jnp.bfloat16)
    x_lo = (xs - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    z_hi = zs.astype(jnp.bfloat16)
    z_lo = (zs - z_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dn = (((1,), (1,)), ((), ()))

    def d(a, b):
        return jax.lax.dot_general(a, b, dn, preferred_element_type=jnp.float32)

    return d(x_hi, z_hi) + (d(x_hi, z_lo) + d(x_lo, z_hi))


def _gram_kernel(x_ref, z_ref, x2_ref, z2_ref, noise_ref, out_ref, *,
                 kind: str, add_noise: bool, precision: str, interpret: bool):
    i = pl.program_id(0)
    j = pl.program_id(1)
    xs = x_ref[:]                       # (TM, d) f32 — or (TM, 2d) bf16 hi|lo
    zs = z_ref[:]                       # (TN, d) f32 — or (TN, 2d) bf16 hi|lo
    dn = (((1,), (1,)), ((), ()))
    if precision == "compensated" and not interpret:
        # compiled compensated path: operands arrive pre-split as bf16 hi|lo
        # concatenated on the feature axis (Mosaic supports neither
        # Precision.HIGH nor in-kernel f32→bf16 split casts, but bf16 matmul
        # with f32 accumulation is the MXU's native mode); three 1-pass dots
        # hi·hi + (hi·lo + lo·hi) — vs HIGHEST's 6 passes
        df = xs.shape[1] // 2
        xh, xl = xs[:, :df], xs[:, df:]
        zh, zl = zs[:, :df], zs[:, df:]

        def dd(a, b):
            return jax.lax.dot_general(a, b, dn,
                                       preferred_element_type=jnp.float32)

        cross = dd(xh, zh) + (dd(xh, zl) + dd(xl, zh))
    elif precision == "compensated":
        # interpret mode (CPU tests): same arithmetic, split done in-kernel
        # (precision flags are no-ops on CPU, so the split must be explicit)
        cross = _split_f32_dot_nt(xs, zs)
    else:
        cross = jax.lax.dot_general(
            xs, zs, dimension_numbers=dn,
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,  # true-f32 MXU passes: bf16
            # errors at DEFAULT exceed small noise diagonals and break the
            # downstream Cholesky
        )
    r2 = x2_ref[:] - 2.0 * cross + z2_ref[:].reshape(1, -1)
    r2 = jnp.maximum(r2, 0.0)
    if kind == "rbf":
        k = jnp.exp(-0.5 * r2)
    elif kind == "matern52":
        r = jnp.sqrt(jnp.maximum(r2, 1e-10))
        s5r = _SQRT5 * r
        k = (1.0 + s5r + (5.0 / 3.0) * r2) * jnp.exp(-s5r)
    else:
        raise ValueError(kind)

    if add_noise:
        tm, tn = k.shape
        row = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (tm, tn), 1)
        diag = (row + i * tm) == (col + j * tn)
        k = jnp.where(diag, k + noise_ref[:], k)
    out_ref[:] = k


@functools.partial(
    jax.jit, static_argnames=("kind", "add_noise", "interpret", "precision")
)
def pallas_gram(Xs: jnp.ndarray, Zs: jnp.ndarray, noise_eff: jnp.ndarray,
                kind: str = "rbf", add_noise: bool = True,
                interpret: bool = False, precision: str = "highest") -> jnp.ndarray:
    """Fused UNSCALED gram for pre-scaled inputs Xs (n, d), Zs (m, d):
    map(r²) + diag(noise_eff).  Caller multiplies by the output scale."""
    n, d = Xs.shape
    m = Zs.shape[0]
    Xs = Xs.astype(jnp.float32)
    Zs = Zs.astype(jnp.float32)
    x2 = jnp.sum(Xs * Xs, axis=-1)
    z2 = jnp.sum(Zs * Zs, axis=-1)

    tm = min(TILE_M, max(8, 1 << max(3, (n - 1).bit_length())))
    tn = min(TILE_N, max(128, 1 << max(7, (m - 1).bit_length())))
    n_pad = pl.cdiv(n, tm) * tm
    m_pad = pl.cdiv(m, tn) * tn
    if precision == "compensated" and not interpret:
        # pre-split hi|lo bf16 operands for the compiled compensated path
        Xhi = Xs.astype(jnp.bfloat16)
        Xlo = (Xs - Xhi.astype(jnp.float32)).astype(jnp.bfloat16)
        Zhi = Zs.astype(jnp.bfloat16)
        Zlo = (Zs - Zhi.astype(jnp.float32)).astype(jnp.bfloat16)
        Xk = jnp.concatenate([Xhi, Xlo], axis=1)
        Zk = jnp.concatenate([Zhi, Zlo], axis=1)
        dk = 2 * d
    else:
        Xk, Zk, dk = Xs, Zs, d
    Xp = _pad_to(Xk, n_pad, 0)
    Zp = _pad_to(Zk, m_pad, 0)
    x2p = _pad_to(x2, n_pad, 0)[:, None]            # (n_pad, 1)
    z2p = _pad_to(z2, m_pad, 0)[:, None]            # (m_pad, 1)
    noise_vec = jnp.broadcast_to(jnp.asarray(noise_eff, jnp.float32), (n,))
    noise_p = _pad_to(noise_vec, n_pad, 0)[:, None]  # (n_pad, 1)

    grid = (n_pad // tm, m_pad // tn)
    kernel = functools.partial(_gram_kernel, kind=kind, add_noise=add_noise,
                               precision=precision, interpret=interpret)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((n_pad, m_pad), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tm, dk), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, dk), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tn, 1), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, tn), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        cost_estimate=pl.CostEstimate(
            flops=2 * n_pad * m_pad * d + 8 * n_pad * m_pad,
            bytes_accessed=4 * (n_pad * d + m_pad * d + n_pad * m_pad),
            transcendentals=n_pad * m_pad,
        ),
        interpret=interpret,
    )(Xp, Zp, x2p, z2p, noise_p)
    return out[:n, :m]


# ---------------------------------------------------------------------------
# Differentiable wrapper: custom VJP so the fused kernel can sit inside the
# NUTS/SVI hot loop.  The backward pass is pure matmul math (XLA fuses it well):
#   r² = ‖xs‖² − 2·Xs Zsᵀ + ‖zs‖²,  w = ḡ ∘ map'(r²)
#   dXs = 2·(rowsum(w)·Xs − w Zs),  dZs = 2·(colsum(w)·Zs − wᵀ Xs)
#   dnoise_eff = diag(ḡ)
# with map'(r²) = −½·map(r²) for RBF and −(5/6)(1+√5 r)e^(−√5 r) for Matérn-5/2.
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7))
def pallas_gram_ad(Xs, Zs, noise_eff, kind: str = "rbf", add_noise: bool = True,
                   interpret: bool = False, precision: str = "highest",
                   symmetric: bool = False):
    return pallas_gram(Xs, Zs, noise_eff, kind=kind, add_noise=add_noise,
                       interpret=interpret, precision=precision)


def _pallas_gram_fwd(Xs, Zs, noise_eff, kind, add_noise, interpret, precision,
                     symmetric):
    out = pallas_gram(Xs, Zs, noise_eff, kind=kind, add_noise=add_noise,
                      interpret=interpret, precision=precision)
    return out, (Xs, Zs)


def _pallas_gram_bwd(kind, add_noise, interpret, precision, symmetric, res, g):
    Xs, Zs = res
    x2 = jnp.sum(Xs * Xs, axis=-1)
    z2 = jnp.sum(Zs * Zs, axis=-1)
    # backward recompute: Precision.HIGH is the hardware 3-pass bf16 split —
    # the same arithmetic as the compensated forward
    bwd_prec = (jax.lax.Precision.HIGH if precision == "compensated"
                else jax.lax.Precision.HIGHEST)
    cross = jnp.dot(Xs, Zs.T, preferred_element_type=Xs.dtype,
                    precision=bwd_prec)
    r2 = jnp.maximum(x2[:, None] - 2.0 * cross + z2[None, :], 0.0)
    if kind == "rbf":
        dmap = -0.5 * jnp.exp(-0.5 * r2)
    elif kind == "matern52":
        r = jnp.sqrt(jnp.maximum(r2, 1e-10))
        s5r = _SQRT5 * r
        dmap = jnp.where(r2 > 1e-10, -(5.0 / 6.0) * (1.0 + s5r) * jnp.exp(-s5r), 0.0)
    else:
        raise ValueError(kind)
    w = g * dmap
    hi = jax.lax.Precision.HIGHEST
    n = Xs.shape[0]
    if symmetric:
        # X ≡ Z (the k_XX leapfrog case): autodiff sums the two cotangents of
        # the shared operand, and the combined form
        #   dX = 2·(rowsum(wₛ)∘Xs − wₛ Xs),  wₛ = w + wᵀ
        # costs ONE matmul + rowsum instead of two of each
        ws = w + w.T
        dXs = 2.0 * (ws.sum(axis=1, keepdims=True) * Xs
                     - jnp.matmul(ws, Xs, precision=hi))
        dZs = jnp.zeros_like(Zs)
    else:
        dXs = 2.0 * (w.sum(axis=1, keepdims=True) * Xs
                     - jnp.matmul(w, Zs, precision=hi))
        dZs = 2.0 * (w.sum(axis=0)[:, None] * Zs
                     - jnp.matmul(w.T, Xs, precision=hi))
    if add_noise:
        dnoise = jnp.diagonal(g)[: min(n, Zs.shape[0])]
        dnoise = jnp.pad(dnoise, (0, n - dnoise.shape[0]))
    else:
        dnoise = jnp.zeros((n,), Xs.dtype)
    return dXs, dZs, dnoise


pallas_gram_ad.defvjp(_pallas_gram_fwd, _pallas_gram_bwd)


def gram(X: jnp.ndarray, Z: jnp.ndarray, k_length, k_scale, noise,
         kind: str = "rbf", jitter: float = 1e-6,
         interpret: bool = False, precision: str | None = None) -> jnp.ndarray:
    """Kernel-signature-compatible fused gram.

    Computes ``k_scale · map(‖(x−z)/ℓ‖²)`` with ``(noise + jitter)·I`` added when
    X and Z have the same shape (reference diagonal rule, kernels.py:63-64).
    The diagonal term is folded through the scale inside the kernel:
    scale·(map + (noise+jitter)/scale · I) ≡ scale·map + (noise+jitter)·I.
    """
    symmetric = X is Z
    Xs = (X / k_length).astype(jnp.float32)
    # alias the scaled operand when X ≡ Z so the symmetric-VJP fast path sees
    # one shared variable (autodiff then sums both cotangents onto it)
    Zs = Xs if symmetric else (Z / k_length).astype(jnp.float32)
    add_noise = X.shape == Z.shape
    n = X.shape[0]
    if add_noise:
        noise_eff = jnp.broadcast_to(
            (jnp.asarray(noise, jnp.float32) + jitter) / k_scale, (n,)
        ).astype(jnp.float32)
    else:
        noise_eff = jnp.zeros((n,), jnp.float32)
    if precision is None:
        from ..config import get_config
        precision = get_config().gram_precision
    if (precision == "compensated" and not interpret
            and jax.default_backend() in ("tpu", "axon")):
        # Mosaic on this toolchain crashes (remote-compile HTTP 500) on ANY
        # bf16 operand form in this kernel — in-kernel casts and pre-split
        # hi|lo inputs alike — and rejects Precision.HIGH outright.  Compiled
        # compensated grams therefore take the plain XLA formula with the
        # hardware 3-pass bf16 precision attribute (identical arithmetic);
        # interpret mode keeps the explicit in-kernel split for CPU tests.
        hi = jax.lax.Precision.HIGH
        cross = jnp.dot(Xs, Zs.T, preferred_element_type=jnp.float32,
                        precision=hi)
        x2 = jnp.sum(Xs * Xs, axis=-1)
        z2 = jnp.sum(Zs * Zs, axis=-1)
        r2 = jnp.maximum(x2[:, None] - 2.0 * cross + z2[None, :], 0.0)
        if kind == "rbf":
            k = jnp.exp(-0.5 * r2)
        elif kind == "matern52":
            r = jnp.sqrt(jnp.maximum(r2, 1e-10))
            s5r = _SQRT5 * r
            k = (1.0 + s5r + (5.0 / 3.0) * r2) * jnp.exp(-s5r)
        else:
            raise ValueError(kind)
        if add_noise:
            idx = jnp.arange(n)
            k = k.at[idx, idx].add(noise_eff)
        return k_scale * k
    k = pallas_gram_ad(Xs, Zs, noise_eff, kind, add_noise, interpret,
                       precision, symmetric)
    return k_scale * k
