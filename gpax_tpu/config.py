"""Global configuration for gpax-tpu.

The reference library (gpax, see /root/reference/gpax/utils/utils.py:19-21) exposes a
single global switch (``enable_x64``).  On TPU we additionally need a precision policy:
TPU matrix units natively accumulate bf16->f32; GP gram matrices and Cholesky
factorizations want full f32 (``highest`` matmul precision) and a slightly larger
default jitter than the f64-on-CPU reference.

Everything here is a plain frozen dataclass — cheap to read inside traced code
(values are Python scalars, so they become compile-time constants).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax


@dataclasses.dataclass(frozen=True)
class Config:
    """Framework-wide numeric policy.

    Attributes:
        default_jitter: diagonal jitter added to gram matrices (reference default 1e-6,
            gpax/kernels/kernels.py:24-25).
        matmul_precision: XLA matmul precision for gram construction / solves.
            ``"highest"`` forces full-f32 MXU passes (3-pass bf16) — required for
            numerically healthy Cholesky factorizations on TPU.  (Cholesky NaN
            handling itself lives in ops.linalg.safe_cholesky.)
    """

    default_jitter: float = 1e-6
    matmul_precision: str = "highest"
    # Gram-matrix cross-term precision: 'highest' = full-f32 MXU passes
    # (6-pass bf16, safest, DEFAULT); 'compensated' = split-f32 (hi+lo bf16,
    # three 1-pass matmuls), |error| <= ~2e-3 absolute at d=64 (bounded-error
    # tests in tests/test_pallas.py; jitter escalation absorbs rare indefinite
    # grams).  MEASURED on v5e (PALLAS_PARITY_r02.json): GP gram shapes are
    # latency/bandwidth-bound, not MXU-pass-bound, so 'compensated' does NOT
    # pay there (0.65-0.87x vs the fused HIGHEST Pallas kernel) — it exists
    # for wide-feature workloads and future hardware where passes dominate.
    gram_precision: str = "highest"
    # Fused Pallas gram kernels: 'auto' uses them on TPU for large-enough shapes,
    # 'always' forces them (interpret-mode on CPU), 'never' keeps pure XLA.
    use_pallas: str = "auto"
    pallas_min_elems: int = 128 * 128
    # Blocked Pallas Cholesky + triangular inverse (ops/chol.py): 'auto' uses it
    # on TPU for f32 matrices with n >= pallas_chol_min_n, 'always' forces it
    # (interpret-mode tile kernel on CPU), 'never' keeps jnp.linalg.cholesky.
    use_pallas_chol: str = "auto"
    pallas_chol_min_n: int = 512
    # Fused gram→Cholesky→density likelihood with closed-form θ-gradients
    # (ops/fused_density.py): 'auto' on TPU for standard RBF/Matérn ExactGP
    # likelihoods, 'always' forces it (CPU tests), 'never' disables.
    use_fused_likelihood: str = "auto"
    # n-aware dispatch for 'auto' (VERDICT r02 #3): same-process potgrad A/B
    # on chip (PROFILE_r03 fused_ab) — fused 3.94 vs composed 4.03 ms at
    # n=2048, but composed (with the compensated backward) wins at 4096
    # (17.5 vs 22.0) and 8192 (109.5 vs 160.6).  The fused op's one-fusion-
    # scope backward pays off only while op-dispatch floors dominate.
    fused_likelihood_max_n: int = 2048
    # Precision of the backward-pass K⁻¹ = WᵀW (the dominant n³ term of every
    # NUTS leapfrog backward, ops/linalg._mvn_lp_bwd): 'compensated' =
    # split-f32 hi+lo bf16 (3 one-pass MXU matmuls, ~1e-6 rel err),
    # 'highest' = 6-pass full f32, 'default' = single bf16 pass (~4e-3 err).
    wtw_precision: str = "compensated"
    # Gauge of the K-cotangent returned by mvn_log_prob_centered's backward:
    # 'exact' returns the symmetric dK; 'symmetric_equivalent' returns a
    # matrix with the SAME symmetric part but unconstrained antisymmetric
    # part, dropping one n³ MXU pass + one n² transpose from the compensated
    # WᵀW (hiᵀhi + 2·hiᵀlo instead of hiᵀhi + cross + crossᵀ).  Valid because
    # K is constrained symmetric: every legitimate consumer contracts dK
    # against ij-symmetric sensitivities ∂K_ij/∂θ (K is always built as
    # k(x_i,x_j) with k symmetric + diagonal noise), so the antisymmetric
    # part cancels identically.  Only read when wtw_precision='compensated'.
    # Measured on chip at n=8192 (PROFILE_r03 bwd_variants, fixed harness):
    # wired backward 19.8 ms vs 21.7 ms exact — DEFAULT.
    mvn_dk_gauge: str = "symmetric_equivalent"
    # wtw_precision override applied ONLY while an MCMC fit traces its
    # potential-gradient program (infer/mcmc.MCMC.run).  Rationale: in
    # NUTS/HMC the accept decision and the multinomial trajectory weights use
    # the exact POTENTIAL; the gradient only shapes the leapfrog proposal,
    # and leapfrog with ANY deterministic force field stays reversible and
    # volume-preserving — so a reduced-precision backward WᵀW leaves the
    # invariant distribution EXACT and can at most cost acceptance.  A bf16
    # ('default') backward WᵀW is one MXU pass instead of compensated's two.
    # The matrix-level dK error (~bf16-class) CONTRACTS AWAY in the
    # θ-gradient: dθ = ⟨dK, ∂K/∂θ⟩ sums n² terms, measured rel err 1.7e-6 at
    # n=8192 (scripts/tpu_wtw_ab.py).  On-chip NUTS A/B at n=8192, same key:
    # accept 0.764 vs 0.734, 0 divergences both, identical leapfrog counts,
    # 47.2 vs 57.2 ms/leapfrog warm — DEFAULT 'default'.  None disables the
    # override; gradient-accuracy-sensitive consumers (SVI/ELBO, predictive
    # paths, user grads) always trace under wtw_precision.
    hmc_wtw_precision: Optional[str] = "default"


_config = Config()


def _apply_matmul_precision(cfg: Config) -> None:
    # Library-wide policy: GP numerics on TPU need true-f32 matmuls EVERYWHERE in
    # the hot path — including inside XLA's Cholesky expansion and triangular
    # solves, which have no per-op precision knob.  bf16-truncated defaults both
    # destabilize factorization (n·eps·|K| error) and degrade HMC gradient
    # accuracy (acceptance collapse).
    jax.config.update("jax_default_matmul_precision", cfg.matmul_precision)


def get_config() -> Config:
    return _config


def set_config(**kwargs) -> Config:
    global _config
    _config = dataclasses.replace(_config, **kwargs)
    _apply_matmul_precision(_config)
    return _config


_apply_matmul_precision(_config)


def enable_x64(use_x64: bool = True) -> None:
    """Use double (x64) precision for jax arrays (parity with gpax.utils.enable_x64)."""
    jax.config.update("jax_enable_x64", use_x64)


def is_x64() -> bool:
    return jax.config.read("jax_enable_x64")
