"""Sparse variational GP (Titsias VFE) with trainable inducing points.

Parity surface: gpax/models/sparse_gp.py:25-223 — VFE collapsed bound with a
LowRankMVN likelihood and a clipped trace correction; inducing inputs registered as
an optimizable ``param`` site; standard whitened sparse predictive with two Cholesky
factorizations and packed triangular solves.  Cost O(n·m² + m³), never O(n³).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax
from .. import distributions as dist
from .. import ppl
from ..infer import SVI, Trace_ELBO
from ..ops.linalg import safe_chol_inv
from ..utils import initialize_inducing_points
from .vigp import viGP

_HI = jax.lax.Precision.HIGHEST


class viSparseGP(viGP):
    """Variational sparse GP: VFE bound, SVI-optimized inducing points."""

    _traced_constants = ("X_train", "y_train", "Xu")

    def __init__(self, input_dim: int, kernel="RBF",
                 mean_fn: Optional[Callable] = None,
                 kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_prior: Optional[Callable] = None,
                 noise_prior_dist: Optional[dist.Distribution] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None,
                 guide: str = "delta") -> None:
        super().__init__(input_dim, kernel, mean_fn, kernel_prior, mean_fn_prior,
                         noise_prior, noise_prior_dist, lengthscale_prior_dist, guide)
        self.Xu: Optional[jnp.ndarray] = None

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None,
              Xu: Optional[jnp.ndarray] = None, **kwargs) -> None:
        """Collapsed VFE program: y ~ LowRankMVN(f_loc, W, noise·I) with the
        trace factor −(tr(K_ff − Q_ff) / noise) / 2 (Titsias 2009)."""
        if Xu is not None:
            Xu = ppl.param("Xu", Xu)
        f_loc = jnp.zeros(X.shape[0])
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        if self.noise_prior:
            noise = self.noise_prior()
        else:
            noise = self._sample_noise()
        D = jnp.broadcast_to(noise, (X.shape[0],))
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()

        Kuu = self.kernel(Xu, Xu, kernel_params, **kwargs)
        _, Wuu = safe_chol_inv(Kuu)
        Kuf = self.kernel(Xu, X, kernel_params)
        # whitened cross-covariance as ONE HIGHEST-precision matmul (Wuu=Luu⁻¹)
        # instead of a serialized TRSM in the per-SVI-step hot loop
        W = jnp.matmul(Wuu, Kuf, precision=_HI).T             # (n, m)
        # k(x, x) diagonal in O(n·d) via a vmapped 1x1 kernel evaluation — the
        # reference materializes the full n x n gram just to take its diagonal
        # (sparse_gp.py:101), an O(n²d) cost per SVI step.
        Kff_diag = jax.vmap(
            lambda x: self.kernel(x[None], x[None], kernel_params, jitter=0.0)[0, 0]
        )(X)
        Qff_diag = jnp.square(W).sum(-1)
        trace_term = jnp.clip((Kff_diag - Qff_diag).sum() / noise, 0.0, None)
        ppl.factor("trace_term", -trace_term / 2.0)
        ppl.sample(
            "y",
            dist.LowRankMultivariateNormal(loc=f_loc, cov_factor=W, cov_diag=D),
            obs=y,
        )

    def fit(self, rng_key, X: jnp.ndarray, y: jnp.ndarray,
            inducing_points_ratio: float = 0.1,
            inducing_points_selection: str = "random",
            num_steps: int = 1000, step_size: float = 5e-3,
            progress_bar: bool = True, print_summary: bool = True,
            device=None, **kwargs) -> None:
        """SVI over hyperparameters AND inducing locations (one jitted scan)."""
        X, y = self._set_data(X, y)
        if device:
            X = jax.device_put(X, device)
            y = jax.device_put(y, device)
        Xu = initialize_inducing_points(
            X, inducing_points_ratio, inducing_points_selection, rng_key
        )
        self.X_train = X
        self.y_train = y

        optim = optax.adam(learning_rate=step_size, b1=0.5)
        self.svi = SVI(self.model, self.guide_type(self.model), optim, Trace_ELBO())
        result = self.svi.run(rng_key, num_steps, X, y, Xu=Xu,
                              progress_bar=progress_bar, **kwargs)
        self.kernel_params = result.params
        self.loss = result.losses
        self.Xu = result.params["Xu"]
        if print_summary:
            self._print_summary()

    def get_samples(self) -> Dict[str, jnp.ndarray]:
        out = self.svi.guide.median(self.kernel_params)
        return out

    def get_mvn_posterior(self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                          noiseless: bool = False, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """VFE predictive, all-matmul TPU form (behavioral parity with the
        reference's whitened solve chain, gpax/models/sparse_gp.py:173-223,
        but built on ops.linalg (L, L⁻¹) factorizations so every triangular
        solve is an MXU matmul, with explicit HIGHEST precision on each
        m×m / m×n product — a default-precision (bf16-truncated) capacitance
        matrix here is exactly the indefinite-gram failure mode of the f32
        rules in CLAUDE.md).

        Math: with whitened cross-covariances V = Luu⁻¹K_uf, Vs = Luu⁻¹K_us
        and capacitance B = I_m + V D⁻¹ Vᵀ (D = noise):

            mean = VsᵀB⁻¹V D⁻¹ y,   cov = K_ss − VsᵀVs + VsᵀB⁻¹Vs
        """
        noise = params["noise"]
        n_train = self.X_train.shape[0]
        noise_vec = jnp.broadcast_to(noise, (n_train,))
        noise_p = noise * (1 - jnp.asarray(noiseless, int))

        y_residual = self.y_train
        if self.mean_fn is not None:
            args = [self.X_train, params] if self.mean_fn_prior else [self.X_train]
            y_residual = y_residual - self.mean_fn(*args).squeeze()

        # inducing factorization once; Wuu = Luu⁻¹ turns both whitening solves
        # into matmuls
        Kuu = self.kernel(self.Xu, self.Xu, params, **kwargs)
        _, Wuu = safe_chol_inv(Kuu)
        V = jnp.matmul(Wuu, self.kernel(self.Xu, self.X_train, params, jitter=0),
                       precision=_HI)                                   # (m, n)
        Vs = jnp.matmul(Wuu, self.kernel(self.Xu, X_new, params, jitter=0),
                        precision=_HI)                                  # (m, s)

        Vd = V / noise_vec[None, :]
        B = jnp.matmul(Vd, V.T, precision=_HI)
        B = B.at[jnp.diag_indices(B.shape[0])].add(1.0)
        _, Wb = safe_chol_inv(B)                                        # Lb⁻¹

        G = jnp.matmul(Wb, Vs, precision=_HI)                           # (m, s)
        r = jnp.matmul(Wb, jnp.matmul(Vd, y_residual, precision=_HI),
                       precision=_HI)                                   # (m,)
        mean = jnp.matmul(G.T, r, precision=_HI).squeeze()

        Kss = self.kernel(X_new, X_new, params, noise_p, **kwargs)
        cov = (Kss - jnp.matmul(Vs.T, Vs, precision=_HI)
               + jnp.matmul(G.T, G, precision=_HI))

        if self.mean_fn is not None:
            args = [X_new, params] if self.mean_fn_prior else [X_new]
            mean = mean + self.mean_fn(*args).squeeze()
        return mean, cov
