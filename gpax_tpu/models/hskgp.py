"""Heteroskedastic GP: a latent noise GP models per-point log-variance.

Parity surface: gpax/models/hskgp.py:23-220 — the noise GP samples
``log_var ~ MVN(noise_f_loc, K_noise)`` as a latent, the main GP observes
``y ~ MVN(f_loc, K + diag(exp(log_var)))``; noise-kernel parameters carry the
'k_noise_' prefix (via the closure-based ``_set_noise_kernel_fn``); prediction
regresses the latent log-variance onto new points with the noise kernel and adds
``diag(exp(log_var*))`` to the main predictive covariance.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .. import distributions as dist
from .. import ppl
from ..kernels import get_kernel
from ..ops.linalg import cho_solve, gp_predictive_moments, safe_cholesky
from ..utils.fn import _set_noise_kernel_fn
from .gp import ExactGP

kernel_fn_type = Callable[..., jnp.ndarray]


class VarNoiseGP(ExactGP):
    """GP with input-dependent (GP-modeled) observational noise."""

    _exact_moments_ok = False  # noise is a latent field, not params["noise"]

    def __init__(self, input_dim: int, kernel: Union[str, kernel_fn_type],
                 noise_kernel: Union[str, kernel_fn_type] = "RBF",
                 mean_fn: Optional[Callable] = None,
                 kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_kernel_prior: Optional[Callable] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None,
                 noise_mean_fn: Optional[Callable] = None,
                 noise_mean_fn_prior: Optional[Callable] = None,
                 noise_lengthscale_prior_dist: Optional[dist.Distribution] = None) -> None:
        super().__init__(input_dim, kernel, mean_fn, kernel_prior, mean_fn_prior,
                         None, None, lengthscale_prior_dist)
        noise_kernel_ = get_kernel(noise_kernel)
        self.noise_kernel = (
            _set_noise_kernel_fn(noise_kernel_) if isinstance(noise_kernel, str)
            else noise_kernel_
        )
        self.noise_mean_fn = noise_mean_fn
        self.noise_mean_fn_prior = noise_mean_fn_prior
        self.noise_kernel_prior = noise_kernel_prior
        self.noise_lengthscale_prior_dist = noise_lengthscale_prior_dist

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        f_loc = jnp.zeros(X.shape[0])
        noise_f_loc = jnp.zeros(X.shape[0])

        # --- noise GP (latent log-variance field) ---
        if self.noise_kernel_prior:
            noise_kernel_params = self.noise_kernel_prior()
        else:
            noise_kernel_params = self._sample_noise_kernel_params()
        if self.noise_mean_fn is not None:
            args = [X]
            if self.noise_mean_fn_prior is not None:
                args += [self.noise_mean_fn_prior()]
            noise_f_loc += jnp.log(self.noise_mean_fn(*args)).squeeze()
        k_noise = self.noise_kernel(X, X, noise_kernel_params, 0, **kwargs)
        points_log_var = ppl.sample(
            "log_var",
            dist.MultivariateNormal(loc=noise_f_loc, covariance_matrix=k_noise),
        )

        # --- main GP observing y with per-point noise ---
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
        k = self.kernel(X, X, kernel_params, 0, **kwargs)
        ppl.sample(
            "y",
            dist.MultivariateNormal(
                loc=f_loc,
                covariance_matrix=k + jnp.diag(jnp.exp(points_log_var)),
            ),
            obs=y,
        )

    def _sample_noise_kernel_params(self) -> Dict[str, jnp.ndarray]:
        noise_length_dist = self.noise_lengthscale_prior_dist
        if noise_length_dist is None:
            noise_length_dist = dist.LogNormal(0.0, 1.0)
        noise_scale = ppl.sample("k_noise_scale", dist.LogNormal(0.0, 1.0))
        noise_length = ppl.sample("k_noise_length", noise_length_dist)
        return {"k_noise_length": noise_length, "k_noise_scale": noise_scale}

    def get_mvn_posterior(self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                          *args, **kwargs) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Main-GP posterior + noise-GP-regressed predictive variance, both via
        Cholesky solves (replaces the two inverses at hskgp.py:177-199)."""
        y_residual = self.y_train
        if self.mean_fn is not None:
            margs = [self.X_train, params] if self.mean_fn_prior else [self.X_train]
            y_residual = y_residual - self.mean_fn(*margs).squeeze()
        k_pp = self.kernel(X_new, X_new, params, 0, **kwargs)
        k_pX = self.kernel(X_new, self.X_train, params, jitter=0.0)
        k_XX = self.kernel(self.X_train, self.X_train, params, 0, **kwargs)
        mean, cov = gp_predictive_moments(k_XX, k_pX, k_pp, y_residual)
        if self.mean_fn is not None:
            margs = [X_new, params] if self.mean_fn_prior else [X_new]
            mean = mean + self.mean_fn(*margs).squeeze()

        # regress the latent log-variance onto X_new with the noise kernel
        k_pX_noise = self.noise_kernel(X_new, self.X_train, params, jitter=0.0)
        k_XX_noise = self.noise_kernel(self.X_train, self.X_train, params, 0, **kwargs)
        log_var_residual = params["log_var"]
        if self.noise_mean_fn is not None:
            margs = [self.X_train, params] if self.noise_mean_fn_prior else [self.X_train]
            log_var_residual = log_var_residual - jnp.log(self.noise_mean_fn(*margs)).squeeze()
        L_noise = safe_cholesky(k_XX_noise)
        predicted_log_var = jnp.matmul(
            k_pX_noise, cho_solve(L_noise, log_var_residual),
            precision=jax.lax.Precision.HIGHEST)
        if self.noise_mean_fn is not None:
            margs = [X_new, params] if self.noise_mean_fn_prior else [X_new]
            predicted_log_var = predicted_log_var + jnp.log(self.noise_mean_fn(*margs)).squeeze()

        return mean, cov + jnp.diag(jnp.exp(predicted_log_var))

    def get_data_var_samples(self) -> jnp.ndarray:
        """Inferred per-point training noise (variance) samples."""
        samples = self.mcmc.get_samples()
        log_var = samples["log_var"]
        if self.noise_mean_fn is not None:
            if self.noise_mean_fn_prior is not None:
                mean_ = jax.vmap(self.noise_mean_fn, in_axes=(None, 0))(
                    self.X_train.squeeze(), samples
                )
            else:
                mean_ = self.noise_mean_fn(self.X_train.squeeze())
            log_var = log_var + jnp.log(mean_)
        return jnp.exp(log_var)

    def _print_summary(self) -> None:
        from ..infer import diagnostics

        samples = self.get_samples(chain_dim=True)
        diagnostics.print_summary(
            {k: v for k, v in samples.items() if "log_var" not in k}
        )
