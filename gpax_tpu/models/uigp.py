"""GP with uncertain (stochastic) inputs: latent true inputs X' inferred jointly.

Parity surface: gpax/models/uigp.py:17-194 — per-feature input noise
``sigma_x ~ HalfNormal(0.1)`` (assumes X normalized to (0,1); warns otherwise),
latent ``X' ~ Normal(X, sigma_x)`` under plates, GP built on X'; the posterior
uses the SAMPLED training X' from params, prediction samples X_new' and averages.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional, Tuple, Union

import jax.numpy as jnp

from .. import distributions as dist
from .. import ppl
from ..ops.linalg import gp_predictive_moments
from .gp import ExactGP

kernel_fn_type = Callable[..., jnp.ndarray]


class UIGP(ExactGP):
    """Uncertain-input GP."""

    _exact_moments_ok = False  # posterior uses the latent inputs X_prime

    def __init__(self, input_dim: int, kernel: Union[str, kernel_fn_type] = "RBF",
                 mean_fn: Optional[Callable] = None,
                 kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_prior: Optional[Callable] = None,
                 noise_prior_dist: Optional[dist.Distribution] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None,
                 sigma_x_prior_dist: Optional[dist.Distribution] = None) -> None:
        super().__init__(input_dim, kernel, mean_fn, kernel_prior, mean_fn_prior,
                         noise_prior, noise_prior_dist, lengthscale_prior_dist)
        self.sigma_x_prior_dist = sigma_x_prior_dist

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        f_loc = jnp.zeros(X.shape[0])
        X_prime = self._sample_x(X)
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        if self.noise_prior:
            noise = self.noise_prior()
        else:
            noise = self._sample_noise()
        if self.mean_fn is not None:
            args = [X_prime]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
        k = self.kernel(X_prime, X_prime, kernel_params, noise, **kwargs)
        ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k), obs=y)

    def _sample_x(self, X: jnp.ndarray) -> jnp.ndarray:
        n_samples, n_features = X.shape
        sigma_x_dist = self.sigma_x_prior_dist
        if sigma_x_dist is None:
            sigma_x_dist = dist.HalfNormal(0.1 * jnp.ones(n_features))
        with ppl.plate("feature_variance_plate", self.kernel_dim):
            sigma_x = ppl.sample("sigma_x", sigma_x_dist)
            with ppl.plate("X_prime_plate", n_samples):
                X_prime = ppl.sample("X_prime", dist.Normal(X, sigma_x))
        return X_prime

    def get_mvn_posterior(self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                          noiseless: bool = False, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Uses the posterior-sampled latent training inputs X' (uigp.py:131-157)."""
        X_train_prime = params["X_prime"]
        noise = params["noise"]
        noise_p = noise * (1 - jnp.asarray(noiseless, int))
        y_residual = self.y_train
        if self.mean_fn is not None:
            args = [X_train_prime, params] if self.mean_fn_prior else [X_train_prime]
            y_residual = y_residual - self.mean_fn(*args).squeeze()
        k_pp = self.kernel(X_new, X_new, params, noise_p, **kwargs)
        k_pX = self.kernel(X_new, X_train_prime, params, jitter=0.0)
        k_XX = self.kernel(X_train_prime, X_train_prime, params, noise, **kwargs)
        mean, cov = gp_predictive_moments(k_XX, k_pX, k_pp, y_residual)
        if self.mean_fn is not None:
            args = [X_new, params] if self.mean_fn_prior else [X_new]
            mean = mean + self.mean_fn(*args).squeeze()
        return mean, cov

    def _predict(self, rng_key, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                 n: int, noiseless: bool = False, **kwargs
                 ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Sample noisy test inputs with the learned sigma_x, average, predict."""
        X_new_prime = dist.Normal(X_new, params["sigma_x"]).sample(
            rng_key, sample_shape=(n,)
        ).mean(0)
        y_mean, K = self.get_mvn_posterior(X_new_prime, params, noiseless, **kwargs)
        from ..ops.linalg import robust_mvn_sample

        y_sampled = robust_mvn_sample(rng_key, y_mean, K, n)
        return y_mean, y_sampled

    def _set_data(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None
                  ) -> Union[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        X = jnp.asarray(X)
        X = X if X.ndim > 1 else X[:, None]
        if y is not None:
            if not (X.max() == 1 and X.min() == 0) and not self.sigma_x_prior_dist:
                warnings.warn(
                    "The default `sigma_x` prior assumes inputs normalized to (0, 1); "
                    "consider passing sigma_x_prior_dist=gpax_tpu.priors.halfnormal_dist(scale).",
                    UserWarning,
                )
            return X, jnp.asarray(y).squeeze()
        return X

    def _print_summary(self) -> None:
        from ..infer import diagnostics

        samples = self.get_samples(chain_dim=True)
        diagnostics.print_summary(
            {k: v for k, v in samples.items() if "X_prime" not in k}
        )
