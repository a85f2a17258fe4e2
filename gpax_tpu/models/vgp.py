"""Vector-valued (per-task) exact GP.

Parity surface: gpax/models/vgp.py:19-208 — X has shape (n_tasks, n, d) and y
(n_tasks, n); per-task kernel hyperparameters/noise via nested plates; the kernel
and the predictive posterior are vmapped over the task axis.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp

from .. import distributions as dist
from .. import ppl
from ..ops.linalg import gp_predictive_moments
from .gp import ExactGP


class vExactGP(ExactGP):
    """Exact GP over vector-valued targets with a leading task dimension."""

    _exact_moments_ok = False  # task-batched data layout

    def __init__(self, input_dim: int, kernel="RBF",
                 mean_fn: Optional[Callable] = None,
                 kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_prior: Optional[Callable] = None,
                 noise_prior_dist: Optional[dist.Distribution] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None) -> None:
        super().__init__(input_dim, kernel, mean_fn, kernel_prior, mean_fn_prior,
                         noise_prior)
        self.noise_prior_dist = noise_prior_dist
        self.lengthscale_prior_dist = lengthscale_prior_dist

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        jitter = kwargs.get("jitter", 1e-6)
        task_dim = X.shape[0]
        f_loc = jnp.zeros(X.shape[:2])
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params(task_dim=task_dim)
        if self.noise_prior:
            noise = self.noise_prior()
        else:
            noise = self._sample_noise(task_dim)
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
        # per-task gram matrices in one batched program
        jitter_t = jnp.full((task_dim,), jitter)
        k = jax.vmap(
            lambda x, p, nz, jt: self.kernel(x, x, p, nz, jitter=jt)
        )(X, kernel_params, noise, jitter_t)
        ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k), obs=y)

    def _sample_noise(self, task_dim: Optional[int] = None) -> jnp.ndarray:
        noise_dist = self.noise_prior_dist
        if noise_dist is None:
            noise_dist = dist.LogNormal(0.0, 1.0)
        with ppl.plate("noise_plate", task_dim):
            return ppl.sample("noise", noise_dist)

    def _sample_kernel_params(self, output_scale: bool = True,
                              task_dim: Optional[int] = None) -> Dict[str, jnp.ndarray]:
        length_dist = self.lengthscale_prior_dist
        if length_dist is None:
            length_dist = dist.LogNormal(0.0, 1.0)
        with ppl.plate("plate_1", task_dim):
            with ppl.plate("lengthscale", self.kernel_dim):
                length = ppl.sample("k_length", length_dist)
        with ppl.plate("plate_2", task_dim):
            scale = ppl.sample("k_scale", dist.LogNormal(0.0, 1.0))
            period = (
                ppl.sample("period", dist.LogNormal(0.0, 1.0))
                if self.kernel_name == "Periodic" else None
            )
        return {"k_length": length, "k_scale": scale, "period": period}

    def _get_mvn_posterior_single(self, X_train, y_train, X_new, params,
                                  m_X=None, m_p=None, noiseless=False, jitter=1e-6):
        noise = params["noise"]
        noise_p = noise * (1 - noiseless)
        y_residual = y_train if m_X is None else y_train - m_X
        k_pp = self.kernel(X_new, X_new, params, noise_p, jitter=jitter)
        k_pX = self.kernel(X_new, X_train, params, jitter=0.0)
        k_XX = self.kernel(X_train, X_train, params, noise, jitter=jitter)
        mean, cov = gp_predictive_moments(k_XX, k_pX, k_pp, y_residual)
        if m_p is not None:
            mean = mean + m_p
        return mean, cov

    def get_mvn_posterior(self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                          noiseless: bool = False, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-task predictive posteriors, vmapped over the task axis with scalar
        params broadcast (parity: gpax/models/vgp.py:147-173)."""
        task_dim = X_new.shape[0]
        jitter = kwargs.get("jitter", 1e-6)
        params_b = {
            k: (jnp.broadcast_to(p, (task_dim,) + jnp.shape(p)) if jnp.ndim(p) == 0 else p)
            for k, p in params.items() if p is not None
        }
        noiseless_t = jnp.full((task_dim,), int(noiseless))
        jitter_t = jnp.full((task_dim,), jitter)
        if self.mean_fn is not None:
            get_args = (lambda x: [x, params]) if self.mean_fn_prior else (lambda x: [x])
            m_X = self.mean_fn(*get_args(self.X_train)).squeeze()
            m_p = self.mean_fn(*get_args(X_new)).squeeze()
            return jax.vmap(self._get_mvn_posterior_single)(
                self.X_train, self.y_train, X_new, params_b, m_X, m_p,
                noiseless_t, jitter_t,
            )
        return jax.vmap(
            lambda Xt, yt, Xn, p, nl, jt: self._get_mvn_posterior_single(
                Xt, yt, Xn, p, None, None, nl, jt
            )
        )(self.X_train, self.y_train, X_new, params_b, noiseless_t, jitter_t)

    def predict_in_batches(self, rng_key, X_new: jnp.ndarray, batch_size: int = 100,
                           samples: Optional[Dict[str, jnp.ndarray]] = None,
                           n: int = 1, filter_nans: bool = False,
                           predict_fn: Optional[Callable] = None,
                           noiseless: bool = False, device=None, **kwargs
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Batched over the points axis (dim 1); concatenates along the last axis."""
        X_new = self._set_data(X_new)
        y_pred, y_sampled = self._predict_in_batches(
            rng_key, X_new, batch_size, 1, samples, n, filter_nans,
            predict_fn, noiseless, device, **kwargs,
        )
        return jnp.concatenate(y_pred, -1), jnp.concatenate(y_sampled, -1)

    def _set_data(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None
                  ) -> Union[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        X = jnp.asarray(X)
        X = X[..., None] if X.ndim == 2 else X
        if y is not None:
            y = jnp.asarray(y)
            if y.shape[0] != X.shape[0]:
                raise AssertionError(
                    "Task dimensions must be identical in inputs and targets"
                )
            return X, y
        return X
