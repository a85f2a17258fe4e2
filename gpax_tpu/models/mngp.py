"""GP with measured (observed) per-point noise variances.

Parity surface: gpax/models/mngp.py:30-257 — the model adds ``diag(measured_noise)``
to the train covariance and pins the sampled noise site to a deterministic zero;
``fit`` threads the measured-noise array through MCMC; prediction extrapolates the
noise to X_new with linear regression ('linreg') or a variational GP ('gpreg') and
draws DIAGONAL-only Gaussian samples (no full-cov MVN sampling — quirk preserved).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import jax.random as jra

from .. import distributions as dist
from .. import ppl
from ..infer import MCMC, NUTS
from ..utils import get_keys
from .gp import ExactGP
from .linreg import LinReg

kernel_fn_type = Callable[..., jnp.ndarray]


class MeasuredNoiseGP(ExactGP):
    """GP whose training-data noise variances were measured, not inferred."""

    _exact_moments_ok = False  # measured noise enters the train covariance

    def __init__(self, input_dim: int, kernel: Union[str, kernel_fn_type] = "RBF",
                 mean_fn: Optional[Callable] = None,
                 kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None) -> None:
        super().__init__(input_dim, kernel, mean_fn, kernel_prior, mean_fn_prior,
                         None, None, lengthscale_prior_dist)
        self.measured_noise: Optional[jnp.ndarray] = None
        self.noise_predicted: Optional[jnp.ndarray] = None

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None,
              measured_noise: Optional[jnp.ndarray] = None, **kwargs) -> None:
        f_loc = jnp.zeros(X.shape[0])
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        # noise is observed, not inferred
        ppl.deterministic("noise", jnp.asarray(0.0))
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
        k = self.kernel(X, X, kernel_params, 0, **kwargs)
        ppl.sample(
            "y",
            dist.MultivariateNormal(
                loc=f_loc, covariance_matrix=k + jnp.diag(measured_noise)
            ),
            obs=y,
        )

    def fit(self, rng_key, X: jnp.ndarray, y: jnp.ndarray,
            measured_noise: jnp.ndarray, num_warmup: int = 2000,
            num_samples: int = 2000, num_chains: int = 1,
            chain_method: str = "sequential", progress_bar: bool = True,
            print_summary: bool = True, device=None, **kwargs) -> None:
        X, y = self._set_data(X, y)
        measured_noise = jnp.asarray(measured_noise).squeeze()
        if device:
            X, y = jax.device_put((X, y), device)
        self.X_train = X
        self.y_train = y
        self.measured_noise = measured_noise

        self.mcmc = MCMC(
            NUTS(self.model, init_strategy="median"),
            num_warmup=num_warmup, num_samples=num_samples,
            num_chains=num_chains, chain_method=chain_method,
            progress_bar=progress_bar,
        )
        self.mcmc.run(rng_key, X, y, measured_noise, **kwargs)
        if print_summary:
            self._print_summary()

    def _predict(self, rng_key, X_new, params, noise_predicted, n,
                 noiseless: bool = False, **kwargs):
        """Diagonal-only posterior sampling with the extrapolated noise added
        (quirk parity: gpax/models/mngp.py:159-182)."""
        y_mean, K = self.get_mvn_posterior(X_new, params, noiseless, **kwargs)
        K = K + jnp.diag(noise_predicted)
        sig = jnp.sqrt(jnp.clip(jnp.diag(K), 0.0, None))
        eps = jra.normal(rng_key, (n,) + y_mean.shape)
        return y_mean, y_mean + sig * eps

    def predict(self, rng_key, X_new: jnp.ndarray,
                samples: Optional[Dict[str, jnp.ndarray]] = None, n: int = 1,
                filter_nans: bool = False, noiseless: bool = True,
                device=None, noise_prediction_method: str = "linreg", **kwargs
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if noise_prediction_method not in ("linreg", "gpreg"):
            raise NotImplementedError(
                "For noise prediction method, select between 'linreg' and 'gpreg'"
            )
        noise_pred_fn = self.linreg if noise_prediction_method == "linreg" else self.gpreg
        X_new = self._set_data(X_new)
        if self.noise_predicted is not None:
            noise_predicted = self.noise_predicted
        else:
            noise_predicted = noise_pred_fn(
                self.X_train, self.measured_noise, X_new, **kwargs
            )
            self.noise_predicted = noise_predicted
        if samples is None:
            samples = self.get_samples(chain_dim=False)
        if device:
            self._set_training_data(device=device)
            X_new = jax.device_put(X_new, device)
            samples = jax.device_put(samples, device)
        num_samples = len(next(iter(samples.values())))
        keys = jra.split(rng_key, num_samples)

        def builder():
            def impl(Xn, ks, ss, np_):
                def single(key, params):
                    return self._predict(
                        key, Xn, params, np_, n, noiseless, **kwargs)

                return jax.vmap(single)(ks, ss)

            return jax.jit(impl)

        prog = self._cached_program(
            "mngp_predict", builder, X_new, samples, (n, noiseless), kwargs)
        y_means, y_sampled = prog(X_new, keys, samples, noise_predicted)
        if filter_nans:
            mask = ~jnp.isnan(y_sampled).any(axis=tuple(range(1, y_sampled.ndim)))
            y_sampled = y_sampled[mask]
        return y_means.mean(0), y_sampled

    def linreg(self, x, y, x_new, **kwargs):
        lreg = LinReg()
        lreg.train(x, y)
        return lreg.predict(x_new)

    def gpreg(self, x, y, x_new, **kwargs):
        from .vigp import viGP

        keys = get_keys()
        vigp = viGP(self.kernel_dim, "RBF")
        vigp.fit(keys[0], x, y, progress_bar=False, print_summary=False)
        return vigp.predict(keys[1], x_new, noiseless=True)[0]
