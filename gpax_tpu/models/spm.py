"""Structured (parametric) probabilistic model with NUTS inference.

Parity surface: gpax/models/spm.py:30-218 — user supplies a deterministic model
``m(X, params)`` and a prior program; likelihood y ~ Normal(m(X, θ), σ).  This is
the baseline/comparison model and the vehicle for hypothesis learning (hypo.py).
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import jax.random as jra

from .. import distributions as dist
from .. import ppl
from ..infer import MCMC, NUTS

model_type = Callable[[jnp.ndarray, Dict[str, jnp.ndarray]], jnp.ndarray]
prior_type = Callable[[], Dict[str, jnp.ndarray]]


class sPM:
    """Bayesian inference over a user-defined parametric model."""

    def __init__(self, model: model_type, model_prior: prior_type,
                 noise_prior: Optional[prior_type] = None,
                 noise_prior_dist: Optional[dist.Distribution] = None) -> None:
        self._model = model
        self.model_prior = model_prior
        if noise_prior is not None:
            warnings.warn(
                "`noise_prior` is deprecated; pass `noise_prior_dist` instead.",
                FutureWarning,
            )
        self.noise_prior = noise_prior
        self.noise_prior_dist = noise_prior_dist
        self.mcmc: Optional[MCMC] = None

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None) -> None:
        params = self.model_prior()
        mu = ppl.deterministic("mu", self._model(X, params))
        if self.noise_prior:
            sig = self.noise_prior()
        else:
            sig = self._sample_noise()
        ppl.sample("y", dist.Normal(mu, sig), obs=y)

    def _sample_noise(self) -> jnp.ndarray:
        noise_dist = self.noise_prior_dist
        if noise_dist is None:
            noise_dist = dist.LogNormal(0.0, 1.0)
        return ppl.sample("noise", noise_dist)

    def fit(self, rng_key, X: jnp.ndarray, y: jnp.ndarray,
            num_warmup: int = 2000, num_samples: int = 2000,
            num_chains: int = 1, chain_method: str = "sequential",
            progress_bar: bool = True, print_summary: bool = True,
            device=None) -> None:
        X, y = self._set_data(X, y)
        if device:
            X = jax.device_put(X, device)
            y = jax.device_put(y, device)
        self.mcmc = MCMC(
            NUTS(self.model, init_strategy="median"),
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_chains=num_chains,
            chain_method=chain_method,
            progress_bar=progress_bar,
        )
        self.mcmc.run(rng_key, X, y)
        if print_summary:
            self._print_summary()

    def get_samples(self, chain_dim: bool = False) -> Dict[str, jnp.ndarray]:
        return self.mcmc.get_samples(group_by_chain=chain_dim)

    def get_param_means(self) -> Dict[str, float]:
        samples = self.get_samples()
        return {k: v.mean(0).item() for k, v in samples.items()
                if k != "mu" and v.ndim <= 1}

    def sample_from_prior(self, rng_key, X: jnp.ndarray, num_samples: int = 10):
        prior_predictive = ppl.Predictive(self.model, num_samples=num_samples)
        return prior_predictive(rng_key, X)["y"]

    def sample_single_posterior_predictive(self, rng_key, X_new, params, n_draws):
        sigma = params["noise"]
        loc = self._model(X_new, params)
        sample = dist.Normal(loc, sigma).sample(rng_key, (n_draws,)).mean(0)
        return loc, sample

    def _vmap_predict(self, rng_key, X_new, samples=None, n_draws: int = 1):
        if samples is None:
            samples = self.get_samples(chain_dim=False)
        num_samples = len(next(iter(samples.values())))
        keys = jra.split(rng_key, num_samples)

        # executable cached per input signature: a fresh jit per call would
        # recompile on every hypothesis-learning step (jit caches on function
        # identity), minutes each through a TPU tunnel
        cache = self.__dict__.setdefault("_prog_cache", {})
        leaves, treedef = jax.tree_util.tree_flatten(samples)
        sig = (X_new.shape, str(X_new.dtype), str(treedef),
               tuple((v.shape, str(v.dtype)) for v in leaves), n_draws)
        prog = cache.get(sig)
        if prog is None:
            def impl(Xn, ks, ss):
                def predictive(key, params):
                    return self.sample_single_posterior_predictive(
                        key, Xn, params, n_draws)

                return jax.vmap(predictive)(ks, ss)

            prog = jax.jit(impl)
            cache[sig] = prog
        return prog(X_new, keys, samples)

    def predict(self, rng_key, X_new: jnp.ndarray,
                samples: Optional[Dict[str, jnp.ndarray]] = None, n: int = 1,
                filter_nans: bool = False, take_point_predictions_mean: bool = True,
                device=None) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Posterior predictive over all HMC samples (vmapped in one program)."""
        X_new = self._set_data(X_new)
        if samples is None:
            samples = self.get_samples(chain_dim=False)
        if device:
            X_new = jax.device_put(X_new, device)
            samples = jax.device_put(samples, device)
        y_pred, y_sampled = self._vmap_predict(rng_key, X_new, samples, n)
        if filter_nans:
            mask = ~jnp.isnan(y_sampled).any(
                axis=tuple(range(1, y_sampled.ndim))
            )
            y_sampled = y_sampled[mask]
        if take_point_predictions_mean:
            y_pred = y_pred.mean(0)
        return y_pred, y_sampled

    def _print_summary(self) -> None:
        self.mcmc.print_summary()

    def _set_data(self, X, y=None):
        if y is not None:
            return X, y
        return X
