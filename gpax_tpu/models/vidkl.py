"""Variational deep kernel learning.

Parity surface: gpax/models/vidkl.py:27-412 — MLP (64-64-z ReLU) feature extractor
registered either as Bayesian latents (Normal weights / Cauchy biases) or as MLE
params; channel-vmapped fits for 2-D targets; ensemble ``fit_predict`` vectorized
or device-parallel; ``embed``; ``predict`` returning (mean, variance).

TPU-native:
  * the NN module system is in-house (pytree params) — no haiku;
  * each SVI fit is ONE jitted lax.scan, and the multi-channel path vmaps that
    whole scan across channels (vidkl.py:181-196 semantics);
  * 'parallel' ensembles shard models across the device mesh with a NamedSharding
    instead of pmap (vidkl.py:358-365 equivalent).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import distributions as dist
from .. import ppl
from ..infer import SVI, AutoDelta, AutoNormal, Trace_ELBO
from ..nn.modules import MLP, Module, as_module, module_param, random_module
from ..ops.linalg import gp_predictive_mean_var, gp_predictive_moments, mvn_sample_from_cov
from ..utils import get_haiku_dict
from .gp import ExactGP


class viDKL(ExactGP):
    """SVI-trained deep kernel learning with in-house NN modules."""

    def __init__(self, input_dim: Union[int, Tuple[int, ...]], z_dim: int = 2,
                 kernel="RBF", kernel_prior: Optional[Callable] = None,
                 nn: Optional[Union[Module, Tuple[Callable, Callable]]] = None,
                 nn_prior: bool = True,
                 latent_prior: Optional[Callable] = None,
                 guide: str = "delta", **kwargs) -> None:
        super().__init__(
            input_dim if isinstance(input_dim, int) else int(np.prod(input_dim)),
            kernel, None, kernel_prior, **kwargs
        )
        if guide not in ("delta", "normal"):
            raise NotImplementedError("Select guide between 'delta' and 'normal'")
        # as_module: accepts a Module subclass, a plain (init_fn, apply_fn)
        # pair, or any object with .init/.apply — the reference's arbitrary-
        # module extensibility (gpax/models/vidkl.py:60-99) without haiku
        self.nn_module: Module = as_module(nn) if nn is not None else MLP(z_dim)
        self.nn_prior = nn_prior
        self.kernel_dim = z_dim
        self.data_dim = (input_dim,) if isinstance(input_dim, int) else tuple(input_dim)
        self.latent_prior = latent_prior
        self.guide_type = AutoNormal if guide == "normal" else AutoDelta
        self.kernel_params: Optional[Dict] = None
        self.nn_params: Optional[Dict] = None
        self.loss = None

    # ------------------------------------------------------------------ model

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        if self.nn_prior:  # MAP over NN weights
            feature_extractor = random_module(
                "feature_extractor", self.nn_module, (1, *self.data_dim)
            )
        else:  # MLE
            feature_extractor = module_param(
                "feature_extractor", self.nn_module, (1, *self.data_dim)
            )
        z = feature_extractor(X)
        if self.latent_prior:
            z = self.latent_prior(z)
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        noise = self._sample_noise()
        f_loc = jnp.zeros(z.shape[0])
        k = self.kernel(z, z, kernel_params, noise, **kwargs)
        ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k), obs=y)

    # -------------------------------------------------------------------- fit

    def single_fit(self, rng_key, X: jnp.ndarray, y: jnp.ndarray,
                   num_steps: int = 1000, step_size: float = 5e-3,
                   print_summary: bool = True, progress_bar: bool = True,
                   **kwargs) -> Tuple[Dict, Dict, jnp.ndarray]:
        """One SVI fit; returns (nn_params, kernel_params, losses)."""
        optim = optax.adam(learning_rate=step_size, b1=0.5)
        svi = SVI(self.model, self.guide_type(self.model), optim, Trace_ELBO())
        result = svi.run(rng_key, num_steps, X, y, progress_bar=progress_bar, **kwargs)
        if self.nn_prior:
            params_map = svi.guide.median(result.params)
            nn_params = get_haiku_dict(params_map)
            kernel_params = {
                k: v for k, v in params_map.items()
                if not k.startswith("feature_extractor")
            }
        else:
            nn_params = result.params["feature_extractor$params"]
            kernel_params = svi.guide.median(result.params)
        return nn_params, kernel_params, result.losses

    def fit(self, rng_key, X: jnp.ndarray, y: jnp.ndarray,
            num_steps: int = 1000, step_size: float = 5e-3,
            print_summary: bool = True, progress_bar: bool = True, **kwargs) -> None:
        """Fit; if y is 2-D (channels, n), the ENTIRE SVI fit is vmapped across
        channels in one compiled program (vidkl.py:181-196 semantics)."""
        X = jnp.asarray(X)
        y = jnp.asarray(y)
        self.X_train = X
        self.y_train = y

        if y.ndim == 2:
            def _single_fit(yi):
                return self.single_fit(
                    rng_key, X, yi, num_steps, step_size,
                    print_summary=False, progress_bar=False, **kwargs,
                )

            self.nn_params, self.kernel_params, self.loss = jax.vmap(_single_fit)(y)
            if progress_bar:
                tail = slice(num_steps - max(1, num_steps // 20), num_steps)
                print(
                    f"init loss: {self.loss[:, 0].mean():.4f}, "
                    f"final loss (avg): {self.loss.mean(0)[tail].mean():.4f}"
                )
        else:
            self.nn_params, self.kernel_params, self.loss = self.single_fit(
                rng_key, X, y, num_steps, step_size, print_summary, progress_bar,
                **kwargs,
            )
        if print_summary:
            self._print_summary()

    # ------------------------------------------------------------- prediction

    def get_mvn_posterior(self, X_new: jnp.ndarray, nn_params: Dict,
                          k_params: Dict, noiseless: bool = False,
                          y_residual: Optional[jnp.ndarray] = None, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if y_residual is None:
            y_residual = self.y_train
        noise = k_params["noise"]
        noise_p = noise * (1 - jnp.asarray(noiseless, int))
        z_train = self.nn_module.apply(nn_params, self.X_train)
        z_new = self.nn_module.apply(nn_params, X_new)
        k_pp = self.kernel(z_new, z_new, k_params, noise_p, **kwargs)
        k_pX = self.kernel(z_new, z_train, k_params, jitter=0.0)
        k_XX = self.kernel(z_train, z_train, k_params, noise, **kwargs)
        return gp_predictive_moments(k_XX, k_pX, k_pp, y_residual)

    def sample_from_posterior(self, rng_key, X_new: jnp.ndarray, n: int = 1000,
                              noiseless: bool = False, **kwargs
                              ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if self.y_train.ndim > 1:
            raise NotImplementedError("Currently does not support a multi-channel regime")
        y_mean, K = self.get_mvn_posterior(
            X_new, self.nn_params, self.kernel_params, noiseless, **kwargs
        )
        return y_mean, mvn_sample_from_cov(rng_key, y_mean, K, n)

    def get_samples(self) -> Tuple[Dict, Dict]:
        """(nn weights, kernel hyperparameters)."""
        return self.nn_params, self.kernel_params

    def predict(self, rng_key, X_new: jnp.ndarray,
                params: Optional[Tuple[Dict, Dict]] = None,
                noiseless: bool = False, *args, **kwargs
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, variance) at X_new; multi-channel targets vmap the posterior
        over the channel axis (vidkl.py:302-310)."""
        X_new = jnp.asarray(X_new)
        if params is None:
            nn_params, k_params = self.nn_params, self.kernel_params
        else:
            nn_params, k_params = params

        def builder():
            def impl(Xn, pp):
                nn_p, k_p = pp
                if self.y_train.ndim == 2:
                    def single(nn_pi, k_pi, yi):
                        mean, cov = self.get_mvn_posterior(
                            Xn, nn_pi, k_pi, noiseless, yi, **kwargs)
                        return mean, cov.diagonal()

                    return jax.vmap(single)(nn_p, k_p, self.y_train)
                mean, cov = self.get_mvn_posterior(
                    Xn, nn_p, k_p, noiseless, **kwargs)
                return mean, cov.diagonal()

            return jax.jit(impl)

        # compiled + cached (see ExactGP._cached_program): un-jitted prediction
        # dispatches op-by-op, a device round trip each through a TPU tunnel
        prog = self._cached_program(
            "vidkl_predict", builder, X_new, (nn_params, k_params),
            (noiseless,), kwargs)
        return prog(X_new, (nn_params, k_params))

    def predict_in_batches(self, rng_key, X_new: jnp.ndarray, batch_size: int = 100,
                           params: Optional[Tuple[Dict, Dict]] = None,
                           noiseless: bool = False, **kwargs
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        def _fn(xi):
            return self.predict(rng_key, xi, params, noiseless=noiseless, **kwargs)

        cat_dim = 1 if self.y_train.ndim == 2 else 0
        mean, var = self._predict_in_batches(
            rng_key, X_new, batch_size, 0, params, predict_fn=_fn,
        )
        return jnp.concatenate(mean, cat_dim), jnp.concatenate(var, cat_dim)

    def fit_predict(self, rng_key, X: jnp.ndarray, y: jnp.ndarray, X_new: jnp.ndarray,
                    num_steps: int = 1000, step_size: float = 5e-3,
                    n_models: int = 1, batch_size: int = 100,
                    noiseless: bool = False, ensemble_method: str = "vectorized",
                    print_summary: bool = True, progress_bar: bool = True, **kwargs
                    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fit + predict, optionally as an ensemble: 'vectorized' vmaps the models,
        'parallel' additionally shards the model axis across the device mesh."""
        if n_models > 1 and ensemble_method not in ("vectorized", "parallel"):
            raise ValueError("ensemble_method must be 'vectorized' or 'parallel'")

        X = jnp.asarray(X)
        y = jnp.asarray(y)
        X_new = jnp.asarray(X_new)
        self.X_train, self.y_train = X, y

        def single_fit_predict(key):
            nn_p, k_p, losses = self.single_fit(
                key, X, y, num_steps, step_size,
                print_summary=False, progress_bar=False, **kwargs,
            )
            mean, cov = self.get_mvn_posterior(X_new, nn_p, k_p, noiseless, **kwargs)
            return mean, cov.diagonal()

        keys = jax.random.split(rng_key, n_models)
        if n_models > 1:
            fn = jax.jit(jax.vmap(single_fit_predict))
            if ensemble_method == "parallel" and len(jax.devices()) > 1:
                n_dev = min(len(jax.devices()), n_models)
                while n_models % n_dev:
                    n_dev -= 1
                mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("models",))
                keys = jax.device_put(keys, NamedSharding(mesh, P("models")))
            mean, var = fn(keys)
        else:
            self.fit(keys[0], X, y, num_steps, step_size, print_summary,
                     progress_bar, **kwargs)
            mean, var = self.predict_in_batches(
                keys[0], X_new, batch_size, None, noiseless, **kwargs
            )
        return mean, var

    def embed(self, X_new: jnp.ndarray) -> jnp.ndarray:
        """Embed X_new with the trained feature extractor(s)."""
        X_new = jnp.asarray(X_new)

        def single_embed(nn_p, x):
            return self.nn_module.apply(nn_p, x)

        if self.y_train is not None and self.y_train.ndim == 2:
            return jax.jit(jax.vmap(lambda p: single_embed(p, X_new)))(self.nn_params)
        return jax.jit(single_embed)(self.nn_params, X_new)

    def _print_summary(self) -> None:
        if isinstance(self.kernel_params, dict):
            print("\nInferred GP kernel parameters")
            for k, vals in self.kernel_params.items():
                print(f"{k:<16}", jnp.around(vals, 4))
