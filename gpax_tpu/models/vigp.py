"""Variational-inference GP (MAP or mean-field posterior).

Parity surface: gpax/models/vigp.py:26-192 — same constructor (guide='delta'|'normal'),
``fit(rng_key, X, y, num_steps, step_size)`` with Adam(b1=0.5), ``get_samples()``
returning the guide median, ``predict`` returning (mean, variance-diagonal).

TPU-native: the entire SVI loop is one jitted ``lax.scan`` (vs numpyro's Python
step loop), and prediction is a single Cholesky-solve program.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import optax

from .. import distributions as dist
from ..infer import SVI, AutoDelta, AutoNormal, Trace_ELBO
from .gp import ExactGP


class viGP(ExactGP):
    """GP with variational inference: 'delta' guide = MAP, 'normal' = mean-field."""

    def __init__(self, input_dim: int, kernel="RBF",
                 mean_fn: Optional[Callable] = None,
                 kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_prior: Optional[Callable] = None,
                 noise_prior_dist: Optional[dist.Distribution] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None,
                 guide: str = "delta") -> None:
        super().__init__(input_dim, kernel, mean_fn, kernel_prior, mean_fn_prior,
                         noise_prior, noise_prior_dist, lengthscale_prior_dist)
        self.guide_type = AutoNormal if guide == "normal" else AutoDelta
        self.svi: Optional[SVI] = None
        self.kernel_params: Optional[Dict] = None
        self.loss: Optional[jnp.ndarray] = None
        self._restored_median: Optional[Dict] = None  # set by checkpoint restore

    def fit(self, rng_key, X: jnp.ndarray, y: jnp.ndarray,
            num_steps: int = 1000, step_size: float = 5e-3,
            progress_bar: bool = True, print_summary: bool = True,
            device=None, **kwargs) -> None:
        """Optimize the ELBO for ``num_steps`` Adam(lr=step_size, b1=0.5) steps,
        compiled as one scan (parity args: gpax/models/vigp.py:77-120)."""
        X, y = self._set_data(X, y)
        if device:
            X = jax.device_put(X, device)
            y = jax.device_put(y, device)
        self.X_train = X
        self.y_train = y

        optim = optax.adam(learning_rate=step_size, b1=0.5)
        self.svi = SVI(self.model, self.guide_type(self.model), optim, Trace_ELBO())
        result = self.svi.run(rng_key, num_steps, X, y, progress_bar=progress_bar, **kwargs)
        self.kernel_params = result.params
        self.loss = result.losses
        if print_summary:
            self._print_summary()

    def get_samples(self) -> Dict[str, jnp.ndarray]:
        """MAP / posterior-median point estimates from the guide."""
        if self.svi is None and self._restored_median is not None:
            return self._restored_median
        return self.svi.guide.median(self.kernel_params)

    def predict(self, rng_key, X_new: jnp.ndarray,
                samples: Optional[Dict[str, jnp.ndarray]] = None,
                noiseless: bool = False, device=None, **kwargs
                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (predictive mean, predictive variance diagonal) under the point
        estimate (parity: gpax/models/vigp.py:153-185)."""
        X_new = self._set_data(X_new)
        if device:
            self._set_training_data(device=device)
            X_new = jax.device_put(X_new, device)
        if samples is None:
            samples = self.get_samples()

        def builder():
            def impl(Xn, ss):
                mean, cov = self.get_mvn_posterior(Xn, ss, noiseless, **kwargs)
                return mean, cov.diagonal()

            return jax.jit(impl)

        # one compiled program per (shape, training-data) signature: un-jitted
        # execution dispatches op-by-op (a round trip each through a TPU
        # tunnel), and a fresh jit per call recompiles — see ExactGP._cached_program
        prog = self._cached_program(
            "vigp_predict", builder, X_new, samples, (noiseless,), kwargs)
        return prog(X_new, samples)

    def predict_in_batches(self, rng_key, X_new: jnp.ndarray, batch_size: int = 100,
                           samples: Optional[Dict[str, jnp.ndarray]] = None,
                           predict_fn: Optional[Callable] = None,
                           noiseless: bool = False, device=None, **kwargs
                           ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Chunked (mean, var) prediction over large grids."""
        def _fn(xi):
            return self.predict(rng_key, xi, samples, noiseless, **kwargs)

        y_pred, y_var = self._predict_in_batches(
            rng_key, X_new, batch_size, 0, samples, predict_fn=_fn,
            noiseless=noiseless, device=device, **kwargs,
        )
        return jnp.concatenate(y_pred, 0), jnp.concatenate(y_var, 0)

    def _print_summary(self) -> None:
        params_map = self.get_samples()
        print("\nInferred GP parameters")
        for k, vals in params_map.items():
            print(f"{k:<16}", jnp.around(vals, 4))
