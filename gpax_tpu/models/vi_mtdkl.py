"""Multi-task variational deep kernel learning.

Parity surface: gpax/models/vi_mtdkl.py:29-247 — the NN embeds the data columns,
the task index column is re-appended to the latent embedding; LCM kernel over
(z, task); per-task LogNormal noise ``to_event(1)``; task priors W ~ Normal(0,10),
v ~ LogNormal(0,1) under a latent plate; data-kernel output scale pinned at ~1 via
Normal(1, 1e-4).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as onp

from .. import distributions as dist
from .. import ppl
from ..kernels import LCMKernel
from ..nn.modules import module_param, random_module
from ..ops.linalg import gp_predictive_moments
from .vidkl import viDKL


class viMTDKL(viDKL):
    """Variational multi-task DKL over an LCM kernel."""

    def __init__(self, input_dim: int, z_dim: int = 2, data_kernel="RBF",
                 num_latents: Optional[int] = None, shared_input_space: bool = False,
                 num_tasks: Optional[int] = None, rank: Optional[int] = None,
                 data_kernel_prior: Optional[Callable] = None,
                 nn=None, nn_prior: bool = True, guide: str = "delta",
                 W_prior_dist: Optional[dist.Distribution] = None,
                 v_prior_dist: Optional[dist.Distribution] = None,
                 task_kernel_prior: Optional[Callable] = None, **kwargs) -> None:
        super().__init__(input_dim, z_dim, None, None, nn, nn_prior, None, guide, **kwargs)
        if shared_input_space:
            if num_tasks is None:
                raise ValueError("Please specify num_tasks")
        else:
            if num_latents is None:
                raise ValueError("Please specify num_latents")
        self.num_tasks = num_tasks
        self.num_latents = num_tasks if num_latents is None else num_latents
        self.rank = rank
        self.kernel = LCMKernel(data_kernel, shared_input_space, num_tasks, **kwargs)
        self.data_kernel_prior = data_kernel_prior
        self.task_kernel_prior = task_kernel_prior
        self.shared_input = shared_input_space
        self.W_prior_dist = W_prior_dist
        self.v_prior_dist = v_prior_dist

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        if not self.shared_input and self.num_tasks is None:
            self.num_tasks = len(onp.unique(onp.asarray(self.X_train[:, -1])))
        if self.rank is None:
            self.rank = self.num_tasks - 1

        if self.nn_prior:
            feature_extractor = random_module(
                "feature_extractor", self.nn_module, (1, *self.data_dim)
            )
        else:
            feature_extractor = module_param(
                "feature_extractor", self.nn_module, (1, *self.data_dim)
            )
        z = feature_extractor(X if self.shared_input else X[:, :-1])
        if not self.shared_input:
            z = jnp.column_stack((z, X[:, -1]))

        if self.shared_input:
            f_loc = jnp.zeros(self.num_tasks * X.shape[0])
        else:
            f_loc = jnp.zeros(X.shape[0])

        if self.data_kernel_prior:
            data_kernel_params = self.data_kernel_prior()
        else:
            data_kernel_params = self._sample_kernel_params()
        if self.task_kernel_prior:
            task_kernel_params = self.task_kernel_prior()
        else:
            task_kernel_params = self._sample_task_kernel_params()
        kernel_params = {**data_kernel_params, **task_kernel_params}

        if self.noise_prior:
            noise = self.noise_prior()
        else:
            noise = self._sample_noise()

        k = self.kernel(z, z, kernel_params, noise, **kwargs)
        ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k), obs=y)

    def _sample_noise(self) -> jnp.ndarray:
        noise_dist = self.noise_prior_dist
        if noise_dist is None:
            noise_dist = dist.LogNormal(
                jnp.zeros(self.num_tasks), jnp.ones(self.num_tasks)
            )
        return ppl.sample("noise", noise_dist.to_event(1))

    def _sample_task_kernel_params(self) -> Dict[str, jnp.ndarray]:
        W_dist = self.W_prior_dist
        if W_dist is None:
            W_dist = dist.Normal(
                jnp.zeros((self.num_latents, self.num_tasks, self.rank)),
                10 * jnp.ones((self.num_latents, self.num_tasks, self.rank)),
            )
        v_dist = self.v_prior_dist
        if v_dist is None:
            v_dist = dist.LogNormal(
                jnp.zeros((self.num_latents, self.num_tasks)),
                jnp.ones((self.num_latents, self.num_tasks)),
            )
        with ppl.plate("latent_plate_task", self.num_latents):
            W = ppl.sample("W", W_dist.to_event(2))
            v = ppl.sample("v", v_dist.to_event(1))
        return {"W": W, "v": v}

    def _sample_kernel_params(self) -> Dict[str, jnp.ndarray]:
        squeezer = (lambda x: x.squeeze()) if self.num_latents > 1 else (lambda x: x)
        with ppl.plate("latent_plate_data", self.num_latents):
            with ppl.plate("ard", self.kernel_dim):
                length = ppl.sample("k_length", dist.LogNormal(0.0, 1.0))
            # output scale pinned near 1 (absorbed into the task kernel)
            scale = ppl.sample("k_scale", dist.Normal(1.0, 1e-4))
        return {"k_length": squeezer(length), "k_scale": squeezer(scale)}

    def get_mvn_posterior(self, X_new: jnp.ndarray, nn_params: Dict,
                          k_params: Dict, noiseless: bool = False,
                          y_residual: Optional[jnp.ndarray] = None, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        if y_residual is None:
            y_residual = self.y_train
        noise = k_params["noise"]
        noise_p = noise * (1 - jnp.asarray(noiseless, int))
        X_tr = self.X_train if self.shared_input else self.X_train[:, :-1]
        X_te = X_new if self.shared_input else X_new[:, :-1]
        z_train = self.nn_module.apply(nn_params, X_tr)
        z_test = self.nn_module.apply(nn_params, X_te)
        if not self.shared_input:
            z_train = jnp.column_stack((z_train, self.X_train[:, -1]))
            z_test = jnp.column_stack((z_test, X_new[:, -1]))
        k_pp = self.kernel(z_test, z_test, k_params, noise_p, **kwargs)
        k_pX = self.kernel(z_test, z_train, k_params, jitter=0.0)
        k_XX = self.kernel(z_train, z_train, k_params, noise, **kwargs)
        return gp_predictive_moments(k_XX, k_pX, k_pp, y_residual)
