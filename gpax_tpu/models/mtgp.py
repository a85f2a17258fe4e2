"""Multi-task / multi-fidelity GP with a linear model of coregionalization.

Parity surface: gpax/models/mtgp.py:19-207 — LCM kernel over latent GPs;
``shared_input_space`` toggles Kronecker (MultivariateKernel) vs indexed
(MultitaskKernel) form; task count inferred from the last input column when not
given; rank defaults to num_tasks − 1; W ~ Normal(0, 10), v ~ LogNormal(0, 1)
under a latent plate; per-task LogNormal noise; ``output_scale=False`` by default
(scale is absorbed into the task kernel).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as onp

from .. import distributions as dist
from .. import ppl
from ..kernels import LCMKernel
from .gp import ExactGP


class MultiTaskGP(ExactGP):
    """HMC multi-task GP over an LCM kernel."""

    _exact_moments_ok = False
    _default_dense_mass = True  # correlated ICM (W, v) posterior: see ExactGP._default_dense_mass

    def __init__(self, input_dim: int, data_kernel="RBF",
                 num_latents: Optional[int] = None, shared_input_space: bool = False,
                 num_tasks: Optional[int] = None, rank: Optional[int] = None,
                 mean_fn: Optional[Callable] = None,
                 data_kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_prior: Optional[Callable] = None,
                 noise_prior_dist: Optional[dist.Distribution] = None,
                 lengthscale_prior_dist: Optional[dist.Distribution] = None,
                 W_prior_dist: Optional[dist.Distribution] = None,
                 v_prior_dist: Optional[dist.Distribution] = None,
                 output_scale: bool = False, **kwargs) -> None:
        super().__init__(input_dim, None, mean_fn, None, mean_fn_prior, noise_prior)
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
        self.data_kernel_name = data_kernel if isinstance(data_kernel, str) else None
        self.data_kernel_prior = data_kernel_prior
        self.noise_prior_dist = noise_prior_dist
        self.lengthscale_prior_dist = lengthscale_prior_dist
        self.W_prior_dist = W_prior_dist
        self.v_prior_dist = v_prior_dist
        self.shared_input = shared_input_space
        self.output_scale = output_scale

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        if self.shared_input:
            f_loc = jnp.zeros(self.num_tasks * X.shape[0])
        else:
            f_loc = jnp.zeros(X.shape[0])
        if not self.shared_input and self.num_tasks is None:
            self.num_tasks = len(onp.unique(onp.asarray(self.X_train[:, -1])))
        if self.rank is None:
            self.rank = self.num_tasks - 1

        if self.data_kernel_prior:
            data_kernel_params = self.data_kernel_prior()
        else:
            data_kernel_params = self._sample_kernel_params()
        task_kernel_params = self._sample_task_kernel_params()
        kernel_params = {**data_kernel_params, **task_kernel_params}

        if self.noise_prior:
            noise = self.noise_prior()
        else:
            noise = self._sample_noise()

        k = self.kernel(X, X, kernel_params, noise, **kwargs)
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
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
        length_dist = self.lengthscale_prior_dist
        if length_dist is None:
            length_dist = dist.LogNormal(0.0, 1.0)
        with ppl.plate("latent_plate_data", self.num_latents):
            with ppl.plate("ard", self.kernel_dim):
                length = ppl.sample("k_length", length_dist)
            if self.output_scale:
                scale = ppl.sample("k_scale", dist.LogNormal(0.0, 1.0))
            else:
                scale = ppl.deterministic("k_scale", jnp.ones(self.num_latents))
            period = (
                ppl.sample("period", dist.LogNormal(0.0, 1.0))
                if self.data_kernel_name == "Periodic" else None
            )
        return {
            "k_length": squeezer(length),
            "k_scale": squeezer(scale),
            "period": squeezer(period) if self.data_kernel_name == "Periodic" else None,
        }
