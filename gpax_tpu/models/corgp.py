"""Coregionalized GP (single-latent ICM).

Parity surface: gpax/models/corgp.py:19-113 — MultitaskKernel with task indices in
the last input column; rank defaults to 1; W ~ Normal(0, 10), v ~ LogNormal(0, 1);
per-task LogNormal noise; data kernel sampled without an output scale.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax.numpy as jnp
import numpy as onp

from .. import distributions as dist
from .. import ppl
from ..kernels import MultitaskKernel
from .gp import ExactGP


class CoregGP(ExactGP):
    """Simple coregionalized multi-task GP."""

    _exact_moments_ok = False
    _default_dense_mass = True  # correlated ICM (W, v) posterior: see ExactGP._default_dense_mass

    def __init__(self, input_dim: int, data_kernel="RBF",
                 mean_fn: Optional[Callable] = None,
                 data_kernel_prior: Optional[Callable] = None,
                 mean_fn_prior: Optional[Callable] = None,
                 noise_prior: Optional[Callable] = None,
                 task_kernel_prior: Optional[Callable] = None,
                 rank: int = 1, **kwargs) -> None:
        super().__init__(input_dim, None, mean_fn, None, mean_fn_prior, noise_prior)
        self.num_tasks: Optional[int] = None
        self.rank = rank
        self.kernel = MultitaskKernel(data_kernel, **kwargs)
        self.data_kernel_prior = data_kernel_prior
        self.task_kernel_prior = task_kernel_prior
        self.kernel_name = data_kernel if isinstance(data_kernel, str) else None

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        import jax as _jax

        # task count is inferred on the first (concrete) model trace only; under
        # jit the inputs are tracers and the cached value is reused
        if not isinstance(X, _jax.core.Tracer):
            # convert to host numpy BEFORE slicing: inside a jit trace even ops on
            # concrete closure constants are staged out as tracers
            self.num_tasks = len(onp.unique(onp.asarray(X)[:, -1]))
        f_loc = jnp.zeros(X.shape[0])
        if self.data_kernel_prior:
            data_kernel_params = self.data_kernel_prior()
        else:
            data_kernel_params = self._sample_kernel_params(output_scale=False)
        if self.task_kernel_prior:
            task_kernel_params = self.task_kernel_prior()
        else:
            task_kernel_params = self._sample_task_kernel_params(self.num_tasks, self.rank)
        kernel_params = {**data_kernel_params, **task_kernel_params}
        if self.noise_prior:
            noise = self.noise_prior()
        else:
            noise = ppl.sample(
                "noise",
                dist.LogNormal(jnp.zeros(self.num_tasks), jnp.ones(self.num_tasks)).to_event(1),
            )
        k = self.kernel(X, X, kernel_params, noise)
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
        ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k), obs=y)

    def _sample_task_kernel_params(self, n_tasks: int, rank: int) -> Dict[str, jnp.ndarray]:
        W = ppl.sample(
            "W",
            dist.Normal(jnp.zeros((n_tasks, rank)), 10 * jnp.ones((n_tasks, rank))).to_event(2),
        )
        v = ppl.sample(
            "v", dist.LogNormal(jnp.zeros((n_tasks,)), jnp.ones((n_tasks,))).to_event(1)
        )
        return {"W": W, "v": v}
