"""Multi-task / coregionalization kernels.

Parity surface: gpax/kernels/mtkernels.py:24-233 — ``index_kernel`` (ICM task
covariance B = WWᵀ + diag(v)), ``MultitaskKernel`` (task index carried as the last
input column, elementwise data·task product, per-task noise), ``MultivariateKernel``
(shared input space, Kronecker product with block-diagonal per-task noise), and
``LCMKernel`` (sum over latent GPs, vmapped over the leading latent axis of params).

TPU notes: the Kronecker products are built with ``jnp.kron`` (a reshape+broadcast
XLA pattern that fuses well); per-task noise uses gather + scatter-add on the
diagonal rather than materializing dense noise matrices where possible.
"""

from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp
from jax import vmap

from .kernels import get_kernel

kernel_fn_type = Callable[..., jnp.ndarray]


def get_in_axes(data: Dict) -> tuple:
    """vmap in_axes for LCM: every parameter has a leading latent axis except the
    (shared) noise."""
    return ({key: (0 if key != "noise" else None) for key in data.keys()},)


def index_kernel(indices1: jnp.ndarray, indices2: jnp.ndarray,
                 params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
    """Task covariance gathered at index pairs: B[i, j] with B = W Wᵀ + diag(v).

    params: 'W' (num_tasks, rank), 'v' (num_tasks,).
    """
    W = params["W"]
    v = params["v"]
    # f32 rule 1 (CLAUDE.md): default-precision TPU matmul truncates W to bf16,
    # quantizing the likelihood surface in W — poison for NUTS step adaptation.
    B = jnp.dot(W, W.T, precision=jax.lax.Precision.HIGHEST) + jnp.diag(v)
    return B[jnp.ix_(indices1, indices2)]


def MultitaskKernel(base_kernel, **kwargs1) -> kernel_fn_type:
    """ICM kernel for tasks with *different* input points: the task index rides in
    the last column of X/Z; K = k_data(x, z) ⊙ k_task(i, j), with the per-task
    noise vector gathered onto the diagonal."""
    data_kernel = get_kernel(base_kernel, **kwargs1)

    def multi_task_kernel(X, Z, params, noise=0, **kwargs2):
        X_data, idx_X = X[:, :-1], X[:, -1].astype(int)
        Z_data, idx_Z = Z[:, :-1], Z[:, -1].astype(int)
        k_data = data_kernel(X_data, Z_data, params, 0, **kwargs2)
        k_task = index_kernel(idx_X, idx_Z, params)
        K = k_data * k_task
        if X.shape == Z.shape:
            jitter = kwargs2.get("jitter", 1e-6)
            noise_vec = jnp.atleast_1d(jnp.asarray(noise, dtype=K.dtype))
            if noise_vec.shape[0] == 1:
                sample_noise = jnp.broadcast_to(noise_vec, idx_X.shape)
            else:
                sample_noise = noise_vec[idx_X]
            diag = jnp.arange(K.shape[0])
            K = K.at[diag, diag].add(sample_noise + jitter)
        return K

    return multi_task_kernel


def MultivariateKernel(base_kernel, num_tasks: int, **kwargs1) -> kernel_fn_type:
    """Multi-output kernel for tasks sharing the same inputs:
    K = kron(k_data, k_task), per-task noise on the block diagonal."""
    data_kernel = get_kernel(base_kernel, **kwargs1)

    def multivariate_kernel(X, Z, params, noise=0, **kwargs2):
        task_labels = jnp.arange(num_tasks)
        k_data = data_kernel(X, Z, params, 0, **kwargs2)
        k_task = index_kernel(task_labels, task_labels, params)
        K = jnp.kron(k_data, k_task)
        if X.shape == Z.shape:
            jitter = kwargs2.get("jitter", 1e-6)
            noise_vec = jnp.broadcast_to(
                jnp.atleast_1d(jnp.asarray(noise, dtype=K.dtype)), (num_tasks,)
            )
            # diagonal of kron(I_n, diag(noise)) == tile(noise, n)
            diag = jnp.arange(K.shape[0])
            K = K.at[diag, diag].add(jnp.tile(noise_vec + jitter, k_data.shape[0]))
        return K

    return multivariate_kernel


def LCMKernel(base_kernel, shared_input_space: bool = True, num_tasks: int = None,
              **kwargs1) -> kernel_fn_type:
    """Linear model of coregionalization: sum of ``num_latents`` ICM kernels, the
    latent axis vmapped over the leading dimension of every param except noise."""
    if shared_input_space:
        multi_kernel = MultivariateKernel(base_kernel, num_tasks, **kwargs1)
    else:
        multi_kernel = MultitaskKernel(base_kernel, **kwargs1)

    def lcm_kernel(X, Z, params, noise=0, **kwargs2):
        axes = get_in_axes(params)
        k = vmap(lambda p: multi_kernel(X, Z, p, noise, **kwargs2), in_axes=axes)(params)
        return k.sum(0)

    return lcm_kernel
