"""Fully Bayesian deep kernel learning (HMC over NN weights + GP hyperparameters).

Parity surface: gpax/models/dkl.py:22-193 — tanh MLP feature extractor with
Normal-weight / Cauchy-bias priors, GP on the embedding with kernel_dim = z_dim,
``embed`` vmapping the NN over posterior samples.  Default hidden dims [64, 32].
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp

from .. import distributions as dist
from .. import ppl
from ..ops.linalg import gp_predictive_moments
from .gp import ExactGP


def sample_weights(name: str, in_channels: int, out_channels: int) -> jnp.ndarray:
    """Normal(0,1) prior over a weight matrix."""
    return ppl.sample(
        name,
        dist.Normal(jnp.zeros((in_channels, out_channels)),
                    jnp.ones((in_channels, out_channels))).to_event(2),
    )


def sample_biases(name: str, channels: int) -> jnp.ndarray:
    """Cauchy(0,1) prior over a bias vector."""
    return ppl.sample(
        name, dist.Cauchy(jnp.zeros((channels,)), jnp.ones((channels,))).to_event(1)
    )


def get_mlp(architecture: List[int]) -> Callable:
    """tanh MLP taking a flat params dict {'w0','b0',...} (one HMC sample)."""

    def mlp(X: jnp.ndarray, params: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        h = X
        for i in range(len(architecture)):
            h = jnp.tanh(
                jnp.dot(h, params[f"w{i}"], precision=jax.lax.Precision.HIGHEST)
                + params[f"b{i}"]
            )
        return (
            jnp.dot(h, params[f"w{len(architecture)}"], precision=jax.lax.Precision.HIGHEST)
            + params[f"b{len(architecture)}"]
        )

    return mlp


def get_mlp_prior(input_dim: int, output_dim: int, architecture: List[int]) -> Callable:
    """Prior program over all MLP weights/biases."""

    def mlp_prior() -> Dict[str, jnp.ndarray]:
        params = {}
        c_in = input_dim
        for i, c_out in enumerate(architecture):
            params[f"w{i}"] = sample_weights(f"w{i}", c_in, c_out)
            params[f"b{i}"] = sample_biases(f"b{i}", c_out)
            c_in = c_out
        params[f"w{len(architecture)}"] = sample_weights(f"w{len(architecture)}", c_in, output_dim)
        params[f"b{len(architecture)}"] = sample_biases(f"b{len(architecture)}", output_dim)
        return params

    return mlp_prior


class DKL(ExactGP):
    """HMC-trained deep kernel learning: GP over a Bayesian-MLP embedding."""

    _exact_moments_ok = False  # posterior uses the NN embedding

    def __init__(self, input_dim: int, z_dim: int = 2, kernel="RBF",
                 kernel_prior: Optional[Callable] = None,
                 nn: Optional[Callable] = None,
                 nn_prior: Optional[Callable] = None,
                 latent_prior: Optional[Callable] = None,
                 hidden_dim: Optional[List[int]] = None, **kwargs) -> None:
        super().__init__(input_dim, kernel, None, kernel_prior, **kwargs)
        hdim = hidden_dim if hidden_dim is not None else [64, 32]
        self.nn = nn if nn else get_mlp(hdim)
        self.nn_prior = nn_prior if nn_prior else get_mlp_prior(input_dim, z_dim, hdim)
        self.kernel_dim = z_dim
        self.latent_prior = latent_prior

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None, **kwargs) -> None:
        """BNN embedding -> GP likelihood (structure: gpax/models/dkl.py:83-111)."""
        jitter = kwargs.get("jitter", 1e-6)
        nn_params = self.nn_prior()
        z = self.nn(X, nn_params)
        if self.latent_prior:
            z = self.latent_prior(z)
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        noise = self._sample_noise()
        f_loc = jnp.zeros(z.shape[0])
        k = self.kernel(z, z, kernel_params, noise, jitter=jitter)
        ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k), obs=y)

    def get_mvn_posterior(self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                          noiseless: bool = False, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Embed train/test with the sampled NN weights, then Cholesky-solve GP
        posterior (replaces the inv at gpax/models/dkl.py:134-140)."""
        noise = params["noise"]
        noise_p = noise * (1 - jnp.asarray(noiseless, int))
        z_train = self.nn(self.X_train, params)
        z_new = self.nn(X_new, params)
        k_pp = self.kernel(z_new, z_new, params, noise_p, **kwargs)
        k_pX = self.kernel(z_new, z_train, params, jitter=0.0)
        k_XX = self.kernel(z_train, z_train, params, noise, **kwargs)
        return gp_predictive_moments(k_XX, k_pX, k_pp, self.y_train)

    def embed(self, X_new: jnp.ndarray) -> jnp.ndarray:
        """Latent embeddings of X_new under every posterior NN sample."""
        samples = self.get_samples(chain_dim=False)
        X_new = self._set_data(X_new)
        return jax.jit(jax.vmap(lambda p: self.nn(X_new, p)))(samples)

    def _print_summary(self) -> None:
        from ..infer import diagnostics

        keep = ("k_scale", "k_length", "noise", "period")
        samples = self.get_samples(chain_dim=True)
        diagnostics.print_summary({k: v for k, v in samples.items() if k in keep})
