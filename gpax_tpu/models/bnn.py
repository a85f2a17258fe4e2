"""Fully Bayesian MLP regression (sPM specialization).

Parity surface: gpax/models/bnn.py:19-81 — tanh MLP with Normal-weight /
Cauchy-bias priors, default hidden dims [64, 32], 2-D target handling.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional, Tuple, Union

import jax.numpy as jnp

from .dkl import get_mlp, get_mlp_prior, sample_biases, sample_weights
from .spm import sPM


class BNN(sPM):
    """Fully Bayesian MLP."""

    def __init__(self, input_dim: int, output_dim: int,
                 noise_prior_dist: Optional[Callable] = None,
                 hidden_dim: Optional[List[int]] = None, **kwargs):
        hidden_dim = [64, 32] if not hidden_dim else hidden_dim
        nn = kwargs.get("nn", get_mlp(hidden_dim))
        nn_prior = kwargs.get("nn_prior", get_mlp_prior(input_dim, output_dim, hidden_dim))
        super().__init__(nn, nn_prior, None, noise_prior_dist)

    def _set_data(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None
                  ) -> Union[Tuple[jnp.ndarray, jnp.ndarray], jnp.ndarray]:
        X = X if X.ndim > 1 else X[:, None]
        if y is not None:
            y = y[:, None] if y.ndim < 2 else y
            return X, y
        return X


__all__ = ["BNN", "get_mlp", "get_mlp_prior", "sample_weights", "sample_biases"]
