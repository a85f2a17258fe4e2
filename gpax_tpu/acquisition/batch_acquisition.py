"""Batch-mode (q-) acquisition functions.

Parity surface: gpax/acquisition/batch_acquisition.py:21-282 — requires a fully
Bayesian model; draws ``subsample_size`` random posterior subsets and vmaps the
per-sample acquisition, giving a (q, |X|) array; optional ``maximize_distance``
re-draws ``n_evals`` times and keeps the draw whose argmax points are most spread.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax.numpy as jnp
import jax.random as jra
from jax import vmap

from ..utils import random_sample_dict
from .base_acq import ei, kg, poi, ucb


def _compute_batch_acquisition(rng_key, model, X: jnp.ndarray,
                               single_acq_fn: Callable,
                               maximize_distance: bool = False,
                               subsample_size: int = 1, n_evals: int = 10,
                               indices: Optional[jnp.ndarray] = None,
                               **kwargs) -> jnp.ndarray:
    if getattr(model, "mcmc", None) is None:
        raise ValueError("The model needs to be fully Bayesian")

    X = X[:, None] if X.ndim < 2 else X
    f = vmap(single_acq_fn, in_axes=(0, None))

    if not maximize_distance:
        samples = random_sample_dict(model.get_samples(), subsample_size, rng_key)
        return f(samples, X)

    X_ = jnp.asarray(indices) if indices is not None else jnp.asarray(X)

    def compute_acq_and_distance(subkey):
        samples = random_sample_dict(model.get_samples(), subsample_size, subkey)
        acq = f(samples, X_)
        points = acq.argmax(-1)
        d = jnp.linalg.norm(points).mean()
        return acq, d

    subkeys = jra.split(rng_key, num=n_evals)
    acq_all, dist_all = vmap(compute_acq_and_distance)(subkeys)
    return acq_all[dist_all.argmax()]


def qEI(rng_key, model, X: jnp.ndarray, best_f: Optional[float] = None,
        maximize: bool = False, noiseless: bool = False,
        maximize_distance: bool = False, subsample_size: int = 1,
        n_evals: int = 10, indices: Optional[jnp.ndarray] = None,
        **kwargs) -> jnp.ndarray:
    """Batch Expected Improvement over random posterior subsamples."""

    def single_acq(sample, X):
        mean, cov = model.get_mvn_posterior(X, sample, noiseless, **kwargs)
        return ei((mean, cov.diagonal()), best_f, maximize)

    return _compute_batch_acquisition(
        rng_key, model, X, single_acq, maximize_distance,
        subsample_size, n_evals, indices, **kwargs,
    )


def qUCB(rng_key, model, X: jnp.ndarray, beta: float = 0.25,
         maximize: bool = False, noiseless: bool = False,
         maximize_distance: bool = False, subsample_size: int = 1,
         n_evals: int = 10, indices: Optional[jnp.ndarray] = None,
         **kwargs) -> jnp.ndarray:
    """Batch upper confidence bound."""

    def single_acq(sample, X):
        mean, cov = model.get_mvn_posterior(X, sample, noiseless, **kwargs)
        return ucb((mean, cov.diagonal()), beta, maximize)

    return _compute_batch_acquisition(
        rng_key, model, X, single_acq, maximize_distance,
        subsample_size, n_evals, indices, **kwargs,
    )


def qPOI(rng_key, model, X: jnp.ndarray, best_f: Optional[float] = None,
         maximize: bool = False, noiseless: bool = False,
         maximize_distance: bool = False, subsample_size: int = 1,
         n_evals: int = 10, indices: Optional[jnp.ndarray] = None,
         **kwargs) -> jnp.ndarray:
    """Batch probability of improvement."""

    def single_acq(sample, X):
        mean, cov = model.get_mvn_posterior(X, sample, noiseless, **kwargs)
        return poi((mean, cov.diagonal()), best_f, maximize)

    return _compute_batch_acquisition(
        rng_key, model, X, single_acq, maximize_distance,
        subsample_size, n_evals, indices, **kwargs,
    )


def qKG(rng_key, model, X: jnp.ndarray, n: int = 1,
        maximize: bool = False, noiseless: bool = False,
        maximize_distance: bool = False, subsample_size: int = 1,
        n_evals: int = 10, indices: Optional[jnp.ndarray] = None,
        **kwargs) -> jnp.ndarray:
    """Batch knowledge gradient."""

    def single_acq(sample, X):
        return kg(model, X, sample, rng_key, n, maximize, noiseless, **kwargs)

    return _compute_batch_acquisition(
        rng_key, model, X, single_acq, maximize_distance,
        subsample_size, n_evals, indices, **kwargs,
    )
