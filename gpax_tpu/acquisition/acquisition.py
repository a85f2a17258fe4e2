"""User-facing acquisition functions (HMC-averaged or MAP).

Parity surface: gpax/acquisition/acquisition.py:22-524 — ``EI/UCB/POI/UE`` flatten
all HMC-sample predictions into one (mean, var) pair when ``model.mcmc`` is set
(Bayesian-averaged acquisition), else use the MAP predictive; optional penalties
are subtracted; ``KG`` vmaps the fantasy knowledge gradient over HMC samples;
``Thompson`` draws one posterior sample (HMC) or samples the MAP posterior.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax.numpy as jnp
import jax.random as jra
import numpy as onp
from jax import vmap

from .base_acq import ei, kg, poi, ucb, ue
from .penalties import compute_penalty


def _compute_mean_and_var(rng_key, model, X, n, noiseless, **kwargs
                          ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Predictive moments of the fully-Bayesian mixture.

    The reference estimates these by drawing n MVN function samples per HMC draw
    and flattening (acquisition.py:22-35) — O(S·(n³+m³)) and stochastic.  When the
    model provides exact closed-form mixture moments (``predict_moments``), use
    them: same quantity, deterministic, O(S·n²·m)."""
    if getattr(model, "mcmc", None) is not None:
        if getattr(model, "_exact_moments_ok", False) and hasattr(model, "predict_moments"):
            return model.predict_moments(rng_key, X, noiseless=noiseless, **kwargs)
        _, y_sampled = model.predict(rng_key, X, n=n, noiseless=noiseless, **kwargs)
        y_sampled = y_sampled.reshape(-1, y_sampled.shape[-1])
        return y_sampled.mean(0), y_sampled.var(0)
    mean, var = model.predict(rng_key, X, noiseless=noiseless, **kwargs)
    return mean, var


def _compute_penalties(X, recent_points, penalty, penalty_factor, grid_indices):
    X_ = grid_indices if grid_indices is not None else X
    return compute_penalty(X_, recent_points, penalty, penalty_factor)


def _check_penalty(penalty, recent_points):
    if penalty and not isinstance(recent_points, (onp.ndarray, jnp.ndarray)):
        raise ValueError("Please provide an array of recently visited points")


def EI(rng_key, model, X: jnp.ndarray, best_f: Optional[float] = None,
       maximize: bool = False, n: int = 1, noiseless: bool = False,
       penalty: Optional[str] = None, recent_points: Optional[jnp.ndarray] = None,
       grid_indices: Optional[jnp.ndarray] = None, penalty_factor: float = 1.0,
       **kwargs) -> jnp.ndarray:
    """Expected Improvement (HMC-averaged when the model is fully Bayesian)."""
    _check_penalty(penalty, recent_points)
    X = X[:, None] if X.ndim < 2 else X
    moments = _compute_mean_and_var(rng_key, model, X, n, noiseless, **kwargs)
    acq = ei(moments, best_f, maximize)
    if penalty:
        acq -= _compute_penalties(X, recent_points, penalty, penalty_factor, grid_indices)
    return acq


def UCB(rng_key, model, X: jnp.ndarray, beta: float = 0.25,
        maximize: bool = False, n: int = 1, noiseless: bool = False,
        penalty: Optional[str] = None, recent_points: Optional[jnp.ndarray] = None,
        grid_indices: Optional[jnp.ndarray] = None, penalty_factor: float = 1.0,
        **kwargs) -> jnp.ndarray:
    """Upper confidence bound."""
    _check_penalty(penalty, recent_points)
    X = X[:, None] if X.ndim < 2 else X
    moments = _compute_mean_and_var(rng_key, model, X, n, noiseless, **kwargs)
    acq = ucb(moments, beta, maximize)
    if penalty:
        acq -= _compute_penalties(X, recent_points, penalty, penalty_factor, grid_indices)
    return acq


def POI(rng_key, model, X: jnp.ndarray, best_f: Optional[float] = None,
        xi: float = 0.01, maximize: bool = False, n: int = 1,
        noiseless: bool = False, penalty: Optional[str] = None,
        recent_points: Optional[jnp.ndarray] = None,
        grid_indices: Optional[jnp.ndarray] = None, penalty_factor: float = 1.0,
        **kwargs) -> jnp.ndarray:
    """Probability of improvement."""
    _check_penalty(penalty, recent_points)
    X = X[:, None] if X.ndim < 2 else X
    moments = _compute_mean_and_var(rng_key, model, X, n, noiseless, **kwargs)
    acq = poi(moments, best_f, xi, maximize)
    if penalty:
        acq -= _compute_penalties(X, recent_points, penalty, penalty_factor, grid_indices)
    return acq


def UE(rng_key, model, X: jnp.ndarray, n: int = 1, noiseless: bool = False,
       penalty: Optional[str] = None, recent_points: Optional[jnp.ndarray] = None,
       grid_indices: Optional[jnp.ndarray] = None, penalty_factor: float = 1.0,
       **kwargs) -> jnp.ndarray:
    """Uncertainty-based exploration (pure exploration)."""
    _check_penalty(penalty, recent_points)
    X = X[:, None] if X.ndim < 2 else X
    moments = _compute_mean_and_var(rng_key, model, X, n, noiseless, **kwargs)
    acq = ue(moments)
    if penalty:
        acq -= _compute_penalties(X, recent_points, penalty, penalty_factor, grid_indices)
    return acq


def KG(rng_key, model, X: jnp.ndarray, n: int = 1, maximize: bool = False,
       noiseless: bool = False, penalty: Optional[str] = None,
       recent_points: Optional[jnp.ndarray] = None,
       grid_indices: Optional[jnp.ndarray] = None, penalty_factor: float = 1.0,
       **kwargs) -> jnp.ndarray:
    """Knowledge gradient: MAP models evaluate once; HMC models vmap the fantasy
    KG over every posterior sample (acquisition.py:397-485)."""
    _check_penalty(penalty, recent_points)
    X = X[:, None] if X.ndim < 2 else X
    samples = model.get_samples()
    if getattr(model, "mcmc", None) is None:
        acq = kg(model, X, samples, rng_key, n, maximize, noiseless, **kwargs)
    else:
        keys = jra.split(rng_key, num=len(next(iter(samples.values()))))
        vec_kg = vmap(
            lambda s, k: kg(model, X, s, k, n, maximize, noiseless, **kwargs)
        )
        acq = vec_kg(samples, keys)
    if penalty:
        acq -= _compute_penalties(X, recent_points, penalty, penalty_factor, grid_indices)
    return acq


def Thompson(rng_key, model, X: jnp.ndarray, n: int = 1,
             noiseless: bool = False, **kwargs) -> jnp.ndarray:
    """Thompson sampling: one random HMC sample's function draw, or a function
    sampled from the MAP posterior (acquisition.py:488-524)."""
    if getattr(model, "mcmc", None) is not None:
        posterior_samples = model.get_samples()
        idx = jra.randint(rng_key, (1,), 0, len(posterior_samples["k_length"]))
        samples = {k: v[idx] for k, v in posterior_samples.items()}
        _, tsample = model.predict(rng_key, X, samples, n, noiseless=noiseless, **kwargs)
        if n > 1:
            tsample = tsample.mean(1).squeeze()
    else:
        _, tsample = model.sample_from_posterior(rng_key, X, n=1,
                                                 noiseless=noiseless, **kwargs)
    return tsample
