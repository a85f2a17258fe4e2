"""Hypothesis learning / active-learning driver (arXiv:2112.06649 workflow).

Parity surface: gpax/hypo.py:21-167 — ``step`` fits an sPM or structural-GP
hypothesis model, retrying up to ``num_restarts`` while any split-Gelman-Rubin
r-hat exceeds 1.1, and returns predictive variance over unmeasured points as the
reward signal; ``sample_next`` is the softmax / epsilon-greedy bandit policy;
``update_record`` maintains running rewards.
"""

from __future__ import annotations

from typing import Callable, Dict, Optional, Union

import jax.numpy as jnp
import numpy as np

from .infer.diagnostics import split_gelman_rubin
from .models.gp import ExactGP
from .models.spm import sPM
from .utils import get_keys


def step(model: Callable, model_prior: Callable,
         X_measured: jnp.ndarray, y_measured: jnp.ndarray,
         X_unmeasured: Optional[jnp.ndarray] = None,
         gp_wrap: bool = False,
         noise_prior: Optional[Callable] = None,
         gp_kernel: str = "Matern",
         gp_kernel_prior: Optional[Callable] = None,
         gp_input_dim: int = 1,
         num_warmup: int = 2000, num_samples: int = 2000,
         num_chains: int = 1, num_restarts: int = 1,
         print_summary: bool = True):
    """Fit the hypothesis model (optionally wrapped as a GP mean function) and
    return (predictive variance over X_unmeasured, fitted model).

    Statistical-quality gate: refit with a new key while max split-r-hat > 1.1,
    up to ``num_restarts`` times (hypo.py:75-93)."""
    verbose = print_summary
    model_ = None
    rng_key = rng_key_predict = None
    for i in range(num_restarts):
        rng_key, rng_key_predict = get_keys(i)
        if gp_wrap:
            model_ = ExactGP(gp_input_dim, gp_kernel, model,
                             gp_kernel_prior, model_prior, noise_prior)
            model_.fit(rng_key, X_measured, y_measured, num_warmup,
                       num_samples, num_chains, print_summary=verbose,
                       progress_bar=False)
        else:
            model_ = sPM(model, model_prior, noise_prior)
            model_.fit(rng_key, X_measured, y_measured, num_warmup,
                       num_samples, num_chains, print_summary=verbose)
        rhats = []
        for k, v in model_.get_samples(True).items():
            if k == "mu" or np.asarray(v).ndim < 2:
                continue
            rh = np.max(split_gelman_rubin(v))
            # constant (deterministic) sites give 0/0 -> NaN; they are not a
            # convergence failure
            rhats.append(0.0 if np.isnan(rh) else float(rh))
        # default=0.0: a posterior with only scalar sites (e.g. a one-parameter
        # sPM hypothesis) leaves rhats empty — treat it as converged instead of
        # crashing on max() of an empty list
        if max(rhats, default=0.0) < 1.1:
            break
    obj = 0
    if X_unmeasured is not None:
        _, samples = model_.predict(rng_key_predict, X_unmeasured)
        obj = samples.squeeze().var(0)
    return obj, model_


def sample_next(rewards, method: str = "softmax",
                temperature: float = 1.0, eps: float = 0.4) -> int:
    """Pick the model/channel to sample next via a bandit policy."""
    if method not in ("softmax", "eps-greedy"):
        raise NotImplementedError(
            "The currently implemented sampling methods are 'softmax' and 'eps-greedy'"
        )
    if rewards.ndim != 1:
        raise AttributeError("Pass rewards as 1-dimensional array")
    if method == "softmax":
        return softmax(rewards, temperature)
    return eps_greedy(rewards, eps)


def softmax(logits, temperature: float = 1.0) -> int:
    """Softmax selection policy."""
    logits = np.asarray(logits) / temperature
    logits = logits - logits.max()
    probs = np.exp(logits) / np.sum(np.exp(logits))
    return int(np.random.choice(np.arange(len(probs)), p=probs))


def eps_greedy(rewards, eps: float = 0.4) -> int:
    """Epsilon-greedy selection policy."""
    if np.random.random() > eps:
        return int(np.asarray(rewards).argmax())
    return int(np.random.randint(len(rewards)))


def update_record(record: np.ndarray, action: int, r: Union[int, float]) -> np.ndarray:
    """Running-average reward update for a bandit record of shape (N, 2)."""
    new_r = (record[action, 0] * record[action, 1] + r) / (record[action, 0] + 1)
    record[action, 0] += 1
    record[action, 1] = new_r
    return record
