"""Posterior checkpoint / resume.

The reference keeps posteriors only in memory (SURVEY.md §5: "Checkpoint/resume:
Absent") — long active-learning campaigns lose everything on a crash.  Posterior
samples, variational params, and training data are all (nested) dicts of arrays,
so persistence is a path-keyed ``.npz`` round-trip with no framework dependency.

API:
    save_model(path, model)   — persists samples/params + training data
    load_model(path, model)   — restores them onto a freshly constructed model
    save_pytree / load_pytree — generic nested-dict-of-arrays persistence
"""

from __future__ import annotations

import pathlib
from typing import Any, Dict

import jax.numpy as jnp
import numpy as np


def _flatten(tree: Dict, prefix: str = ""):
    for k in sorted(tree):
        v = tree[k]
        path = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            yield from _flatten(v, path)
        else:
            yield path, v


def _unflatten(flat: Dict[str, Any]) -> Dict:
    out: Dict = {}
    for path, v in flat.items():
        parts = path.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_pytree(path: str, tree: Dict) -> None:
    """Persist a nested dict of arrays."""
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez(path, **{p: np.asarray(v) for p, v in _flatten(tree)})


def load_pytree(path: str) -> Dict:
    """Load a nested dict of arrays saved with :func:`save_pytree`."""
    p = str(path)
    if not p.endswith(".npz"):
        p = p + ".npz"
    with np.load(p) as data:
        flat = {k: jnp.asarray(data[k]) for k in data.files}
    return _unflatten(flat)


class _RestoredMCMC:
    """Read-only stand-in exposing a persisted posterior through the MCMC API."""

    def __init__(self, samples_by_chain: Dict[str, jnp.ndarray]):
        self._samples = samples_by_chain

    def get_samples(self, group_by_chain: bool = False):
        if group_by_chain:
            return self._samples
        return {k: v.reshape((-1,) + v.shape[2:]) for k, v in self._samples.items()}

    def print_summary(self, prob: float = 0.9):
        from ..infer import diagnostics

        diagnostics.print_summary(self._samples, prob)


def save_model(path: str, model) -> None:
    """Checkpoint everything needed to predict with a fitted model."""
    state: Dict[str, Any] = {}
    if getattr(model, "X_train", None) is not None:
        state["X_train"] = model.X_train
        state["y_train"] = model.y_train
    if getattr(model, "mcmc", None) is not None and hasattr(model.mcmc, "get_samples"):
        state["mcmc_samples"] = model.mcmc.get_samples(group_by_chain=True)
    if getattr(model, "kernel_params", None) is not None:
        state["kernel_params"] = model.kernel_params
        # SVI models derive point estimates through the guide, which is not
        # persisted; store the constrained median directly
        if getattr(model, "svi", None) is not None:
            try:
                state["vi_median"] = model.get_samples()
            except Exception:
                pass
    if isinstance(getattr(model, "nn_params", None), dict):
        state["nn_params"] = model.nn_params
    if getattr(model, "Xu", None) is not None:
        state["Xu"] = model.Xu
    if getattr(model, "measured_noise", None) is not None:
        state["measured_noise"] = model.measured_noise
    save_pytree(path, state)


def load_model(path: str, model):
    """Restore a checkpoint onto a freshly constructed (same-config) model.
    Returns the model for chaining."""
    state = load_pytree(path)
    if "X_train" in state:
        model.X_train = state["X_train"]
        model.y_train = state["y_train"]
    if "mcmc_samples" in state:
        model.mcmc = _RestoredMCMC(state["mcmc_samples"])
    if "kernel_params" in state:
        model.kernel_params = state["kernel_params"]
    if "vi_median" in state:
        model._restored_median = state["vi_median"]
    if "nn_params" in state:
        model.nn_params = state["nn_params"]
    if "Xu" in state:
        model.Xu = state["Xu"]
    if "measured_noise" in state:
        model.measured_noise = state["measured_noise"]
    return model
