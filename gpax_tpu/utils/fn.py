"""Adapters for user-supplied mean and kernel functions.

The reference implements these with runtime source rewriting (inspect.getsource +
regex + exec, gpax/utils/fn.py:21-149).  Here the same public semantics are provided
with plain closures — trace-safe, picklable, and with no exec() — as planned in
SURVEY.md §2.4.

Public parity surface:
  * ``set_fn(f)``:          f(x, a, b, ...)        -> g(x, params)  with params['a']...
  * ``set_kernel_fn(f)``:   f(X, Z, h1, h2, ...)   -> k(X, Z, params, noise=0,
                            jitter=1e-6, **kw) adding (noise + jitter)·I when
                            X.shape == Z.shape (the gpax kernel contract).
  * ``_set_noise_kernel_fn(k)``: remaps 'k_*' hyperparameter lookups to 'k_noise_*'
                            (used by the heteroskedastic VarNoiseGP).
"""

from __future__ import annotations

import inspect
from functools import wraps
from typing import Callable, List, Optional

import jax
import jax.numpy as jnp

__all__ = ["set_fn", "set_kernel_fn", "_set_noise_kernel_fn"]


def set_fn(func: Callable) -> Callable:
    """Convert ``f(x, a, b)`` into ``f(x, params)`` reading a/b from the dict."""
    param_names = list(inspect.signature(func).parameters.keys())[1:]

    @wraps(func)
    def wrapped(x, params):
        return func(x, *(params[name] for name in param_names))

    return wrapped


def set_kernel_fn(func: Callable,
                  independent_vars: List[str] = ["X", "Z"],
                  jit_decorator: bool = True,
                  docstring: Optional[str] = None) -> Callable:
    """Convert a plain kernel ``f(X, Z, h1, h2, ...)`` into the gpax kernel
    signature, injecting the diagonal-noise rule."""
    sig = inspect.signature(func)
    hyper_names = [
        k for k, v in sig.parameters.items()
        if v.default is inspect.Parameter.empty and k not in independent_vars
    ]

    def kernel_fn(X, Z, params, noise=0, jitter: float = 1e-6, **kwargs):
        k = func(X, Z, *(params[name] for name in hyper_names))
        if X.shape == Z.shape:
            idx = jnp.arange(X.shape[0])
            k = k.at[idx, idx].add(noise + jitter)
        return k

    kernel_fn.__name__ = func.__name__
    kernel_fn.__qualname__ = func.__name__
    if docstring:
        kernel_fn.__doc__ = docstring
    if jit_decorator:
        kernel_fn = jax.jit(kernel_fn, static_argnames=())
    return kernel_fn


def _set_noise_kernel_fn(func: Callable) -> Callable:
    """Return a kernel that reads 'k_noise_*' keys where ``func`` reads 'k_*'
    (plus 'period' -> 'period_noise' passthrough is not needed: only k-prefixed
    names are remapped, matching gpax/utils/fn.py:119-149)."""

    @wraps(func)
    def noise_kernel_fn(X, Z, params, noise=0, jitter=1e-6, **kwargs):
        remapped = {}
        for key, val in params.items():
            if key.startswith("k_noise_"):
                remapped["k_" + key[len("k_noise_"):]] = val
            else:
                remapped.setdefault(key, val)
        return func(X, Z, remapped, noise, jitter, **kwargs)

    noise_kernel_fn.__name__ = getattr(func, "__name__", "kernel") + "_noise"
    return noise_kernel_fn
