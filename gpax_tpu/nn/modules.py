"""Minimal functional NN module system (pytree params, init/apply pairs).

Replaces the reference's haiku dependency (gpax/models/vidkl.py:24,81-99): modules
are plain objects with ``init(key, x) -> params`` and ``apply(params, x) -> out``;
params are nested dicts ``{layer: {'w': ..., 'b': ...}}`` so they vmap/optimize/
serialize like any pytree.

Integration with the PPL:
  * ``random_module(name, module, input_shape)`` registers every weight leaf as a
    latent site (Normal(0,1) weights, Cauchy(0,1) biases — the reference's
    random_haiku_module priors, vidkl.py:93-96).
  * ``module_param(name, module, input_shape)`` registers the whole param tree as
    one optimizable ``param`` site (MLE mode, vidkl.py:97-99).
"""

from __future__ import annotations

import math
from typing import Callable, Sequence, Tuple

import jax
import jax.numpy as jnp

from .. import distributions as dist
from .. import ppl


class Module:
    """Functional module: subclasses define layer structure via _layers()."""

    def init(self, key, x: jnp.ndarray):
        raise NotImplementedError

    def apply(self, params, x: jnp.ndarray):
        raise NotImplementedError


class FunctionalModule(Module):
    """Adapter wrapping a plain ``(init_fn, apply_fn)`` pair as a Module.

    Restores the reference's extensibility surface — any user-supplied network
    (the reference accepts arbitrary haiku transforms, gpax/models/vidkl.py:60-99)
    plugs into viDKL/viMTDKL without subclassing :class:`Module`:

        dkl = viDKL(input_dim=d, nn=(my_init, my_apply))

    ``init_fn(key, x) -> params`` must return a pytree of f32 arrays;
    ``apply_fn(params, x) -> (n, z_dim)`` embeds a batch.
    """

    def __init__(self, init_fn: Callable, apply_fn: Callable):
        self._init_fn = init_fn
        self._apply_fn = apply_fn

    def init(self, key, x: jnp.ndarray):
        return self._init_fn(key, x)

    def apply(self, params, x: jnp.ndarray):
        return self._apply_fn(params, x)


def as_module(nn) -> Module:
    """Coerce user input into a Module: passes Modules through, wraps an
    ``(init, apply)`` tuple — including haiku-style transformed pairs — in a
    :class:`FunctionalModule`."""
    if isinstance(nn, Module):
        return nn
    if isinstance(nn, (tuple, list)) and len(nn) == 2 and all(callable(f) for f in nn):
        return FunctionalModule(*nn)
    # haiku-style transformed object with .init/.apply attributes
    if callable(getattr(nn, "init", None)) and callable(getattr(nn, "apply", None)):
        return FunctionalModule(nn.init, nn.apply)
    raise TypeError(
        "nn must be a Module, an (init_fn, apply_fn) pair, or an object with "
        f".init/.apply callables; got {type(nn)!r}"
    )


def _linear_init(key, d_in: int, d_out: int):
    kw, _ = jax.random.split(key)
    scale = 1.0 / math.sqrt(d_in)
    return {
        "w": scale * jax.random.truncated_normal(kw, -2.0, 2.0, (d_in, d_out), jnp.float32),
        "b": jnp.zeros((d_out,), jnp.float32),
    }


class MLP(Module):
    """Dense feature extractor: hidden ReLU layers + linear head
    (default 64-64-z, matching the reference viDKL MLP, vidkl.py:400-412)."""

    def __init__(self, embedim: int = 2, hidden_dim: Sequence[int] = (64, 64),
                 activation: Callable = jax.nn.relu):
        self.embedim = embedim
        self.hidden_dim = tuple(hidden_dim)
        self.activation = activation

    def _dims(self, d_in: int):
        dims = [d_in, *self.hidden_dim, self.embedim]
        return list(zip(dims[:-1], dims[1:]))

    def init(self, key, x: jnp.ndarray):
        d_in = x.reshape(x.shape[0], -1).shape[-1]
        keys = jax.random.split(key, len(self._dims(d_in)))
        return {
            f"linear_{i}": _linear_init(k, a, b)
            for i, (k, (a, b)) in enumerate(zip(keys, self._dims(d_in)))
        }

    def apply(self, params, x: jnp.ndarray):
        h = x.reshape(x.shape[0], -1)
        n = len(params)
        for i in range(n):
            p = params[f"linear_{i}"]
            h = jnp.dot(h, p["w"], preferred_element_type=h.dtype) + p["b"]
            if i < n - 1:
                h = self.activation(h)
        return h


class ConvNet(Module):
    """Small conv feature extractor for image patches (README ConvNet use case):
    conv(3x3) -> relu -> maxpool -> conv(3x3) -> relu -> flatten -> dense -> z."""

    def __init__(self, embedim: int = 2, channels: Sequence[int] = (8, 16),
                 dense_dim: int = 64, activation: Callable = jax.nn.relu):
        self.embedim = embedim
        self.channels = tuple(channels)
        self.dense_dim = dense_dim
        self.activation = activation

    def _conv(self, x, p):
        return jax.lax.conv_general_dilated(
            x, p["w"], window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + p["b"]

    def init(self, key, x: jnp.ndarray):
        # x: (n, H, W, C) or (n, H, W) -> add channel dim
        if x.ndim == 3:
            x = x[..., None]
        params = {}
        c_in = x.shape[-1]
        keys = jax.random.split(key, len(self.channels) + 2)
        for i, c_out in enumerate(self.channels):
            scale = 1.0 / math.sqrt(3 * 3 * c_in)
            params[f"conv_{i}"] = {
                "w": scale * jax.random.truncated_normal(
                    keys[i], -2.0, 2.0, (3, 3, c_in, c_out), jnp.float32
                ),
                "b": jnp.zeros((c_out,), jnp.float32),
            }
            c_in = c_out
        # infer flattened dim by a shape-only forward pass
        h = self._forward_convs(params, x)
        d_flat = h.reshape(h.shape[0], -1).shape[-1]
        params["dense_0"] = _linear_init(keys[-2], d_flat, self.dense_dim)
        params["head"] = _linear_init(keys[-1], self.dense_dim, self.embedim)
        return params

    def _forward_convs(self, params, x):
        h = x if x.ndim == 4 else x[..., None]
        i = 0
        while f"conv_{i}" in params:
            h = self.activation(self._conv(h, params[f"conv_{i}"]))
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
            )
            i += 1
        return h

    def apply(self, params, x: jnp.ndarray):
        h = self._forward_convs(params, x)
        h = h.reshape(h.shape[0], -1)
        h = self.activation(
            jnp.dot(h, params["dense_0"]["w"], preferred_element_type=h.dtype)
            + params["dense_0"]["b"]
        )
        return jnp.dot(h, params["head"]["w"], preferred_element_type=h.dtype) + params["head"]["b"]


def _flatten_with_path(tree, prefix=""):
    if isinstance(tree, dict):
        out = []
        for k in sorted(tree):
            v = tree[k]
            path = f"{prefix}/{k}" if prefix else k
            if isinstance(v, dict):
                out += _flatten_with_path(v, path)
            else:
                out.append((path, v))
        return out
    # arbitrary (user-module) pytrees: jax path API, '/'-joined key strings
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out = []
    for keypath, leaf in flat:
        parts = [getattr(k, "key", getattr(k, "name", getattr(k, "idx", None)))
                 for k in keypath]
        path = "/".join([prefix] + [str(p) for p in parts]) if prefix else \
            "/".join(str(p) for p in parts)
        out.append((path, leaf))
    return out


def random_module(name: str, module: Module, input_shape: Tuple[int, ...]):
    """Bayesian NN: every parameter leaf becomes a latent site named
    '<name>/<layer>/<param>' with Normal(0,1) weights / Cauchy(0,1) biases.
    Returns a callable ``apply(x)`` closed over the sampled params."""
    proto = module.init(jax.random.PRNGKey(0), jnp.zeros(input_shape, jnp.float32))
    sampled = {}
    for path, leaf in _flatten_with_path(proto, name):
        pname = path.rsplit("/", 1)[-1]
        if pname.startswith("b"):
            d = dist.Cauchy(jnp.zeros(leaf.shape), jnp.ones(leaf.shape))
        else:
            d = dist.Normal(jnp.zeros(leaf.shape), jnp.ones(leaf.shape))
        sampled[path] = ppl.sample(path, d.to_event(leaf.ndim) if leaf.ndim else d)

    # re-nest
    params = jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(proto),
        [sampled[path] for path, _ in _flatten_with_path(proto, name)],
    )
    return lambda x: module.apply(params, x)


def module_param(name: str, module: Module, input_shape: Tuple[int, ...]):
    """MLE NN: the whole parameter tree is one optimizable ``param`` site named
    '<name>$params'.  Returns ``apply(x)`` closed over the (possibly substituted)
    params."""
    proto = module.init(jax.random.PRNGKey(0), jnp.zeros(input_shape, jnp.float32))
    params = ppl.param(f"{name}$params", proto)
    return lambda x: module.apply(params, x)
