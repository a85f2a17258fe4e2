"""Grid-sharded prediction and acquisition.

Active-learning grids (test points / acquisition candidates) are embarrassingly
parallel in the points dimension: each chip needs the full training set (small)
and a shard of the grid.  We pad the grid to a device multiple, place it with a
NamedSharding over the mesh, and run the model's (already vmapped/jitted)
prediction — XLA partitions the k_pX / triangular-solve math over chips with zero
collectives on the hot path.

This is the TPU-native replacement for the reference's host-side chunking with
CPU offload (gpax/models/gp.py:295-349), per SURVEY.md §5.
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import get_mesh


def _pad_to_multiple(X, k):
    n = X.shape[0]
    pad = (-n) % k
    if pad == 0:
        return X, n
    return jnp.concatenate([X, jnp.repeat(X[-1:], pad, axis=0)], axis=0), n


def sharded_predict(model, rng_key, X_new: jnp.ndarray,
                    mesh: Optional[Mesh] = None, axis_name: str = "grid",
                    grid_axes=(0, -1), **kwargs):
    """Run ``model.predict`` with the test grid sharded across the mesh.

    Works for any model whose predict consumes (rng_key, X_new, ...): the grid is
    padded to a device-count multiple and device_put with a grid-axis sharding;
    outputs come back grid-sharded and are sliced to the original size.

    ``grid_axes`` names the grid axis of each predict output explicitly (the
    framework contract: mean carries the grid on axis 0, samples/variance on the
    last axis).  Pass a custom tuple for models with other output layouts — the
    axis is NOT inferred by shape matching, so a sample count that happens to
    equal the padded grid size cannot mis-slice an output.
    """
    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    X_new = jnp.asarray(X_new)
    X_new = X_new if X_new.ndim > 1 else X_new[:, None]
    Xp, n = _pad_to_multiple(X_new, n_dev)
    Xp = jax.device_put(Xp, NamedSharding(mesh, P(axis_name, None)))
    out = model.predict(rng_key, Xp, **kwargs)

    outs = out if isinstance(out, tuple) else (out,)
    axes = tuple(grid_axes) + (grid_axes[-1],) * (len(outs) - len(grid_axes))
    sliced = []
    for o, ax in zip(outs, axes):
        ax = ax % o.ndim
        if o.shape[ax] == Xp.shape[0]:
            o = jax.lax.slice_in_dim(o, 0, n, axis=ax)
        sliced.append(o)
    return tuple(sliced) if isinstance(out, tuple) else sliced[0]


def sharded_acquisition(acq_fn: Callable, rng_key, model, X_cand: jnp.ndarray,
                        mesh: Optional[Mesh] = None, axis_name: str = "grid",
                        **kwargs) -> jnp.ndarray:
    """Evaluate an acquisition function with the candidate grid sharded across
    the mesh.  Returns the full (unsharded-sliced) acquisition vector."""
    if mesh is None:
        mesh = get_mesh(axis_name=axis_name)
    n_dev = mesh.devices.size
    X_cand = jnp.asarray(X_cand)
    X2d = X_cand if X_cand.ndim > 1 else X_cand[:, None]
    Xp, n = _pad_to_multiple(X2d, n_dev)
    Xp = jax.device_put(Xp, NamedSharding(mesh, P(axis_name, None)))
    acq = acq_fn(rng_key, model, Xp, **kwargs)
    return jax.lax.slice_in_dim(acq, 0, n, axis=acq.ndim - 1)
