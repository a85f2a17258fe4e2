"""Device-mesh helpers.

The reference's multi-device story is a single pmap (gpax/models/vidkl.py:363-365)
and NumPyro's chain pmap (gp.py:174).  The TPU-native equivalent is one
``jax.sharding.Mesh`` over ICI with named axes; everything in this framework that
scales over chips (HMC chains, viDKL ensembles, prediction/acquisition grids)
shards a leading axis over that mesh and lets XLA insert the collectives.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "grid") -> Mesh:
    """1-D mesh over the first ``n_devices`` (default: all)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def shard_leading_axis(tree, mesh: Mesh, axis_name: str = "grid"):
    """Place every array in ``tree`` with its leading axis split over the mesh."""
    def _put(x):
        spec = P(axis_name, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(_put, tree)
