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


def init_distributed(coordinator_address: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialize multi-host (DCN) execution and return the global device count.

    Single-slice single-host runs need nothing; call this once per host before
    any jax computation when running across hosts (GKE/multi-slice pods set the
    env vars jax reads automatically, so all arguments are optional).  After
    this, ``get_mesh()`` builds meshes over ALL global devices, and every
    sharded entry point in this package (sharded_predict/sharded_acquisition,
    ``chain_method='parallel'``) scales across hosts unchanged — the shardings
    are expressed on global meshes, and XLA routes collectives over ICI within
    a slice and DCN between slices (SURVEY.md §5's multi-host plan).
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    jax.distributed.initialize(**kwargs)
    return len(jax.devices())


def get_mesh(n_devices: Optional[int] = None, axis_name: str = "grid") -> Mesh:
    """1-D mesh over the first ``n_devices`` global devices (default: all).

    On multi-host deployments (after ``init_distributed``) this spans hosts;
    ``jax.devices()`` returns the global device list."""
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
