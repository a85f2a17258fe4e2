"""General utilities.

Functional parity with the reference utility layer (gpax/utils/utils.py:19-212):
key handling, array/dict batching, sparse-image preprocessing, inducing-point
initialization, and distribution visualization — reimplemented for this framework's
own distribution kit.
"""

from __future__ import annotations

from typing import Dict, List, Union

import jax
import jax.numpy as jnp
import numpy as onp

from ..config import enable_x64  # re-exported (parity: gpax.utils.enable_x64)

__all__ = [
    "enable_x64",
    "get_keys",
    "split_in_batches",
    "split_dict",
    "random_sample_dict",
    "get_haiku_dict",
    "dviz",
    "preprocess_sparse_image",
    "initialize_inducing_points",
]


def get_keys(seed: int = 0):
    """Two PRNG keys (fit key, predict key) from one integer seed."""
    return tuple(jax.random.split(jax.random.PRNGKey(seed)))


def split_in_batches(X_new, batch_size: int = 100, dim: int = 0) -> List:
    """Chunk an array along dim 0 or 1 (trailing remainder kept as a short chunk)."""
    if dim not in (0, 1):
        raise NotImplementedError("'dim' must be 0 or 1")
    total = X_new.shape[dim]
    chunks = []
    for start in range(0, total, batch_size):
        stop = min(start + batch_size, total)
        chunks.append(X_new[start:stop] if dim == 0 else X_new[:, start:stop])
    return chunks


def split_dict(data: Dict[str, jnp.ndarray], chunk_size: int) -> List[Dict[str, jnp.ndarray]]:
    """Split a dict of equal-length arrays into chunks along the leading axis."""
    n = len(next(iter(data.values())))
    return [
        {k: v[start:min(start + chunk_size, n)] for k, v in data.items()}
        for start in range(0, n, chunk_size)
    ]


def random_sample_dict(data: Dict[str, jnp.ndarray], num_samples: int,
                       rng_key: jnp.ndarray) -> Dict[str, jnp.ndarray]:
    """Consistent random subsample across every array in the dict."""
    n = len(next(iter(data.values())))
    idx = jax.random.permutation(rng_key, n)[:num_samples]
    return {k: v[idx] for k, v in data.items()}


def get_haiku_dict(kernel_params: Dict[str, jnp.ndarray]) -> Dict[str, Dict[str, jnp.ndarray]]:
    """Regroup flat 'feature_extractor/<module>/<param>' SVI parameters into
    per-module {'w': ..., 'b': ...} trees consumable by ``Module.apply`` (same
    role as the reference's haiku-dict regrouping, gpax/utils/utils.py:105-123)."""
    out: Dict[str, Dict[str, jnp.ndarray]] = {}
    for key, val in kernel_params.items():
        if key.startswith("feature_extractor/"):
            # nest by the remaining path parts — user (init, apply) modules may
            # have param trees of any depth, incl. flat {'w1': ...} dicts
            parts = key.split("/")[1:]
            node = out
            for p in parts[:-1]:
                node = node.setdefault(p, {})
            node[parts[-1]] = val
    return out


def dviz(d, samples: int = 1000) -> None:
    """Histogram visualization of a distribution (lazy matplotlib/seaborn)."""
    import matplotlib.pyplot as plt

    draws = d.sample(jax.random.PRNGKey(0), sample_shape=(samples,))
    plt.figure(dpi=100)
    try:
        import seaborn as sns

        sns.histplot(onp.asarray(draws), kde=True, fill=False)
    except ImportError:
        plt.hist(onp.asarray(draws), bins=50, histtype="step")
    plt.show()


def preprocess_sparse_image(sparse_image):
    """Convert a sparse image (zeros = missing pixels) into GP training data:
    returns (coords (N, D), values (N,), full grid (N_full, D)) for reconstruction
    (semantics parity: gpax/utils/utils.py:150-168)."""
    dtype = sparse_image.dtype
    nz = onp.nonzero(sparse_image)
    gp_input = onp.column_stack(nz)
    targets = sparse_image[nz]
    full_indices = onp.array(
        onp.meshgrid(*[onp.arange(dim) for dim in sparse_image.shape])
    ).T.reshape(-1, sparse_image.ndim)
    return gp_input.astype(dtype), targets.astype(dtype), full_indices.astype(dtype)


def initialize_inducing_points(X, ratio: float = 0.1, method: str = "uniform", key=None):
    """Select inducing points for sparse GPs: 'uniform' index spacing, 'random'
    subsample, or 'kmeans' centers (lazy sklearn).  Parity: utils.py:171-212."""
    if not 0 < ratio < 1:
        raise ValueError("The 'ratio' value must be between 0 and 1")
    n = X.shape[0]
    m = int(n * ratio)
    if method == "uniform":
        idx = jnp.linspace(0, n - 1, m, dtype=jnp.int32)
        return X[idx]
    if method == "random":
        if key is None:
            raise ValueError("A JAX random key must be provided for random selection")
        idx = jax.random.choice(key, n, shape=(m,), replace=False)
        return X[idx]
    if method == "kmeans":
        try:
            from sklearn.cluster import KMeans
        except ImportError as e:
            raise ImportError("scikit-learn is required for method='kmeans'") from e
        centers = KMeans(n_clusters=m, random_state=0, n_init="auto").fit(onp.asarray(X))
        return jnp.asarray(centers.cluster_centers_)
    raise ValueError("Method must be 'uniform', 'random', or 'kmeans'")


def device_memory_budget(fraction: float = 0.4, default: int = 1 << 31) -> int:
    """Usable per-device scratch budget in bytes for chunked computations.

    Derived from the default device's actual memory stats (HBM limit minus live
    allocations) instead of a hard-coded constant, so chunk sizes scale with the
    hardware (16 GB v5e vs 32 GB v4 vs host CPU).  Falls back to ``default``
    (2 GiB) when the backend reports no stats (e.g. the CPU test platform).
    """
    try:
        stats = jax.devices()[0].memory_stats()
        limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
        if limit:
            free = int(limit) - int(stats.get("bytes_in_use", 0))
            if free > 0:
                return max(int(fraction * free), 64 << 20)
    except Exception:
        pass
    return default
