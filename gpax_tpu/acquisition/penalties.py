"""Acquisition penalties discouraging re-evaluation of recent points.

Parity surface: gpax/acquisition/penalties.py:6-66 — 'delta' places an infinite
penalty on exactly-revisited points; 'inverse_distance' applies recency-weighted
1/(d+1) sums (vmapped over candidates).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def penalty_point(x: jnp.ndarray, recent_points: jnp.ndarray) -> jnp.ndarray:
    """Recency-weighted inverse-distance penalty for one candidate point."""
    if recent_points.ndim == 1:
        recent_points = recent_points[:, None]
    distances = jnp.linalg.norm(recent_points - x, axis=1)
    if len(recent_points) == 1:
        timestamps = 1
    else:
        timestamps = jnp.arange(len(recent_points) + 1, 1, -1)
    return jnp.sum(1.0 / (distances + 1.0) / timestamps)


def find_and_replace_point_indices(points: jnp.ndarray,
                                   other_points: jnp.ndarray) -> jnp.ndarray:
    """+inf at entries of ``points`` that exactly match any recent point."""
    out = jnp.zeros(len(points))
    pts = points if points.ndim > 1 else points[:, None]
    for single_point in other_points:
        sp = jnp.atleast_1d(single_point)
        match = jnp.all(pts == sp, axis=1)
        out = jnp.where(match, jnp.inf, out)
    return out


def compute_penalty(X: jnp.ndarray, recent_points: jnp.ndarray,
                    penalty_type: str = "delta",
                    penalty_factor: float = 1.0) -> jnp.ndarray:
    """Penalty vector over candidates X given recently visited points."""
    if penalty_type not in ("delta", "inverse_distance", "inverse distance"):
        raise NotImplementedError(
            "Available penalty types are 'delta' and 'inverse distance'"
        )
    if penalty_type == "delta":
        return find_and_replace_point_indices(X, recent_points)
    return penalty_factor * jax.vmap(penalty_point, in_axes=(0, None))(X, recent_points)
