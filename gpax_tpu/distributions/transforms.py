"""Bijective transforms between unconstrained reals and constrained supports.

Used by the HMC/NUTS engine (latents are integrated in unconstrained space) and by
the variational auto-guides.  Equivalent role to numpyro's ``biject_to`` registry,
which the reference relies on implicitly through NUTS/SVI (gpax/models/gp.py:207-218).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from . import constraints


class Transform:
    """y = f(x) with x unconstrained.  ``log_abs_det_jacobian`` is elementwise."""

    def __call__(self, x):
        raise NotImplementedError

    def inv(self, y):
        raise NotImplementedError

    def log_abs_det_jacobian(self, x, y):
        raise NotImplementedError


class IdentityTransform(Transform):
    def __call__(self, x):
        return x

    def inv(self, y):
        return y

    def log_abs_det_jacobian(self, x, y):
        return jnp.zeros_like(x)


class ExpTransform(Transform):
    def __call__(self, x):
        return jnp.exp(x)

    def inv(self, y):
        return jnp.log(y)

    def log_abs_det_jacobian(self, x, y):
        return x


class SigmoidTransform(Transform):
    """x -> low + (high - low) * sigmoid(x)."""

    def __init__(self, low=0.0, high=1.0):
        self.low = low
        self.high = high

    def __call__(self, x):
        return self.low + (self.high - self.low) * jax.nn.sigmoid(x)

    def inv(self, y):
        p = (y - self.low) / (self.high - self.low)
        p = jnp.clip(p, 1e-12, 1.0 - 1e-12)
        return jnp.log(p) - jnp.log1p(-p)

    def log_abs_det_jacobian(self, x, y):
        span = jnp.log(jnp.asarray(self.high - self.low, dtype=jnp.result_type(x)))
        return span + jax.nn.log_sigmoid(x) + jax.nn.log_sigmoid(-x)


def biject_to(constraint) -> Transform:
    if constraint is constraints.real or constraint is constraints.real_vector:
        return IdentityTransform()
    if constraint is constraints.positive or constraint is constraints.nonnegative:
        return ExpTransform()
    if isinstance(constraint, constraints.Interval):
        return SigmoidTransform(constraint.low, constraint.high)
    raise NotImplementedError(f"No bijector registered for constraint {constraint!r}")
