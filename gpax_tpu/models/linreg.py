"""Bayesian linear regression via SVI with a diagonal-normal guide.

Parity surface: gpax/models/linreg.py:10-40 (same priors: beta ~ N(0, 10) per
feature, alpha ~ N(0, 10), sigma ~ HalfCauchy(1)).  Used by MeasuredNoiseGP to
extrapolate measured noise to unseen points.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax

from .. import distributions as dist
from .. import ppl
from ..infer import SVI, AutoDiagonalNormal, Trace_ELBO


class LinReg:
    """Simple Bayesian linear regression (SVI, MAP-style median estimate)."""

    def __init__(self):
        self.params = None
        self.svi = None

    @staticmethod
    def model(x, y=None):
        beta = ppl.sample(
            "beta", dist.Normal(jnp.zeros(x.shape[1]), 10 * jnp.ones(x.shape[1]))
        )
        alpha = ppl.sample("alpha", dist.Normal(0.0, 10.0))
        sigma = ppl.sample("sigma", dist.HalfCauchy(1.0))
        mu = alpha + jnp.dot(x, beta, precision=jax.lax.Precision.HIGHEST)
        with ppl.plate("data", x.shape[0]):
            ppl.sample("obs", dist.Normal(mu, sigma), obs=y)

    def train(self, x, y, learning_rate: float = 0.01, num_iterations: int = 5000):
        guide = AutoDiagonalNormal(self.model)
        self.svi = SVI(self.model, guide, optax.adam(learning_rate), Trace_ELBO())
        result = self.svi.run(jax.random.PRNGKey(0), num_iterations, x, y)
        self.params = guide.median(result.params)

    def predict(self, x_new):
        return self.params["alpha"] + jnp.dot(x_new, self.params["beta"], precision=jax.lax.Precision.HIGHEST)

    def get_params(self):
        return self.params
