"""On-device distribution kit.

This replaces the reference's dependency on ``numpyro.distributions`` (used throughout
gpax, e.g. gpax/models/gp.py:160-164, gpax/priors/priors.py:18-280) with a minimal,
jit/vmap-friendly set of distributions.  Every distribution is a plain Python object
holding jnp arrays; construction inside traced code is free (it only stages XLA ops).

Shapes follow the numpyro/TFP convention::

    sample(key, sample_shape).shape == sample_shape + batch_shape + event_shape
    log_prob(value).shape           == broadcast(value batch dims, batch_shape)
"""

from __future__ import annotations

import math
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular

from . import constraints

_LOG_2PI = math.log(2.0 * math.pi)


def _bshape(*arrays) -> Tuple[int, ...]:
    return jnp.broadcast_shapes(*(jnp.shape(a) for a in arrays))


def _batched_tri_solve(L, b):
    """solve_triangular(L, b[..., None])[..., 0] with broadcasting between L's and
    b's batch dims (XLA's triangular_solve requires equal batch ranks)."""
    n = b.shape[-1]
    if L.ndim == 2:
        # common case: one matrix, many right-hand sides -> a single solve
        flat = b.reshape(-1, n).T
        out = solve_triangular(L, flat, lower=True)
        return out.T.reshape(b.shape)
    batch = jnp.broadcast_shapes(b.shape[:-1], L.shape[:-2])
    Lb = jnp.broadcast_to(L, batch + L.shape[-2:])
    bb = jnp.broadcast_to(b, batch + (n,))
    return solve_triangular(Lb, bb[..., None], lower=True)[..., 0]


class Distribution:
    """Base class.  Subclasses define ``batch_shape``/``event_shape`` at __init__."""

    support = constraints.real
    batch_shape: Tuple[int, ...] = ()
    event_shape: Tuple[int, ...] = ()

    @property
    def event_dim(self) -> int:
        return len(self.event_shape)

    def sample(self, key, sample_shape: Tuple[int, ...] = ()):
        raise NotImplementedError

    def log_prob(self, value):
        raise NotImplementedError

    @property
    def mean(self):
        raise NotImplementedError

    @property
    def variance(self):
        raise NotImplementedError

    def to_event(self, n: int = 1) -> "Independent":
        return Independent(self, n)

    def expand(self, batch_shape) -> "Distribution":
        """Broadcast this distribution's batch shape (loc/scale families only)."""
        raise NotImplementedError(f"expand not supported for {type(self).__name__}")

    def _sample_std(self, key, sample_shape, sampler):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        return sampler(key, shape)

    # convenience (used by init strategies)
    def sample_median_like(self, key, num_samples: int = 10):
        draws = self.sample(key, (num_samples,))
        return jnp.median(draws, axis=0)


class Normal(Distribution):
    support = constraints.real

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.batch_shape = _bshape(loc, scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.normal(key, shape, dtype=jnp.result_type(float))

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI

    def cdf(self, value):
        return jax.scipy.stats.norm.cdf(value, self.loc, self.scale)

    def icdf(self, q):
        return self.loc + self.scale * jax.scipy.special.ndtri(q)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale**2, self.batch_shape)

    def expand(self, batch_shape):
        return Normal(jnp.broadcast_to(self.loc, batch_shape), jnp.broadcast_to(self.scale, batch_shape))


class LogNormal(Distribution):
    support = constraints.positive

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.batch_shape = _bshape(loc, scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.exp(self.loc + self.scale * jax.random.normal(key, shape, dtype=jnp.result_type(float)))

    def log_prob(self, value):
        logv = jnp.log(value)
        z = (logv - self.loc) / self.scale
        return -0.5 * z * z - jnp.log(self.scale) - 0.5 * _LOG_2PI - logv

    @property
    def mean(self):
        return jnp.broadcast_to(jnp.exp(self.loc + 0.5 * self.scale**2), self.batch_shape)

    @property
    def variance(self):
        s2 = self.scale**2
        return jnp.broadcast_to((jnp.exp(s2) - 1.0) * jnp.exp(2.0 * self.loc + s2), self.batch_shape)

    def expand(self, batch_shape):
        return LogNormal(jnp.broadcast_to(self.loc, batch_shape), jnp.broadcast_to(self.scale, batch_shape))


class HalfNormal(Distribution):
    support = constraints.positive

    def __init__(self, scale=1.0):
        self.scale = jnp.asarray(scale)
        self.batch_shape = _bshape(scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(self.scale * jax.random.normal(key, shape, dtype=jnp.result_type(float)))

    def log_prob(self, value):
        z = value / self.scale
        return 0.5 * math.log(2.0 / math.pi) - jnp.log(self.scale) - 0.5 * z * z

    @property
    def mean(self):
        return jnp.broadcast_to(self.scale * math.sqrt(2.0 / math.pi), self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.scale**2 * (1.0 - 2.0 / math.pi), self.batch_shape)

    def expand(self, batch_shape):
        return HalfNormal(jnp.broadcast_to(self.scale, batch_shape))


class Cauchy(Distribution):
    support = constraints.real

    def __init__(self, loc=0.0, scale=1.0):
        self.loc = jnp.asarray(loc)
        self.scale = jnp.asarray(scale)
        self.batch_shape = _bshape(loc, scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return self.loc + self.scale * jax.random.cauchy(key, shape, dtype=jnp.result_type(float))

    def log_prob(self, value):
        z = (value - self.loc) / self.scale
        return -math.log(math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)

    @property
    def mean(self):
        return jnp.broadcast_to(jnp.full_like(self.loc, jnp.nan), self.batch_shape)

    def expand(self, batch_shape):
        return Cauchy(jnp.broadcast_to(self.loc, batch_shape), jnp.broadcast_to(self.scale, batch_shape))


class HalfCauchy(Distribution):
    support = constraints.positive

    def __init__(self, scale=1.0):
        self.scale = jnp.asarray(scale)
        self.batch_shape = _bshape(scale)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jnp.abs(self.scale * jax.random.cauchy(key, shape, dtype=jnp.result_type(float)))

    def log_prob(self, value):
        z = value / self.scale
        return math.log(2.0 / math.pi) - jnp.log(self.scale) - jnp.log1p(z * z)

    def expand(self, batch_shape):
        return HalfCauchy(jnp.broadcast_to(self.scale, batch_shape))


class Gamma(Distribution):
    support = constraints.positive

    def __init__(self, concentration, rate=1.0):
        self.concentration = jnp.asarray(concentration)
        self.rate = jnp.asarray(rate)
        self.batch_shape = _bshape(concentration, rate)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        conc = jnp.broadcast_to(self.concentration, self.batch_shape)
        return jax.random.gamma(key, conc, shape, dtype=jnp.result_type(float)) / self.rate

    def log_prob(self, value):
        c, r = self.concentration, self.rate
        return c * jnp.log(r) + (c - 1.0) * jnp.log(value) - r * value - jax.scipy.special.gammaln(c)

    @property
    def mean(self):
        return jnp.broadcast_to(self.concentration / self.rate, self.batch_shape)

    @property
    def variance(self):
        return jnp.broadcast_to(self.concentration / self.rate**2, self.batch_shape)

    def expand(self, batch_shape):
        return Gamma(jnp.broadcast_to(self.concentration, batch_shape), jnp.broadcast_to(self.rate, batch_shape))


class Exponential(Distribution):
    support = constraints.positive

    def __init__(self, rate=1.0):
        self.rate = jnp.asarray(rate)
        self.batch_shape = _bshape(rate)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        return jax.random.exponential(key, shape, dtype=jnp.result_type(float)) / self.rate

    def log_prob(self, value):
        return jnp.log(self.rate) - self.rate * value

    @property
    def mean(self):
        return jnp.broadcast_to(1.0 / self.rate, self.batch_shape)

    def expand(self, batch_shape):
        return Exponential(jnp.broadcast_to(self.rate, batch_shape))


class Uniform(Distribution):
    def __init__(self, low=0.0, high=1.0):
        self.low = jnp.asarray(low)
        self.high = jnp.asarray(high)
        self.batch_shape = _bshape(low, high)
        self.support = constraints.interval(self.low, self.high)

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape
        u = jax.random.uniform(key, shape, dtype=jnp.result_type(float))
        return self.low + (self.high - self.low) * u

    def log_prob(self, value):
        lp = -jnp.log(self.high - self.low)
        inside = (value >= self.low) & (value <= self.high)
        return jnp.where(inside, lp, -jnp.inf)

    @property
    def mean(self):
        return jnp.broadcast_to(0.5 * (self.low + self.high), self.batch_shape)

    def expand(self, batch_shape):
        return Uniform(jnp.broadcast_to(self.low, batch_shape), jnp.broadcast_to(self.high, batch_shape))


class Delta(Distribution):
    support = constraints.real

    def __init__(self, value=0.0, log_density=0.0, event_dim: int = 0):
        self.value = jnp.asarray(value)
        self.log_density = jnp.asarray(log_density)
        shape = jnp.shape(self.value)
        cut = len(shape) - event_dim
        self.batch_shape = shape[:cut]
        self.event_shape = shape[cut:]

    def sample(self, key, sample_shape=()):
        return jnp.broadcast_to(self.value, tuple(sample_shape) + jnp.shape(self.value))

    def log_prob(self, value):
        lp = jnp.broadcast_to(self.log_density, self.batch_shape)
        if self.event_dim:
            return lp
        return jnp.broadcast_to(lp, _bshape(value, self.value))

    @property
    def mean(self):
        return self.value


class Independent(Distribution):
    """Reinterprets the rightmost ``n`` batch dims of ``base`` as event dims."""

    def __init__(self, base: Distribution, reinterpreted_batch_ndims: int = 1):
        self.base = base
        self.reinterpreted_batch_ndims = reinterpreted_batch_ndims
        n = reinterpreted_batch_ndims
        self.batch_shape = base.batch_shape[: len(base.batch_shape) - n]
        self.event_shape = base.batch_shape[len(base.batch_shape) - n:] + base.event_shape
        self.support = base.support

    def sample(self, key, sample_shape=()):
        return self.base.sample(key, sample_shape)

    def log_prob(self, value):
        lp = self.base.log_prob(value)
        for _ in range(self.reinterpreted_batch_ndims):
            lp = lp.sum(-1)
        return lp

    @property
    def mean(self):
        return self.base.mean

    def expand(self, batch_shape):
        full = tuple(batch_shape) + self.event_shape[: self.reinterpreted_batch_ndims]
        return Independent(self.base.expand(full), self.reinterpreted_batch_ndims)


class MultivariateNormal(Distribution):
    """MVN parameterized by covariance matrix or its Cholesky factor.

    ``log_prob`` uses one Cholesky + one triangular solve (the reference gets the
    equivalent from numpyro's MVN at gpax/models/gp.py:160-164).
    """

    support = constraints.real_vector

    def __init__(self, loc=0.0, covariance_matrix=None, scale_tril=None):
        if (covariance_matrix is None) == (scale_tril is None):
            raise ValueError("Provide exactly one of covariance_matrix / scale_tril")
        self._covariance = covariance_matrix
        self._scale_tril = scale_tril
        mat = scale_tril if scale_tril is not None else covariance_matrix
        n = mat.shape[-1]
        self.loc = jnp.broadcast_to(jnp.asarray(loc), _bshape(loc, mat[..., 0]))
        self.event_shape = (n,)
        self.batch_shape = _bshape(self.loc[..., 0], mat[..., 0, 0])

    @property
    def scale_tril(self):
        if self._scale_tril is None:
            # jitter-escalating Cholesky: an f32 gram that is numerically
            # indefinite must yield a finite (slightly regularized) likelihood,
            # not a NaN potential that walls off the posterior mode under NUTS.
            # Computed lazily: the likelihood path (log_prob on the blocked
            # dispatch) never needs the factor itself.
            from ..ops.linalg import safe_cholesky

            self._scale_tril = safe_cholesky(self._covariance)
        return self._scale_tril

    def sample(self, key, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape + self.event_shape
        eps = jax.random.normal(key, shape, dtype=self.scale_tril.dtype)
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)

    def log_prob(self, value):
        diff = value - self.loc
        if self._covariance is not None:
            from ..ops.linalg import mvn_log_prob_centered
            from ..parallel.distributed_chol import (
                active_sharded_linalg, make_sharded_mvn_log_prob,
            )

            ctx = active_sharded_linalg()
            if (ctx is not None and self._covariance.ndim == 2
                    and diff.ndim == 1):
                # model-parallel likelihood: factorization + VJP sharded over
                # the active mesh (parallel/distributed_chol.py)
                mesh, axis_name, leaf = ctx
                return make_sharded_mvn_log_prob(mesh, axis_name, leaf)(
                    self._covariance, diff)
            if self._covariance.ndim == 2:
                # matmul-only custom-VJP density: the NUTS leapfrog hot path.
                # Used at EVERY n, not just the blocked-Pallas sizes — at small
                # n (MultiTaskGP/CoregGP/sPM-scale likelihoods) the win is op
                # COUNT: the closed-form backward (β, WᵀW, one outer product)
                # replaces XLA's serialized Cholesky/TRSM pullback chains,
                # which dominate per-leapfrog cost on a runtime with a
                # multi-ms per-op floor (CLAUDE.md).  chol_tri_factors picks
                # blocked Pallas trtri vs one XLA TRSM by size.
                return mvn_log_prob_centered(self._covariance, diff)
        w = _batched_tri_solve(self.scale_tril, diff)
        maha = (w * w).sum(-1)
        logdet = jnp.log(jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1))).sum(-1)
        n = self.event_shape[0]
        return -0.5 * (maha + n * _LOG_2PI) - logdet

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def variance(self):
        return jnp.broadcast_to((self.scale_tril**2).sum(-1), self.batch_shape + self.event_shape)

    @property
    def covariance_matrix(self):
        return self.scale_tril @ jnp.swapaxes(self.scale_tril, -1, -2)


class LowRankMultivariateNormal(Distribution):
    """N(loc, W Wᵀ + D) with W (n, m), D diagonal — Woodbury/determinant-lemma log_prob.

    Reference equivalent: numpyro's LowRankMultivariateNormal used by the sparse GP
    likelihood (gpax/models/sparse_gp.py:111-114).  Cost O(n m² + m³), never O(n³).
    """

    support = constraints.real_vector

    def __init__(self, loc, cov_factor, cov_diag):
        self.loc = jnp.asarray(loc)
        self.cov_factor = jnp.asarray(cov_factor)  # (..., n, m)
        self.cov_diag = jnp.asarray(cov_diag)      # (..., n)
        n = self.cov_factor.shape[-2]
        self.event_shape = (n,)
        self.batch_shape = _bshape(self.loc[..., 0], self.cov_factor[..., 0, 0], self.cov_diag[..., 0])

    def _capacitance_tril(self):
        W = self.cov_factor
        Dinv_W = W / self.cov_diag[..., :, None]
        m = W.shape[-1]
        C = jnp.eye(m, dtype=W.dtype) + jnp.einsum("...nm,...nk->...mk", W, Dinv_W)
        return jnp.linalg.cholesky(C)

    def sample(self, key, sample_shape=()):
        k1, k2 = jax.random.split(key)
        n, m = self.cov_factor.shape[-2:]
        shape_m = tuple(sample_shape) + self.batch_shape + (m,)
        shape_n = tuple(sample_shape) + self.batch_shape + (n,)
        eps_m = jax.random.normal(k1, shape_m, dtype=self.cov_factor.dtype)
        eps_n = jax.random.normal(k2, shape_n, dtype=self.cov_factor.dtype)
        return (
            self.loc
            + jnp.einsum("...nm,...m->...n", self.cov_factor, eps_m)
            + jnp.sqrt(self.cov_diag) * eps_n
        )

    def log_prob(self, value):
        diff = value - self.loc
        D = self.cov_diag
        W = self.cov_factor
        L_C = self._capacitance_tril()
        Dinv_diff = diff / D
        Wt_Dinv_diff = jnp.einsum("...nm,...n->...m", W, Dinv_diff)
        w = _batched_tri_solve(L_C, Wt_Dinv_diff)
        maha = (diff * Dinv_diff).sum(-1) - (w * w).sum(-1)
        logdet = (
            2.0 * jnp.log(jnp.abs(jnp.diagonal(L_C, axis1=-2, axis2=-1))).sum(-1)
            + jnp.log(D).sum(-1)
        )
        n = self.event_shape[0]
        return -0.5 * (maha + logdet + n * _LOG_2PI)

    @property
    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape + self.event_shape)

    @property
    def variance(self):
        return (self.cov_factor**2).sum(-1) + self.cov_diag
