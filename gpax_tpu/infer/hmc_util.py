"""HMC building blocks: leapfrog integrator, dual-averaging step-size adaptation,
Welford (co)variance estimation for the mass matrix, and the Stan-style warmup
window schedule.

All pieces are pure functions over NamedTuple states so the whole warmup+sampling
loop compiles into a single ``lax.scan`` (replacing numpyro's MCMC driver used at
gpax/models/gp.py:207-218).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_step: jnp.ndarray        # current log eps
    log_step_avg: jnp.ndarray    # averaged log eps
    grad_sum: jnp.ndarray        # sum of (target_accept - accept_prob)
    t: jnp.ndarray               # iteration counter
    mu: jnp.ndarray              # shrinkage target = log(10 * eps0)


def da_init(step_size: jnp.ndarray) -> DualAveragingState:
    log_eps = jnp.log(step_size)
    return DualAveragingState(
        log_step=log_eps,
        log_step_avg=jnp.zeros_like(log_eps),
        grad_sum=jnp.zeros_like(log_eps),
        t=jnp.zeros_like(log_eps),
        mu=jnp.log(10.0) + log_eps,
    )


def da_update(state: DualAveragingState, accept_prob: jnp.ndarray,
              target_accept: float = 0.8, gamma: float = 0.05,
              t0: float = 10.0, kappa: float = 0.75) -> DualAveragingState:
    t = state.t + 1.0
    grad_sum = state.grad_sum + (target_accept - accept_prob)
    # Nesterov dual averaging: x_t = mu - sqrt(t)/gamma * (1/(t+t0)) * grad_sum
    log_step = state.mu - (jnp.sqrt(t) / gamma) * grad_sum / (t + t0)
    eta = t ** (-kappa)
    log_step_avg = eta * log_step + (1.0 - eta) * state.log_step_avg
    return DualAveragingState(log_step, log_step_avg, grad_sum, t, state.mu)


class WelfordState(NamedTuple):
    mean: jnp.ndarray
    m2: jnp.ndarray              # (dim,) diagonal or (dim, dim) full second moment
    count: jnp.ndarray


def welford_init(dim: int, dtype=jnp.float32, dense: bool = False) -> WelfordState:
    m2_shape = (dim, dim) if dense else (dim,)
    return WelfordState(
        mean=jnp.zeros((dim,), dtype), m2=jnp.zeros(m2_shape, dtype),
        count=jnp.zeros((), dtype),
    )


def welford_update(state: WelfordState, x: jnp.ndarray) -> WelfordState:
    count = state.count + 1.0
    delta = x - state.mean
    mean = state.mean + delta / count
    if state.m2.ndim == state.mean.ndim + 1:  # dense: rank-1 outer update
        m2 = state.m2 + delta[..., :, None] * (x - mean)[..., None, :]
    else:
        m2 = state.m2 + delta * (x - mean)
    return WelfordState(mean, m2, count)


def welford_variance(state: WelfordState, regularize: bool = True) -> jnp.ndarray:
    """Posterior (co)variance estimate = the next window's inverse mass matrix.
    Returns (dim,) for diagonal accumulators, (dim, dim) for dense ones."""
    n = state.count
    if state.m2.ndim == state.mean.ndim + 1:
        cov = state.m2 / jnp.maximum(n - 1.0, 1.0)
        dim = state.mean.shape[-1]
        eye = jnp.eye(dim, dtype=state.m2.dtype)
        if regularize:
            # Stan's shrinkage toward (scaled) identity keeps the estimate PD
            # with few samples — required: sample_momentum factorizes it
            cov = (n / (n + 5.0)) * cov + 1e-3 * (5.0 / (n + 5.0)) * eye
        return cov + 1e-10 * eye
    var = state.m2 / jnp.maximum(n - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit variance for stability with few samples
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return jnp.maximum(var, 1e-10)


def mass_velocity(inv_mass: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """v = Σ·r (velocity from momentum; Σ = inverse mass = posterior-cov estimate).

    ``inv_mass`` is (dim,) for a diagonal metric or (dim, dim) dense (symmetric);
    ``r`` may carry leading batch axes — (dim,) or (rows, dim) — in both cases.
    """
    if inv_mass.ndim == 2:
        # HIGHEST: a bf16 product here quantizes the integrator's velocity
        # field (f32 rule 1, CLAUDE.md) — dim is tiny, the cost is nil
        return jnp.matmul(r, inv_mass,
                          precision=jax.lax.Precision.HIGHEST)  # symmetric Σ: r·Σ == Σ·r
    return inv_mass * r


def leapfrog(potential_grad: Callable, z: jnp.ndarray, r: jnp.ndarray,
             step_size: jnp.ndarray, inv_mass: jnp.ndarray,
             grad: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One velocity-Verlet step in flattened unconstrained space.

    Returns (z_new, r_new, potential_new, grad_new); caller threads the cached grad.
    """
    r_half = r - 0.5 * step_size * grad
    z_new = z + step_size * mass_velocity(inv_mass, r_half)
    u_new, grad_new = potential_grad(z_new)
    r_new = r_half - 0.5 * step_size * grad_new
    return z_new, r_new, u_new, grad_new


def kinetic_energy(r: jnp.ndarray, inv_mass: jnp.ndarray) -> jnp.ndarray:
    return 0.5 * jnp.sum(r * mass_velocity(inv_mass, r))


def sample_momentum(key, inv_mass: jnp.ndarray) -> jnp.ndarray:
    # r ~ N(0, M) with M = Σ⁻¹ (Σ = inv_mass, the posterior-cov estimate)
    if inv_mass.ndim == 2:
        # Σ = LLᵀ  ⇒  r = L⁻ᵀξ has cov L⁻ᵀL⁻¹ = Σ⁻¹ (dim is tiny for the
        # hyperparameter posteriors dense mass targets; one small chol per draw)
        xi = jax.random.normal(key, inv_mass.shape[-1:], dtype=inv_mass.dtype)
        L = jnp.linalg.cholesky(inv_mass)
        return jax.scipy.linalg.solve_triangular(L, xi, lower=True, trans=1)
    return jax.random.normal(key, inv_mass.shape, dtype=inv_mass.dtype) / jnp.sqrt(inv_mass)


def find_reasonable_step_size(potential_grad: Callable, z: jnp.ndarray,
                              inv_mass: jnp.ndarray, key,
                              init_step: float = 1.0) -> jnp.ndarray:
    """Heuristic initial step size (Hoffman & Gelman Alg. 4), jitted while_loop."""
    u0, grad0 = potential_grad(z)
    r = sample_momentum(key, inv_mass)
    h0 = u0 + kinetic_energy(r, inv_mass)

    def accept_logprob(eps):
        z1, r1, u1, _ = leapfrog(potential_grad, z, r, eps, inv_mass, grad0)
        h1 = u1 + kinetic_energy(r1, inv_mass)
        return h0 - h1  # log accept ratio

    eps0 = jnp.asarray(init_step, dtype=z.dtype)
    lp0 = accept_logprob(eps0)
    # NaN-proof: if the initial step diverges, treat as "too big"
    lp0 = jnp.where(jnp.isnan(lp0), -jnp.inf, lp0)
    direction = jnp.where(lp0 > jnp.log(0.5), 1.0, -1.0)

    def cond(carry):
        eps, lp, it = carry
        keep_going = jnp.where(direction > 0, lp > jnp.log(0.5), lp < jnp.log(0.5))
        return jnp.logical_and(keep_going, it < 100)

    def body(carry):
        eps, lp, it = carry
        eps_new = eps * jnp.where(direction > 0, 2.0, 0.5)
        lp_new = accept_logprob(eps_new)
        lp_new = jnp.where(jnp.isnan(lp_new), -jnp.inf, lp_new)
        return eps_new, lp_new, it + 1

    eps, _, _ = jax.lax.while_loop(cond, body, (eps0, lp0, jnp.zeros((), jnp.int32)))
    return jnp.clip(eps, 1e-7, 1e3)


def warmup_schedule(num_warmup: int, init_buffer: int = 75, term_buffer: int = 50,
                    base_window: int = 25):
    """Stan-style adaptation schedule.  Returns, per warmup step, a pair of flags:
    (update_mass_window, is_window_end) as numpy-backed jnp arrays for scan.

    Every mass-matrix update restarts dual averaging (nuts.py end_window), whose
    early iterates are biased toward mu = log(10 eps) (the Hoffman-Gelman
    transient) — so a mass window may only close if a REAL term buffer
    (>= 20 steps) remains for the step size to re-converge before the average
    is frozen.  A proportional 10% buffer is not enough at small budgets:
    measured at n=8192 with num_warmup=50, the old schedule closed its window
    at step 44, leaving 5 recovery steps and an inflated frozen step size —
    sampling accept 0.39 vs 0.81 with step-size-only adaptation (BENCH r03
    validation run).  When no window fits under that constraint the schedule
    degrades to step-size-only adaptation (identity metric), which is the
    measured-good small-budget behavior."""
    no_mass = (jnp.zeros((num_warmup,), bool), jnp.zeros((num_warmup,), bool))
    if num_warmup < 20:
        # tiny warmup: only step-size adaptation
        return no_mass
    if num_warmup < init_buffer + term_buffer + base_window:
        init_buffer = int(0.15 * num_warmup)
        term_buffer = max(20, int(0.1 * num_warmup))
    ends = []
    pos = init_buffer
    w = base_window
    while pos + w + term_buffer <= num_warmup:
        pos += w
        ends.append(pos - 1)
        w *= 2
    if not ends:
        # no window fits with a usable term buffer: accumulating Welford
        # without ever applying it would waste nothing but flags — degrade
        # explicitly to step-size-only adaptation
        return no_mass
    ends[-1] = num_warmup - term_buffer - 1
    in_window = [init_buffer <= i <= (num_warmup - term_buffer - 1) for i in range(num_warmup)]
    window_end = [i in set(ends) for i in range(num_warmup)]
    return jnp.asarray(in_window), jnp.asarray(window_end)
