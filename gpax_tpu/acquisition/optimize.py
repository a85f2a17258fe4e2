"""Continuous acquisition optimization.

Functional parity with gpax/acquisition/optimize.py:19-88 (random multi-start ->
best initial guess -> bounded quasi-Newton refinement), but ON DEVICE: instead of
bouncing to host SciPy through jaxopt's ScipyBoundedMinimize, the refinement runs
optax's L-BFGS with bound projection, fully jit-compiled.  A scipy fallback is kept
for parity in odd corner cases (``backend='scipy'``).
"""

from __future__ import annotations

from typing import Callable, List, Tuple, Union

import jax
import jax.numpy as jnp
import jax.random as jra
import numpy as onp
import optax


def ensure_array(x):
    if not isinstance(x, jnp.ndarray):
        if isinstance(x, (list, tuple, float, int, onp.ndarray)):
            x = jnp.array([x]) if isinstance(x, (float, int)) else jnp.asarray(x)
        else:
            raise TypeError(
                f"Expected a list, tuple, float, or array; got {type(x)}"
            )
    return x.astype(jnp.result_type(float))


def optimize_acq(rng_key, model, acq_fn: Callable, num_initial_guesses: int,
                 lower_bound, upper_bound, num_steps: int = 100,
                 backend: str = "optax", **kwargs) -> jnp.ndarray:
    """Maximize an acquisition function within box bounds.

    Random multi-start: draw ``num_initial_guesses`` uniform points, keep the best,
    then refine with projected L-BFGS (on device) or SciPy L-BFGS-B (host).
    """
    lower_bound = ensure_array(lower_bound)
    upper_bound = ensure_array(upper_bound)

    def neg_acq(x):
        x = jnp.atleast_1d(x)
        x = x[None] if x.ndim == 1 else x
        return jnp.reshape(-acq_fn(rng_key, model, x, **kwargs), ())

    initial_guesses = jra.uniform(
        rng_key, shape=(num_initial_guesses, lower_bound.shape[0]),
        minval=lower_bound, maxval=upper_bound,
    )
    initial_acq_vals = acq_fn(rng_key, model, initial_guesses, **kwargs)
    best = initial_guesses[initial_acq_vals.argmax()]

    if backend == "scipy":
        from scipy.optimize import minimize

        val_grad = jax.jit(jax.value_and_grad(neg_acq))

        def fun(x):
            v, g = val_grad(jnp.asarray(x, dtype=lower_bound.dtype))
            return float(v), onp.asarray(g, dtype=onp.float64)

        res = minimize(
            fun, onp.asarray(best), jac=True, method="L-BFGS-B",
            bounds=list(zip(onp.asarray(lower_bound), onp.asarray(upper_bound))),
        )
        return jnp.asarray(res.x, dtype=lower_bound.dtype)

    # on-device projected L-BFGS
    solver = optax.lbfgs()
    value_and_grad = optax.value_and_grad_from_state(neg_acq)

    def step(carry, _):
        params, opt_state = carry
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = solver.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=neg_acq
        )
        params = optax.apply_updates(params, updates)
        params = jnp.clip(params, lower_bound, upper_bound)
        return (params, opt_state), value

    (params, _), _ = jax.lax.scan(
        step, (best, solver.init(best)), None, length=num_steps
    )
    return params
