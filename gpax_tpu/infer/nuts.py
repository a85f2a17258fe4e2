"""Iterative No-U-Turn Sampler, fully jit-compiled.

Replaces numpyro's NUTS/MCMC pair used by every HMC model in the reference
(gpax/models/gp.py:207-218, spm.py:86-125).  Design points:

* The whole trajectory builder is ``lax.while_loop``-based — no Python recursion —
  so warmup + sampling compile to a single XLA program and chains can be ``vmap``-ed
  (chain_method='vectorized') or sharded over a device mesh (chain_method='parallel').
* Multinomial (progressive) sampling over the trajectory, biased progressive sampling
  across doublings, and the generalized U-turn criterion of Betancourt (2017).
* Sub-tree U-turn checks use O(max_depth) checkpointing: after leapfrog leaf ``n``
  (0-indexed within the subtree), even leaves are stored at checkpoint slot
  ``popcount(n >> 1)``; an odd leaf ``n`` closes ``t = trailing_ones(n)`` balanced
  subtrees, checked against slots ``[popcount(n >> 1) - t + 1, popcount(n >> 1)]``.
  (Slot occupancy proof: leaf ``a`` is a live left edge iff ``a`` is even and the
  subtree ``[a, a + 2^k)`` is still open; distinct live edges at any time map to
  distinct slots, and dead edges are overwritten exactly when their slot is reused.)
* Diagonal mass-matrix adaptation (Welford) on Stan's warmup window schedule with
  Nesterov dual averaging of the step size.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.flatten_util import ravel_pytree

from .hmc_util import (
    DualAveragingState,
    WelfordState,
    da_init,
    da_update,
    find_reasonable_step_size,
    kinetic_energy,
    leapfrog,
    sample_momentum,
    warmup_schedule,
    welford_init,
    welford_update,
    welford_variance,
)

MAX_DELTA_ENERGY = 1000.0


class NUTSState(NamedTuple):
    z: jnp.ndarray               # flat unconstrained position
    potential: jnp.ndarray
    grad: jnp.ndarray
    step_size: jnp.ndarray
    inv_mass: jnp.ndarray
    rng_key: jnp.ndarray
    # diagnostics of the last transition
    accept_prob: jnp.ndarray
    num_steps: jnp.ndarray
    diverging: jnp.ndarray
    energy: jnp.ndarray


class _TreeState(NamedTuple):
    z_left: jnp.ndarray
    r_left: jnp.ndarray
    grad_left: jnp.ndarray
    z_right: jnp.ndarray
    r_right: jnp.ndarray
    grad_right: jnp.ndarray
    z_prop: jnp.ndarray
    u_prop: jnp.ndarray
    grad_prop: jnp.ndarray
    log_weight: jnp.ndarray
    r_sum: jnp.ndarray
    turning: jnp.ndarray
    diverging: jnp.ndarray
    sum_accept: jnp.ndarray
    num_leaves: jnp.ndarray


def _is_turning(inv_mass, r_left, r_right, r_sum):
    """Generalized U-turn criterion (Betancourt 2017, App. A.4.2)."""
    v_left = inv_mass * r_left
    v_right = inv_mass * r_right
    rho = r_sum - 0.5 * (r_left + r_right)
    return (jnp.dot(v_left, rho) <= 0) | (jnp.dot(v_right, rho) <= 0)


def _trailing_ones(n):
    return jax.lax.population_count(n ^ (n + 1)) - 1


def _build_subtree(potential_grad, depth, z0, r0, grad0, u0, eps_signed, inv_mass,
                   h0, key, max_depth):
    """Build a balanced subtree of 2**depth leaves starting one leapfrog step
    beyond (z0, r0).  Iterative with early exit on turning/divergence."""
    dim = z0.shape[0]
    num_leaves = jnp.asarray(2, jnp.int32) ** depth

    def cond(carry):
        n = carry["n"]
        return (n < num_leaves) & ~carry["turning"] & ~carry["diverging"]

    def body(carry):
        n = carry["n"]
        key, k_prop = jax.random.split(carry["key"])
        z, r, u, grad = leapfrog(
            potential_grad, carry["z"], carry["r"], eps_signed, inv_mass, carry["grad"]
        )
        energy = u + kinetic_energy(r, inv_mass)
        energy = jnp.where(jnp.isnan(energy), jnp.inf, energy)
        delta = energy - h0
        diverging = delta > MAX_DELTA_ENERGY
        log_w_leaf = -delta
        # progressive multinomial sampling within the subtree
        log_w_new = jnp.logaddexp(carry["log_weight"], log_w_leaf)
        take_new = jnp.log(jax.random.uniform(k_prop)) < (log_w_leaf - log_w_new)
        z_prop = jnp.where(take_new, z, carry["z_prop"])
        u_prop = jnp.where(take_new, u, carry["u_prop"])
        grad_prop = jnp.where(take_new, grad, carry["grad_prop"])
        accept = jnp.exp(jnp.minimum(0.0, -delta))

        # checkpoint store (even leaf): slot = popcount(n >> 1)
        slot = jax.lax.population_count(n >> 1)
        is_even = (n % 2) == 0
        r_ckpts = jnp.where(
            is_even,
            carry["r_ckpts"].at[slot].set(r),
            carry["r_ckpts"],
        )
        s_ckpts = jnp.where(
            is_even,
            carry["s_ckpts"].at[slot].set(carry["r_sum"]),
            carry["s_ckpts"],
        )
        r_sum = carry["r_sum"] + r

        # U-turn checks for every balanced subtree closed by odd leaf n
        def check_turning(_):
            idx_max = jax.lax.population_count(n >> 1)
            t = _trailing_ones(n)
            idx_min = idx_max - t + 1

            def c(state):
                i, turning = state
                return (i >= idx_min) & ~turning

            def b(state):
                i, _ = state
                r_a = r_ckpts[i]
                s_before_a = s_ckpts[i]
                sub_sum = r_sum - s_before_a
                return i - 1, _is_turning(inv_mass, r_a, r, sub_sum)

            _, turning = jax.lax.while_loop(c, b, (idx_max, jnp.asarray(False)))
            return turning

        turning = jax.lax.cond(
            (n % 2) == 1, check_turning, lambda _: jnp.asarray(False), operand=None
        )

        return {
            "n": n + 1,
            "z": z, "r": r, "grad": grad, "u": u,
            "z_prop": z_prop, "u_prop": u_prop, "grad_prop": grad_prop,
            "log_weight": log_w_new,
            "r_sum": r_sum,
            "r_first": jnp.where(n == 0, r, carry["r_first"]),
            "z_first": jnp.where(n == 0, z, carry["z_first"]),
            "grad_first": jnp.where(n == 0, grad, carry["grad_first"]),
            "sum_accept": carry["sum_accept"] + accept,
            "turning": turning,
            "diverging": diverging,
            "key": key,
            "r_ckpts": r_ckpts,
            "s_ckpts": s_ckpts,
        }

    init = {
        "n": jnp.asarray(0, jnp.int32),
        "z": z0, "r": r0, "grad": grad0, "u": u0,
        "z_prop": z0, "u_prop": u0, "grad_prop": grad0,
        "log_weight": jnp.asarray(-jnp.inf, z0.dtype),
        "r_sum": jnp.zeros_like(r0),
        "r_first": r0, "z_first": z0, "grad_first": grad0,
        "sum_accept": jnp.zeros((), z0.dtype),
        "turning": jnp.asarray(False),
        "diverging": jnp.asarray(False),
        "key": key,
        "r_ckpts": jnp.zeros((max_depth + 1, dim), z0.dtype),
        "s_ckpts": jnp.zeros((max_depth + 1, dim), z0.dtype),
    }
    out = jax.lax.while_loop(cond, body, init)
    return out


def nuts_step(potential_grad: Callable, state: NUTSState, max_depth: int = 10) -> NUTSState:
    """One NUTS transition."""
    key, k_mom, k_loop = jax.random.split(state.rng_key, 3)
    r0 = sample_momentum(k_mom, state.inv_mass)
    h0 = state.potential + kinetic_energy(r0, state.inv_mass)

    tree0 = _TreeState(
        z_left=state.z, r_left=r0, grad_left=state.grad,
        z_right=state.z, r_right=r0, grad_right=state.grad,
        z_prop=state.z, u_prop=state.potential, grad_prop=state.grad,
        log_weight=jnp.zeros((), state.z.dtype),
        r_sum=r0,
        turning=jnp.asarray(False),
        diverging=jnp.asarray(False),
        sum_accept=jnp.zeros((), state.z.dtype),
        num_leaves=jnp.zeros((), jnp.int32),
    )

    def cond(carry):
        depth, tree, key = carry
        return (depth < max_depth) & ~tree.turning & ~tree.diverging

    def body(carry):
        depth, tree, key = carry
        key, k_dir, k_sub, k_merge = jax.random.split(key, 4)
        go_right = jax.random.bernoulli(k_dir)
        eps_signed = jnp.where(go_right, state.step_size, -state.step_size)
        z0 = jnp.where(go_right, tree.z_right, tree.z_left)
        r0_edge = jnp.where(go_right, tree.r_right, tree.r_left)
        grad0 = jnp.where(go_right, tree.grad_right, tree.grad_left)
        u0 = jnp.zeros((), state.z.dtype)  # unused by _build_subtree proposals' init

        sub = _build_subtree(
            potential_grad, depth, z0, r0_edge, grad0, u0, eps_signed,
            state.inv_mass, h0, k_sub, max_depth,
        )
        sub_valid = ~sub["turning"] & ~sub["diverging"]

        # biased progressive sampling across doublings
        take_new = jnp.log(jax.random.uniform(k_merge)) < (
            sub["log_weight"] - tree.log_weight
        )
        take_new = take_new & sub_valid
        z_prop = jnp.where(take_new, sub["z_prop"], tree.z_prop)
        u_prop = jnp.where(take_new, sub["u_prop"], tree.u_prop)
        grad_prop = jnp.where(take_new, sub["grad_prop"], tree.grad_prop)

        # merge edges / momentum sum only if the subtree is valid
        def merged_edges():
            z_left = jnp.where(go_right, tree.z_left, sub["z"])
            r_left = jnp.where(go_right, tree.r_left, sub["r"])
            grad_left = jnp.where(go_right, tree.grad_left, sub["grad"])
            z_right = jnp.where(go_right, sub["z"], tree.z_right)
            r_right = jnp.where(go_right, sub["r"], tree.r_right)
            grad_right = jnp.where(go_right, sub["grad"], tree.grad_right)
            return z_left, r_left, grad_left, z_right, r_right, grad_right

        z_left, r_left, grad_left, z_right, r_right, grad_right = merged_edges()
        r_sum = tree.r_sum + sub["r_sum"]
        turning_combined = _is_turning(state.inv_mass, r_left, r_right, r_sum)

        new_tree = _TreeState(
            z_left=jnp.where(sub_valid, z_left, tree.z_left),
            r_left=jnp.where(sub_valid, r_left, tree.r_left),
            grad_left=jnp.where(sub_valid, grad_left, tree.grad_left),
            z_right=jnp.where(sub_valid, z_right, tree.z_right),
            r_right=jnp.where(sub_valid, r_right, tree.r_right),
            grad_right=jnp.where(sub_valid, grad_right, tree.grad_right),
            z_prop=z_prop, u_prop=u_prop, grad_prop=grad_prop,
            log_weight=jnp.where(
                sub_valid, jnp.logaddexp(tree.log_weight, sub["log_weight"]), tree.log_weight
            ),
            r_sum=jnp.where(sub_valid, r_sum, tree.r_sum),
            turning=sub["turning"] | (sub_valid & turning_combined),
            diverging=sub["diverging"],
            sum_accept=tree.sum_accept + sub["sum_accept"],
            num_leaves=tree.num_leaves + sub["n"],
        )
        return depth + 1, new_tree, key

    _, tree, _ = jax.lax.while_loop(cond, body, (jnp.asarray(0, jnp.int32), tree0, k_loop))

    accept_prob = tree.sum_accept / jnp.maximum(tree.num_leaves.astype(state.z.dtype), 1.0)
    return NUTSState(
        z=tree.z_prop,
        potential=tree.u_prop,
        grad=tree.grad_prop,
        step_size=state.step_size,
        inv_mass=state.inv_mass,
        rng_key=key,
        accept_prob=accept_prob,
        num_steps=tree.num_leaves,
        diverging=tree.diverging,
        energy=tree.u_prop,
    )


class NUTS:
    """NUTS kernel spec (mirrors the constructor role of ``numpyro.infer.NUTS``)."""

    def __init__(self, model, step_size: float = 1.0, max_tree_depth: int = 10,
                 target_accept_prob: float = 0.8, init_strategy: str = "median",
                 dense_mass: bool = False):
        if dense_mass:
            raise NotImplementedError("diagonal mass matrix only (gpax never uses dense)")
        self.model = model
        self.step_size = step_size
        self.max_tree_depth = max_tree_depth
        self.target_accept_prob = target_accept_prob
        self.init_strategy = init_strategy


def run_nuts(
    potential_fn: Callable,
    init_unconstrained,
    rng_key,
    num_warmup: int,
    num_samples: int,
    max_tree_depth: int = 10,
    target_accept_prob: float = 0.8,
    init_step_size: float = 1.0,
    collect_warmup: bool = False,
):
    """Warmup + sampling for ONE chain over a pytree of unconstrained latents.

    Returns (flat samples (num_samples, dim), stats dict, unravel_fn).
    jit/vmap-safe: call under vmap over `rng_key`/`init_unconstrained` for chains.
    """
    z0_flat, unravel = ravel_pytree(init_unconstrained)
    dim = z0_flat.shape[0]
    dtype = z0_flat.dtype

    def pot_flat(zf):
        return potential_fn(unravel(zf))

    potential_grad = jax.value_and_grad(pot_flat)

    inv_mass0 = jnp.ones((dim,), dtype)
    k_eps, k_run = jax.random.split(rng_key)
    eps0 = find_reasonable_step_size(potential_grad, z0_flat, inv_mass0, k_eps, init_step_size)

    u0, g0 = potential_grad(z0_flat)
    state0 = NUTSState(
        z=z0_flat, potential=u0, grad=g0, step_size=eps0, inv_mass=inv_mass0,
        rng_key=k_run, accept_prob=jnp.zeros((), dtype),
        num_steps=jnp.zeros((), jnp.int32), diverging=jnp.asarray(False),
        energy=u0,
    )

    xs = _warmup_xs(num_warmup, num_samples)
    step_fn = _make_step_fn(
        potential_grad, max_tree_depth, target_accept_prob, eps0,
        num_warmup, dim, dtype,
    )

    da0 = da_init(eps0)
    wf0 = welford_init(dim, dtype)
    (state, da, _), (zs, stats) = jax.lax.scan(
        step_fn, (state0, da0, wf0), xs, length=num_warmup + num_samples,
    )
    if not collect_warmup:
        zs = zs[num_warmup:]
        stats = {k: v[num_warmup:] for k, v in stats.items()}
    return zs, stats, unravel


def _warmup_xs(num_warmup: int, num_samples: int):
    """Per-step adaptation flags for the warmup+sampling scan."""
    in_window, window_end = warmup_schedule(num_warmup)
    total = num_warmup + num_samples
    is_warmup = jnp.arange(total) < num_warmup
    is_warmup_next = jnp.arange(1, total + 1) < num_warmup
    in_window = jnp.concatenate([in_window, jnp.zeros((num_samples,), bool)])
    window_end = jnp.concatenate([window_end, jnp.zeros((num_samples,), bool)])
    return is_warmup, is_warmup_next, in_window, window_end


def _make_step_fn(potential_grad, max_tree_depth, target_accept_prob, eps0,
                  num_warmup, dim, dtype):
    """One NUTS transition + adaptation bookkeeping, shaped for lax.scan.
    The (expensive) nuts_step traces exactly once per compiled program."""

    def step_fn(carry, xs):
        state, da, wf = carry
        warm, warm_next, in_win, win_end = xs
        state = nuts_step(potential_grad, state, max_tree_depth)

        # dual averaging: only advances during warmup
        da_new = da_update(da, state.accept_prob, target_accept_prob)
        da = jax.tree_util.tree_map(lambda n, o: jnp.where(warm, n, o), da_new, da)
        if num_warmup > 0:
            # next step uses the live DA iterate while still warming up, the
            # averaged (frozen) step size once sampling starts
            step_size = jnp.where(warm_next, jnp.exp(da.log_step), jnp.exp(da.log_step_avg))
        else:
            step_size = eps0
        state = state._replace(step_size=step_size)

        # mass-matrix accumulation inside adaptation windows
        wf_new = welford_update(wf, state.z)
        wf = jax.tree_util.tree_map(lambda n, o: jnp.where(in_win, n, o), wf_new, wf)

        def end_window(args):
            state, da, wf = args
            inv_mass = welford_variance(wf)
            return (
                state._replace(inv_mass=inv_mass),
                da_init(jnp.exp(da.log_step)),
                welford_init(dim, dtype),
            )

        state, da, wf = jax.lax.cond(win_end, end_window, lambda a: a, (state, da, wf))
        stats = {
            "accept_prob": state.accept_prob,
            "num_steps": state.num_steps,
            "diverging": state.diverging,
            "potential_energy": state.potential,
            "step_size": state.step_size,
        }
        return (state, da, wf), (state.z, stats)

    return step_fn


def run_nuts_segmented(
    potential_fn: Callable,
    init_unconstrained,
    rng_key,
    num_warmup: int,
    num_samples: int,
    segment_size: int = 50,
    max_tree_depth: int = 10,
    target_accept_prob: float = 0.8,
    init_step_size: float = 1.0,
    progress: bool = False,
):
    """Warmup + sampling executed in Python-driven segments of ``segment_size``
    NUTS transitions, carrying (state, adaptation) between device calls.

    Identical math to :func:`run_nuts`, but each device execution is bounded —
    required where very long single executions hit runtime limits (large n), and
    it provides progress reporting and a natural mid-run checkpoint boundary.
    Returns (flat samples (num_samples, dim), stats dict, unravel_fn).
    """
    import numpy as onp

    z0_flat, unravel = ravel_pytree(init_unconstrained)
    dim = z0_flat.shape[0]
    dtype = z0_flat.dtype

    def pot_flat(zf):
        return potential_fn(unravel(zf))

    potential_grad = jax.value_and_grad(pot_flat)

    inv_mass0 = jnp.ones((dim,), dtype)
    k_eps, k_run = jax.random.split(rng_key)
    eps0 = jax.jit(
        lambda k: find_reasonable_step_size(potential_grad, z0_flat, inv_mass0, k, init_step_size)
    )(k_eps)
    u0, g0 = jax.jit(potential_grad)(z0_flat)
    state0 = NUTSState(
        z=z0_flat, potential=u0, grad=g0, step_size=eps0, inv_mass=inv_mass0,
        rng_key=k_run, accept_prob=jnp.zeros((), dtype),
        num_steps=jnp.zeros((), jnp.int32), diverging=jnp.asarray(False),
        energy=u0,
    )

    step_fn = _make_step_fn(
        potential_grad, max_tree_depth, target_accept_prob, eps0,
        num_warmup, dim, dtype,
    )
    seg_scan = jax.jit(
        lambda carry, xs: jax.lax.scan(step_fn, carry, xs, length=segment_size)
    )

    total = num_warmup + num_samples
    pad = (-total) % segment_size
    xs_np = [onp.asarray(x) for x in _warmup_xs(num_warmup, num_samples)]
    xs_np = [onp.concatenate([x, onp.zeros(pad, bool)]) for x in xs_np]

    carry = (state0, da_init(eps0), welford_init(dim, dtype))
    zs_parts, stats_parts, seg_wall = [], [], []
    n_segments = (total + pad) // segment_size
    import time as _time
    for s in range(n_segments):
        sl = slice(s * segment_size, (s + 1) * segment_size)
        xs_seg = tuple(jnp.asarray(x[sl]) for x in xs_np)
        t0 = _time.perf_counter()
        carry, (zs, stats) = seg_scan(carry, xs_seg)
        jax.block_until_ready(zs)
        seg_wall.append(_time.perf_counter() - t0)
        zs_parts.append(zs)
        stats_parts.append(stats)
        if progress:
            done = min((s + 1) * segment_size, total)
            print(f"  NUTS segment {s + 1}/{n_segments} ({done}/{total} steps)",
                  flush=True)

    zs = jnp.concatenate(zs_parts, axis=0)[num_warmup:total]
    stats = {
        k: jnp.concatenate([p[k] for p in stats_parts], axis=0)[num_warmup:total]
        for k in stats_parts[0]
    }
    # per-segment wall-clock (segment 1 includes compile) — lets callers
    # separate compile from sampling throughput
    stats["segment_wall_s"] = jnp.asarray(seg_wall)
    return zs, stats, unravel


def run_nuts_segmented_chains(
    potential_fn: Callable,
    init_unconstrained_batch,
    rng_key,
    num_chains: int,
    num_warmup: int,
    num_samples: int,
    segment_size: int = 50,
    max_tree_depth: int = 10,
    target_accept_prob: float = 0.8,
    init_step_size: float = 1.0,
    progress: bool = False,
    shard_put=None,
):
    """Vectorized (lockstep-vmapped) chains with bounded device segments.

    Chains share the adaptation schedule and run as ONE program per segment —
    the per-transition tree bookkeeping (the dominant overhead of small-op
    NUTS on this runtime) is paid once per lockstep step instead of once per
    chain, and the per-leapfrog O(n³) work batches on the MXU.  Combines the
    fault-avoidance of :func:`run_nuts_segmented` (bounded call durations,
    N8192_NOTE.md) with multi-chain statistical practice.

    ``init_unconstrained_batch``: pytree with leading chain axis (C, ...).
    ``shard_put``: optional callable applied to the batched carry after init
    (e.g. placing the chain axis on a device mesh for chain_method='parallel').
    Returns (zs (C, num_samples, dim), stats dict (C, num_samples, ...), unravel).
    """
    import numpy as onp

    z0_one = jax.tree_util.tree_map(lambda x: x[0], init_unconstrained_batch)
    _, unravel = ravel_pytree(z0_one)
    z0_flat = jax.vmap(lambda t: ravel_pytree(t)[0])(init_unconstrained_batch)
    dim = z0_flat.shape[-1]
    dtype = z0_flat.dtype

    def pot_flat(zf):
        return potential_fn(unravel(zf))

    potential_grad = jax.value_and_grad(pot_flat)

    inv_mass0 = jnp.ones((dim,), dtype)
    k_eps, k_run = jax.random.split(rng_key)
    eps_keys = jax.random.split(k_eps, num_chains)
    run_keys = jax.random.split(k_run, num_chains)
    eps0 = jax.jit(jax.vmap(
        lambda z, k: find_reasonable_step_size(
            potential_grad, z, inv_mass0, k, init_step_size)
    ))(z0_flat, eps_keys)
    u0, g0 = jax.jit(jax.vmap(potential_grad))(z0_flat)
    state0 = NUTSState(
        z=z0_flat, potential=u0, grad=g0, step_size=eps0,
        inv_mass=jnp.broadcast_to(inv_mass0, (num_chains, dim)),
        rng_key=run_keys,
        accept_prob=jnp.zeros((num_chains,), dtype),
        num_steps=jnp.zeros((num_chains,), jnp.int32),
        diverging=jnp.zeros((num_chains,), bool),
        energy=u0,
    )

    def make_chain_step(eps0_c):
        return _make_step_fn(
            potential_grad, max_tree_depth, target_accept_prob, eps0_c,
            num_warmup, dim, dtype,
        )

    def step_vm(carry, xs):
        def one(carry_c, eps0_c):
            state_c, da_c, wf_c = carry_c
            return make_chain_step(eps0_c)((state_c, da_c, wf_c), xs)

        new_carry, out = jax.vmap(one)(carry, eps0)
        return new_carry, out

    seg_scan = jax.jit(
        lambda carry, xs: jax.lax.scan(step_vm, carry, xs, length=segment_size)
    )

    total = num_warmup + num_samples
    pad = (-total) % segment_size
    xs_np = [onp.asarray(x) for x in _warmup_xs(num_warmup, num_samples)]
    xs_np = [onp.concatenate([x, onp.zeros(pad, bool)]) for x in xs_np]

    da0 = jax.vmap(da_init)(eps0)
    wf0 = jax.vmap(lambda _: welford_init(dim, dtype))(jnp.arange(num_chains))
    carry = (state0, da0, wf0)
    if shard_put is not None:
        carry = shard_put(carry)
    zs_parts, stats_parts = [], []
    n_segments = (total + pad) // segment_size
    for s in range(n_segments):
        sl = slice(s * segment_size, (s + 1) * segment_size)
        xs_seg = tuple(jnp.asarray(x[sl]) for x in xs_np)
        carry, (zs, stats) = seg_scan(carry, xs_seg)
        jax.block_until_ready(zs)
        zs_parts.append(zs)
        stats_parts.append(stats)
        if progress:
            done = min((s + 1) * segment_size, total)
            print(f"  NUTS segment {s + 1}/{n_segments} ({done}/{total} steps, "
                  f"{num_chains} chains)", flush=True)

    # scan emits (steps, C, ...) — concat on steps, drop warmup, chain-major
    zs = jnp.concatenate(zs_parts, axis=0)[num_warmup:total]
    zs = jnp.swapaxes(zs, 0, 1)
    stats = {
        k: jnp.swapaxes(
            jnp.concatenate([p[k] for p in stats_parts], axis=0)[num_warmup:total],
            0, 1)
        for k in stats_parts[0]
    }
    return zs, stats, unravel
