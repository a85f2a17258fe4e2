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
    mass_velocity,
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


def _is_turning(inv_mass, r_left, r_right, r_sum):
    """Generalized U-turn criterion (Betancourt 2017, App. A.4.2)."""
    v_left = mass_velocity(inv_mass, r_left)
    v_right = mass_velocity(inv_mass, r_right)
    rho = r_sum - 0.5 * (r_left + r_right)
    # HIGHEST: the stop decision is a sign test of a near-zero-crossing dot —
    # bf16 truncation here perturbs trajectory lengths (f32 rule 1, CLAUDE.md)
    hi = jax.lax.Precision.HIGHEST
    return (jnp.dot(v_left, rho, precision=hi) <= 0) | (
        jnp.dot(v_right, rho, precision=hi) <= 0)


def _trailing_ones(n):
    return jax.lax.population_count(n ^ (n + 1)) - 1


def _build_subtree(potential_grad, depth, z0, r0, grad0, u0, eps_signed, inv_mass,
                   h0, key, max_depth):
    """Build a balanced subtree of 2**depth leaves starting one leapfrog step
    beyond (z0, r0).  Iterative with early exit on turning/divergence.

    OP-DIET (this runtime executes each XLA op at a multi-ms floor, so the
    per-leapfrog bookkeeping — not the O(n³) math — dominated the sampler;
    measured ~170-230 ms/leapfrog of overhead vs 23-154 ms of potential+grad):
    the (dim,)-sized carry vectors are packed into ONE (6, dim) matrix updated
    by a single masked ``where``, the two checkpoint stacks are one
    (max_depth+1, 2·dim) array with one dynamic-update-slice, the f32 scalars
    ride one (4,) vector, and the per-odd-leaf U-turn while_loop is replaced
    by a vectorized check over all checkpoint slots.  Returns a dict with the
    same keys the doubling loop consumes.
    """
    dim = z0.shape[0]
    dtype = z0.dtype
    num_leaves = jnp.asarray(2, jnp.int32) ** depth
    # V rows: 0 z, 1 r, 2 grad, 3 z_prop, 4 grad_prop, 5 r_sum
    always_rows = jnp.asarray([1, 1, 1, 0, 0, 1], bool)[:, None]
    slots = jnp.arange(max_depth + 1)

    def cond(carry):
        V, S, n, turning, diverging, k, CK = carry
        return (n < num_leaves) & ~turning & ~diverging

    def body(carry):
        V, S, n, turning, diverging, k, CK = carry
        k, k_prop = jax.random.split(k)
        z1, r1, u1, g1 = leapfrog(
            potential_grad, V[0], V[1], eps_signed, inv_mass, V[2]
        )
        energy = u1 + kinetic_energy(r1, inv_mass)
        energy = jnp.where(jnp.isnan(energy), jnp.inf, energy)
        delta = energy - h0
        div1 = delta > MAX_DELTA_ENERGY
        log_w_leaf = -delta
        # progressive multinomial sampling within the subtree
        log_w_new = jnp.logaddexp(S[2], log_w_leaf)
        take_new = jnp.log(jax.random.uniform(k_prop)) < (log_w_leaf - log_w_new)
        accept = jnp.exp(jnp.minimum(0.0, -delta))
        r_sum_old = V[5]
        r_sum_new = r_sum_old + r1

        V_cand = jnp.stack([z1, r1, g1, z1, g1, r_sum_new])
        V = jnp.where(always_rows | take_new, V_cand, V)
        S = jnp.stack([u1, jnp.where(take_new, u1, S[1]), log_w_new,
                       S[3] + accept])

        # checkpoint store (even leaf): slot = popcount(n >> 1); row = [r | Σr]
        slot = jax.lax.population_count(n >> 1)
        is_even = (n % 2) == 0
        ck_row = jnp.concatenate([r1, r_sum_old])[None]
        CK = jnp.where(is_even,
                       jax.lax.dynamic_update_slice(
                           CK, ck_row, (slot, jnp.asarray(0, slot.dtype))), CK)

        # vectorized U-turn: odd leaf n closes t balanced subtrees at slots
        # [idx_max - t + 1, idx_max] — check ALL slots at once, mask the range
        t = _trailing_ones(n)
        in_range = (slots >= slot - t + 1) & (slots <= slot) & ~is_even
        r_a = CK[:, :dim]
        rho = (r_sum_new - CK[:, dim:]) - 0.5 * (r_a + r1)
        turn_all = (jnp.sum(mass_velocity(inv_mass, r_a) * rho, -1) <= 0) | (
            jnp.sum(mass_velocity(inv_mass, r1) * rho, -1) <= 0)
        turning = turning | jnp.any(turn_all & in_range)

        return V, S, n + 1, turning, div1, k, CK

    V0 = jnp.stack([z0, r0, grad0, z0, grad0, jnp.zeros_like(r0)])
    S0 = jnp.asarray([u0, u0, -jnp.inf, 0.0], dtype)
    init = (V0, S0, jnp.asarray(0, jnp.int32), jnp.asarray(False),
            jnp.asarray(False), key, jnp.zeros((max_depth + 1, 2 * dim), dtype))
    V, S, n, turning, diverging, k, CK = jax.lax.while_loop(cond, body, init)
    return {
        "n": n, "z": V[0], "r": V[1], "grad": V[2],
        "z_prop": V[3], "grad_prop": V[4], "r_sum": V[5],
        "u_prop": S[1], "log_weight": S[2], "sum_accept": S[3],
        "turning": turning, "diverging": diverging,
    }


def nuts_step(potential_grad: Callable, state: NUTSState, max_depth: int = 10,
              depth_cap=None) -> NUTSState:
    """One NUTS transition.

    The doubling loop carries ONE packed (9, dim) matrix — rows 0-2 left edge
    (z, r, grad), 3-5 right edge, 6-7 proposal (z, grad), 8 momentum sum —
    plus a (3,) scalar vector (u_prop, log_weight, sum_accept).  Same op-diet
    rationale as _build_subtree: a handful of masked wheres per doubling
    instead of ~20 per-field ops.

    ``depth_cap``: optional TRACED per-step bound on the number of doublings
    (≤ max_depth, which stays the static shape/checkpoint bound).  Two uses:
    segment-padding steps run with cap 0 (a free no-op transition instead of
    a full discarded tree), and early-warmup steps can run shallow trees
    while dual averaging drags the step size into range — before adaptation
    the tree maxes out at 2^max_depth leapfrogs for nothing (the
    ``warmup_depth_cap`` fit option; validated on-chip, WTW_AB_r04/bench).
    """
    dtype = state.z.dtype
    depth_limit = max_depth if depth_cap is None else jnp.minimum(
        jnp.asarray(max_depth, jnp.int32), depth_cap.astype(jnp.int32))
    key, k_mom, k_loop = jax.random.split(state.rng_key, 3)
    r0 = sample_momentum(k_mom, state.inv_mass)
    h0 = state.potential + kinetic_energy(r0, state.inv_mass)

    T0 = jnp.stack([state.z, r0, state.grad, state.z, r0, state.grad,
                    state.z, state.grad, r0])
    Sc0 = jnp.asarray([state.potential, 0.0, 0.0], dtype)
    # validity-gated rows (proposal rows 6-7 are gated by take_new instead)
    gated_rows = jnp.asarray([1, 1, 1, 1, 1, 1, 0, 0, 1], bool)[:, None]

    def cond(carry):
        depth, T, Sc, num_leaves, turning, diverging, k = carry
        return (depth < depth_limit) & ~turning & ~diverging

    def body(carry):
        depth, T, Sc, num_leaves, turning, diverging, k = carry
        k, k_dir, k_sub, k_merge = jax.random.split(k, 4)
        go_right = jax.random.bernoulli(k_dir)
        eps_signed = jnp.where(go_right, state.step_size, -state.step_size)
        edge = jnp.where(go_right, T[3:6], T[0:3])
        u0 = jnp.zeros((), dtype)  # unused by _build_subtree proposals' init

        sub = _build_subtree(
            potential_grad, depth, edge[0], edge[1], edge[2], u0, eps_signed,
            state.inv_mass, h0, k_sub, max_depth,
        )
        sub_valid = ~sub["turning"] & ~sub["diverging"]

        # biased progressive sampling across doublings
        take_new = jnp.log(jax.random.uniform(k_merge)) < (
            sub["log_weight"] - Sc[1]
        )
        take_new = take_new & sub_valid

        subedge = jnp.stack([sub["z"], sub["r"], sub["grad"]])
        left_new = jnp.where(go_right, T[0:3], subedge)
        right_new = jnp.where(go_right, subedge, T[3:6])
        r_sum_new = T[8] + sub["r_sum"]
        prop_new = jnp.where(
            take_new, jnp.stack([sub["z_prop"], sub["grad_prop"]]), T[6:8])
        T_cand = jnp.concatenate(
            [left_new, right_new, prop_new, r_sum_new[None]])
        T_new = jnp.where(gated_rows & ~sub_valid, T, T_cand)

        # U-turn across the merged tree (pre-gating edges, as before)
        turning_combined = _is_turning(
            state.inv_mass, left_new[1], right_new[1], r_sum_new)

        Sc_new = jnp.stack([
            jnp.where(take_new, sub["u_prop"], Sc[0]),
            jnp.where(sub_valid,
                      jnp.logaddexp(Sc[1], sub["log_weight"]), Sc[1]),
            Sc[2] + sub["sum_accept"],
        ])
        return (depth + 1, T_new, Sc_new, num_leaves + sub["n"],
                sub["turning"] | (sub_valid & turning_combined),
                sub["diverging"], k)

    init = (jnp.asarray(0, jnp.int32), T0, Sc0, jnp.zeros((), jnp.int32),
            jnp.asarray(False), jnp.asarray(False), k_loop)
    _, T, Sc, num_leaves, turning, diverging, _ = jax.lax.while_loop(
        cond, body, init)

    accept_prob = Sc[2] / jnp.maximum(num_leaves.astype(dtype), 1.0)
    return NUTSState(
        z=T[6],
        potential=Sc[0],
        grad=T[7],
        step_size=state.step_size,
        inv_mass=state.inv_mass,
        rng_key=key,
        accept_prob=accept_prob,
        num_steps=num_leaves,
        diverging=diverging,
        energy=Sc[0],
    )


class NUTS:
    """NUTS kernel spec (mirrors the constructor role of ``numpyro.infer.NUTS``)."""

    def __init__(self, model, step_size: float = 1.0, max_tree_depth: int = 10,
                 target_accept_prob: float = 0.8, init_strategy: str = "median",
                 dense_mass: bool = False):
        self.model = model
        self.step_size = step_size
        self.max_tree_depth = max_tree_depth
        self.target_accept_prob = target_accept_prob
        self.init_strategy = init_strategy
        # dense_mass: adapt a FULL covariance metric (Welford outer products on
        # Stan's window schedule).  The right metric for small-dim correlated
        # hyperparameter posteriors — e.g. the multitask ICM's (W, v) soft
        # direction (w₁w₂ pinned by B₁₂, the ratio compensated by task noises)
        # that a diagonal metric cannot unit-scale, measured ~800 leapfrogs/
        # transition diagonal vs tens dense on MultiTaskGP (PROFILE_r03.jsonl).
        self.dense_mass = dense_mass


def _resolve_init(init, rng_key):
    """``init`` is either a pytree of unconstrained values or a PURE callable
    ``init_fn(key) -> pytree`` (``ppl.initialize_model(defer_init=True)``).
    The callable form lets the caller fuse the whole init trace into its own
    compiled program — one fewer multi-minute compile round trip through the
    TPU tunnel (VERDICT r03 item 2).

    Returns ``(init_flat(key) -> (dim,), unravel, dim, dtype, is_callable)``.
    Structure comes from ``jax.eval_shape`` (zero device programs).
    """
    if callable(init):
        import numpy as onp

        shapes = jax.eval_shape(init, rng_key)
        dummy = jax.tree_util.tree_map(
            lambda s: onp.zeros(s.shape, s.dtype), shapes)
        flat0, unravel = ravel_pytree(dummy)

        def init_flat(key):
            return ravel_pytree(init(key))[0]

        return init_flat, unravel, flat0.shape[0], flat0.dtype, True
    z0_flat, unravel = ravel_pytree(init)
    return (lambda key: z0_flat), unravel, z0_flat.shape[0], z0_flat.dtype, False


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
    dense_mass: bool = False,
    warmup_depth_cap=None,
):
    """Warmup + sampling for ONE chain over a pytree of unconstrained latents
    (or a pure ``init_fn(key)`` callable — see :func:`_resolve_init`).

    Returns (flat samples (num_samples, dim), stats dict, unravel_fn).
    jit/vmap-safe: call under vmap over `rng_key`/`init_unconstrained` for chains.
    """
    init_flat, unravel, dim, dtype, is_callable = _resolve_init(
        init_unconstrained, rng_key)

    def pot_flat(zf):
        return potential_fn(unravel(zf))

    potential_grad = jax.value_and_grad(pot_flat)

    inv_mass0 = jnp.eye(dim, dtype=dtype) if dense_mass else jnp.ones((dim,), dtype)
    if is_callable:
        k_init, k_eps, k_run = jax.random.split(rng_key, 3)
    else:
        k_init = rng_key  # unused by the concrete-init closure
        k_eps, k_run = jax.random.split(rng_key)
    z0_flat = init_flat(k_init)
    eps0 = find_reasonable_step_size(potential_grad, z0_flat, inv_mass0, k_eps, init_step_size)

    u0, g0 = potential_grad(z0_flat)
    state0 = NUTSState(
        z=z0_flat, potential=u0, grad=g0, step_size=eps0, inv_mass=inv_mass0,
        rng_key=k_run, accept_prob=jnp.zeros((), dtype),
        num_steps=jnp.zeros((), jnp.int32), diverging=jnp.asarray(False),
        energy=u0,
    )

    xs = _warmup_xs(num_warmup, num_samples, max_tree_depth, warmup_depth_cap)
    step_fn = _make_step_fn(
        potential_grad, max_tree_depth, target_accept_prob, dim, dtype,
        dense_mass=dense_mass,
    )

    da0 = da_init(eps0)
    wf0 = welford_init(dim, dtype, dense=dense_mass)
    (state, da, _), (zs, stats) = jax.lax.scan(
        step_fn, (state0, da0, wf0), xs, length=num_warmup + num_samples,
    )
    if not collect_warmup:
        zs = zs[num_warmup:]
        stats = {k: v[num_warmup:] for k, v in stats.items()}
    return zs, stats, unravel


def _host_sync(x) -> float:
    """True execution barrier: fetch one element to the host.

    On the remote-executed runtime, ``block_until_ready`` has been observed to
    acknowledge at ENQUEUE time under load (per-segment walls of ~0.3 ms for
    ~10 s of leapfrog work, "665k leapfrogs/s" ghosts in a bench line); a
    host transfer cannot complete before the producing program has executed,
    so segment telemetry stays honest.  Costs one scalar fetch.
    """
    return float(jax.device_get(jnp.ravel(x)[-1]))


def _warmup_xs(num_warmup: int, num_samples: int, max_depth: int = 10,
               warmup_depth_cap=None):
    """Per-step adaptation flags + per-step tree-depth cap for the
    warmup+sampling scan.

    ``warmup_depth_cap``: optional ``(cap, n_steps)`` — the first ``n_steps``
    warmup transitions run with tree depth ≤ cap.  Before dual averaging has
    pulled the step size into range, every tree maxes out at 2^max_depth
    leapfrogs for nothing; a shallow cap there buys the same adaptation at a
    fraction of the n³ work (only ever applied to the step-size-only head of
    warmup, never to sampling)."""
    in_window, window_end = warmup_schedule(num_warmup)
    total = num_warmup + num_samples
    steps = jnp.arange(total)
    is_warmup = steps < num_warmup
    is_warmup_next = jnp.arange(1, total + 1) < num_warmup
    in_window = jnp.concatenate([in_window, jnp.zeros((num_samples,), bool)])
    window_end = jnp.concatenate([window_end, jnp.zeros((num_samples,), bool)])
    depth_cap = jnp.full((total,), max_depth, jnp.int32)
    if warmup_depth_cap is not None:
        cap, n_steps = warmup_depth_cap
        head = steps < min(int(n_steps), num_warmup)
        depth_cap = jnp.where(head, jnp.int32(cap), depth_cap)
    return is_warmup, is_warmup_next, in_window, window_end, depth_cap


def _dummy_carry_np(dim, dtype, dense_mass, key_like, num_chains=None):
    """Host-side zero-valued (state, dual-averaging, Welford) carry matching
    the segment program's signature.  The first segment call REPLACES it
    inside the program (``is_first`` branch of the fused setup); building it
    from numpy keeps per-fit eager device dispatches at zero — each eager op
    on the remote runtime is a sub-cache-threshold compile repaid by every
    process (CLAUDE.md eager-trace rule)."""
    import numpy as onp

    lead = () if num_chains is None else (num_chains,)
    npdtype = onp.dtype(dtype)
    mshape = (dim, dim) if dense_mass else (dim,)
    base_mass = (onp.eye(dim, dtype=npdtype) if dense_mass
                 else onp.ones((dim,), npdtype))
    key_like = onp.asarray(key_like)
    state = NUTSState(
        z=onp.zeros(lead + (dim,), npdtype),
        potential=onp.zeros(lead, npdtype),
        grad=onp.zeros(lead + (dim,), npdtype),
        step_size=onp.ones(lead, npdtype),
        inv_mass=onp.broadcast_to(base_mass, lead + mshape).copy(),
        rng_key=onp.broadcast_to(key_like, lead + key_like.shape).copy(),
        accept_prob=onp.zeros(lead, npdtype),
        num_steps=onp.zeros(lead, onp.int32),
        diverging=onp.zeros(lead, bool),
        energy=onp.zeros(lead, npdtype),
    )
    da = DualAveragingState(
        log_step=onp.zeros(lead, npdtype),
        log_step_avg=onp.zeros(lead, npdtype),
        grad_sum=onp.zeros(lead, npdtype),
        t=onp.zeros(lead, npdtype),
        mu=onp.zeros(lead, npdtype),
    )
    wf = WelfordState(
        mean=onp.zeros(lead + (dim,), npdtype),
        m2=onp.zeros(lead + mshape, npdtype),
        count=onp.zeros(lead, npdtype),
    )
    return state, da, wf


def _make_step_fn(potential_grad, max_tree_depth, target_accept_prob,
                  dim, dtype, dense_mass: bool = False):
    """One NUTS transition + adaptation bookkeeping, shaped for lax.scan.
    The (expensive) nuts_step traces exactly once per compiled program."""

    def step_fn(carry, xs):
        state, da, wf = carry
        warm, warm_next, in_win, win_end, depth_cap = xs
        state = nuts_step(potential_grad, state, max_tree_depth,
                          depth_cap=depth_cap)

        # dual averaging: only advances during warmup
        da_new = da_update(da, state.accept_prob, target_accept_prob)
        da = jax.tree_util.tree_map(lambda n, o: jnp.where(warm, n, o), da_new, da)
        # next step uses the live DA iterate while still warming up, the
        # averaged (frozen) step size once sampling starts.  Before any DA
        # update has happened (t == 0, i.e. num_warmup == 0) the average is
        # uninitialized — fall back to the live value, which still equals the
        # initial step size.  (Keeps eps0 out of the closure so the compiled
        # step program is not value-specialized on it.)
        log_eps_frozen = jnp.where(da.t > 0, da.log_step_avg, da.log_step)
        step_size = jnp.exp(jnp.where(warm_next, da.log_step, log_eps_frozen))
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
                welford_init(dim, dtype, dense=dense_mass),
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
    dense_mass: bool = False,
    collect_warmup: bool = False,
    segment_callback: Optional[Callable] = None,
    deadline: Optional[float] = None,
    warmup_depth_cap=None,
):
    """Warmup + sampling executed in Python-driven segments of ``segment_size``
    NUTS transitions, carrying (state, adaptation) between device calls.

    Identical math to :func:`run_nuts`, but each device execution is bounded —
    required where very long single executions hit runtime limits (large n), and
    it provides progress reporting and a natural mid-run checkpoint boundary.
    Returns (flat samples (num_samples, dim), stats dict, unravel_fn).

    The whole fit is ONE compiled program: the setup work (init-trace draws
    when ``init_unconstrained`` is a callable, step-size search, initial
    potential/grad) rides an ``is_first`` branch inside the segment program,
    so a cold fit pays a single multi-minute compile round trip through the
    TPU tunnel instead of three (init + setup + scan — VERDICT r03 item 2).
    All PRNG keys enter as program ARGUMENTS, so a refit with a new key is a
    persistent-cache hit.

    ``segment_callback``: optional ``f(info_dict)`` called after every
    segment with cumulative telemetry (segments done, wall, leapfrogs) —
    bench harnesses emit provisional result lines from it so a killed run
    still lands a line.  ``deadline``: optional ``time.perf_counter()`` value;
    once warmup has completed, the runner stops launching further segments
    past the deadline and returns the samples collected so far.  A deadline
    that fires mid-warmup FREEZES adaptation at the segment boundary and
    repurposes the remaining plan as posterior draws; note the one-step
    seam: the first post-freeze draw still uses the live dual-averaging step
    size already written into the device carry (valid MCMC — the step size
    is a deterministic proposal parameter — just one less-adapted draw).
    """
    import numpy as onp

    init_flat, unravel, dim, dtype, _ = _resolve_init(init_unconstrained, rng_key)

    def pot_flat(zf):
        return potential_fn(unravel(zf))

    potential_grad = jax.value_and_grad(pot_flat)

    inv_mass0 = jnp.eye(dim, dtype=dtype) if dense_mass else jnp.ones((dim,), dtype)
    k_init, k_eps, k_run = jax.random.split(rng_key, 3)

    step_fn = _make_step_fn(
        potential_grad, max_tree_depth, target_accept_prob, dim, dtype,
        dense_mass=dense_mass,
    )

    def fresh_carry(keys):
        ki, ke, kr = keys
        z0 = init_flat(ki)
        eps0 = find_reasonable_step_size(potential_grad, z0, inv_mass0, ke,
                                         init_step_size)
        u0, g0 = potential_grad(z0)
        state0 = NUTSState(
            z=z0, potential=u0, grad=g0, step_size=eps0, inv_mass=inv_mass0,
            rng_key=kr, accept_prob=jnp.zeros((), dtype),
            num_steps=jnp.zeros((), jnp.int32), diverging=jnp.asarray(False),
            energy=u0,
        )
        return state0, da_init(eps0), welford_init(dim, dtype, dense=dense_mass)

    def seg_prog(carry, xs, is_first, keys):
        carry = jax.lax.cond(is_first, lambda c: fresh_carry(keys),
                             lambda c: c, carry)
        return jax.lax.scan(step_fn, carry, xs, length=segment_size)

    seg_scan = jax.jit(seg_prog)

    total = num_warmup + num_samples
    pad = (-total) % segment_size
    xs_np = [onp.asarray(x) for x in _warmup_xs(
        num_warmup, num_samples, max_tree_depth, warmup_depth_cap)]
    # dtype-aware padding; the depth-cap row pads with 0, so padded steps run
    # ZERO tree doublings (a free no-op transition) instead of a full
    # discarded tree
    xs_np = [onp.concatenate([x, onp.zeros(pad, x.dtype)]) for x in xs_np]

    carry = _dummy_carry_np(dim, dtype, dense_mass, onp.asarray(k_run))
    zs_parts, stats_parts, seg_wall = [], [], []
    n_segments = (total + pad) // segment_size
    num_warmup_eff = num_warmup  # may shrink if the deadline fires mid-warmup
    import time as _time
    t_start = _time.perf_counter()
    for s in range(n_segments):
        sl = slice(s * segment_size, (s + 1) * segment_size)
        xs_seg = tuple(jnp.asarray(x[sl]) for x in xs_np)
        t0 = _time.perf_counter()
        carry, (zs, stats) = seg_scan(carry, xs_seg, jnp.asarray(s == 0),
                                      (k_init, k_eps, k_run))
        _host_sync(carry[0].z)  # true barrier (see _host_sync)
        seg_wall.append(_time.perf_counter() - t0)
        zs_parts.append(zs)
        stats_parts.append(stats)
        done = min((s + 1) * segment_size, total)
        if progress:
            print(f"  NUTS segment {s + 1}/{n_segments} ({done}/{total} steps)",
                  flush=True)
        if segment_callback is not None:
            segment_callback({
                "segments_done": s + 1, "n_segments": n_segments,
                "steps_done": done, "total_steps": total,
                "wall_s": _time.perf_counter() - t_start,
                "segment_wall_s": list(seg_wall),
                "segment_leapfrogs": [
                    int(onp.asarray(p["num_steps"]).sum()) for p in stats_parts],
            })
        if deadline is not None and _time.perf_counter() >= deadline:
            if done < num_warmup_eff:
                # budget exhausted DURING warmup (tunnel weather can slow the
                # same run 6x mid-flight — BENCH_NOTES r04): end warmup at
                # this segment boundary.  Adaptation freezes (the step
                # program's warm/warm_next/in_window flags are ARGUMENTS, so
                # the remaining plan is rewritten host-side with no
                # recompile); the frozen step size is the dual-averaging
                # average so far, and un-applied mass-window accumulation is
                # simply never applied.  Still exact MCMC — only proposal
                # adaptation quality is reduced, and the caller sees it via
                # `warmup_steps_run` + the accept-rate stats.
                num_warmup_eff = done
                for x in xs_np[:4]:
                    x[done:] = False
                # steps repurposed as posterior draws must not inherit the
                # warmup head's shallow depth cap (advisor r04): restore the
                # full tree depth from the freeze point on
                xs_np[4][done:] = max_tree_depth
            elif done > num_warmup_eff and done < total:
                # budget exhausted after warmup: return the draws collected
                # so far (an honest, smaller posterior sample) instead of
                # being killed mid-run with nothing
                total = done
                break

    start = 0 if collect_warmup else num_warmup_eff
    zs = jnp.concatenate(zs_parts, axis=0)[start:total]
    stats = {
        k: jnp.concatenate([p[k] for p in stats_parts], axis=0)[start:total]
        for k in stats_parts[0]
    }
    # per-segment wall-clock (segment 1 includes compile) — lets callers
    # separate compile from sampling throughput
    stats["segment_wall_s"] = jnp.asarray(seg_wall)
    # per-segment leapfrog counts over ALL transitions — the sliced num_steps
    # above drops warmup, whose (often deepest) trees dominate early segments;
    # throughput computed from sliced counts over-reports ms/leapfrog
    stats["segment_leapfrogs"] = jnp.asarray(
        [p["num_steps"].sum() for p in stats_parts], jnp.int32)
    # warmup transitions actually run (< num_warmup when the deadline fired
    # mid-warmup and adaptation was frozen at a segment boundary)
    stats["warmup_steps_run"] = jnp.asarray(num_warmup_eff, jnp.int32)
    # mean acceptance over ALL executed transitions (warmup included, padding
    # excluded): the per-draw accept_prob above is meaningless when a
    # deadline leaves only a couple of draws
    acc_all = jnp.concatenate(
        [p["accept_prob"] for p in stats_parts], axis=0)[:total]
    stats["accept_mean_all"] = acc_all.mean()
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
    warmup_depth_cap=None,
    dense_mass: bool = False,
    segment_callback: Optional[Callable] = None,
    deadline: Optional[float] = None,
):
    """Vectorized (lockstep-vmapped) chains with bounded device segments.

    Chains share the adaptation schedule and run as ONE program per segment —
    the per-transition tree bookkeeping (the dominant overhead of small-op
    NUTS on this runtime) is paid once per lockstep step instead of once per
    chain, and the per-leapfrog O(n³) work batches on the MXU.  Combines the
    fault-avoidance of :func:`run_nuts_segmented` (bounded call durations,
    N8192_NOTE.md) with multi-chain statistical practice.

    ``init_unconstrained_batch``: pytree with leading chain axis (C, ...), or
    a PURE callable ``init_batch_fn(key) -> pytree`` with the same leading
    axis (the deferred-init path: its trace fuses into the segment program).
    ``shard_put``: optional callable applied to the batched carry after init
    (e.g. placing the chain axis on a device mesh for chain_method='parallel').
    Returns (zs (C, num_samples, dim), stats dict (C, num_samples, ...), unravel).

    Like :func:`run_nuts_segmented`, the whole fit is ONE compiled program
    (vmapped setup fused into the first segment via an ``is_first`` branch;
    keys enter as arguments so refits are persistent-cache hits).

    ``segment_callback`` / ``deadline``: identical hostile-window semantics
    to :func:`run_nuts_segmented` (VERDICT r04 item 3) — per-segment
    telemetry for provisional result lines, post-warmup deadline truncation,
    and a mid-warmup deadline freezes adaptation at the segment boundary
    (all chains share the lockstep schedule, so the freeze rewrites the same
    host-side plan rows; ``warmup_steps_run`` reports it).
    """
    import numpy as onp

    if callable(init_unconstrained_batch):
        shapes = jax.eval_shape(init_unconstrained_batch, rng_key)
        dummy_b = jax.tree_util.tree_map(
            lambda s: onp.zeros(s.shape, s.dtype), shapes)
        _, unravel = ravel_pytree(
            jax.tree_util.tree_map(lambda x: x[0], dummy_b))
        dim = sum(int(onp.prod(x.shape[1:])) for x in
                  jax.tree_util.tree_leaves(dummy_b))
        dtype = jnp.result_type(*[x.dtype for x in
                                  jax.tree_util.tree_leaves(dummy_b)])

        def init_flat_batch(key):
            return jax.vmap(lambda t: ravel_pytree(t)[0])(
                init_unconstrained_batch(key))
    else:
        z0_one = jax.tree_util.tree_map(
            lambda x: x[0], init_unconstrained_batch)
        _, unravel = ravel_pytree(z0_one)
        z0_flat = jax.vmap(lambda t: ravel_pytree(t)[0])(
            init_unconstrained_batch)
        dim = z0_flat.shape[-1]
        dtype = z0_flat.dtype

        def init_flat_batch(key):
            return z0_flat

    def pot_flat(zf):
        return potential_fn(unravel(zf))

    potential_grad = jax.value_and_grad(pot_flat)

    inv_mass0 = jnp.eye(dim, dtype=dtype) if dense_mass else jnp.ones((dim,), dtype)
    k_init, k_eps, k_run = jax.random.split(rng_key, 3)

    step_fn = _make_step_fn(
        potential_grad, max_tree_depth, target_accept_prob, dim, dtype,
        dense_mass=dense_mass,
    )

    def step_vm(carry, xs):
        new_carry, out = jax.vmap(lambda c: step_fn(c, xs))(carry)
        return new_carry, out

    def fresh_carry(keys):
        ki, ke, kr = keys
        z0b = init_flat_batch(ki)
        eps_keys = jax.random.split(ke, num_chains)
        run_keys = jax.random.split(kr, num_chains)
        eps0, (u0, g0) = jax.vmap(
            lambda z, k: (find_reasonable_step_size(
                potential_grad, z, inv_mass0, k, init_step_size),
                potential_grad(z))
        )(z0b, eps_keys)
        state0 = NUTSState(
            z=z0b, potential=u0, grad=g0, step_size=eps0,
            inv_mass=jnp.broadcast_to(inv_mass0,
                                      (num_chains,) + inv_mass0.shape),
            rng_key=run_keys,
            accept_prob=jnp.zeros((num_chains,), dtype),
            num_steps=jnp.zeros((num_chains,), jnp.int32),
            diverging=jnp.zeros((num_chains,), bool),
            energy=u0,
        )
        da0 = jax.vmap(da_init)(eps0)
        wf0 = jax.vmap(lambda _: welford_init(dim, dtype, dense=dense_mass))(
            jnp.arange(num_chains))
        return state0, da0, wf0

    def seg_prog(carry, xs, is_first, keys):
        carry = jax.lax.cond(is_first, lambda c: fresh_carry(keys),
                             lambda c: c, carry)
        return jax.lax.scan(step_vm, carry, xs, length=segment_size)

    seg_scan = jax.jit(seg_prog)

    total = num_warmup + num_samples
    pad = (-total) % segment_size
    xs_np = [onp.asarray(x) for x in _warmup_xs(
        num_warmup, num_samples, max_tree_depth, warmup_depth_cap)]
    # dtype-aware padding; the depth-cap row pads with 0, so padded steps run
    # ZERO tree doublings (a free no-op transition) instead of a full
    # discarded tree
    xs_np = [onp.concatenate([x, onp.zeros(pad, x.dtype)]) for x in xs_np]

    carry = _dummy_carry_np(dim, dtype, dense_mass, onp.asarray(k_run),
                            num_chains=num_chains)
    if shard_put is not None:
        carry = shard_put(carry)
    zs_parts, stats_parts, seg_wall = [], [], []
    n_segments = (total + pad) // segment_size
    num_warmup_eff = num_warmup  # may shrink if the deadline fires mid-warmup
    import time as _time
    t_start = _time.perf_counter()
    for s in range(n_segments):
        sl = slice(s * segment_size, (s + 1) * segment_size)
        xs_seg = tuple(jnp.asarray(x[sl]) for x in xs_np)
        t0 = _time.perf_counter()
        carry, (zs, stats) = seg_scan(carry, xs_seg, jnp.asarray(s == 0),
                                      (k_init, k_eps, k_run))
        _host_sync(carry[0].z)  # true barrier (see _host_sync)
        seg_wall.append(_time.perf_counter() - t0)
        zs_parts.append(zs)
        stats_parts.append(stats)
        done = min((s + 1) * segment_size, total)
        if progress:
            print(f"  NUTS segment {s + 1}/{n_segments} ({done}/{total} steps, "
                  f"{num_chains} chains)", flush=True)
        if segment_callback is not None:
            segment_callback({
                "segments_done": s + 1, "n_segments": n_segments,
                "steps_done": done, "total_steps": total,
                "num_chains": num_chains,
                "wall_s": _time.perf_counter() - t_start,
                "segment_wall_s": list(seg_wall),
                "segment_leapfrogs": [
                    int(onp.asarray(p["num_steps"]).sum()) for p in stats_parts],
            })
        if deadline is not None and _time.perf_counter() >= deadline:
            if done < num_warmup_eff:
                # mid-warmup freeze at a segment boundary — the lockstep plan
                # rows are shared by every chain, so one host-side rewrite
                # freezes adaptation for all of them (same semantics + seam
                # as run_nuts_segmented; still exact MCMC)
                num_warmup_eff = done
                for x in xs_np[:4]:
                    x[done:] = False
                xs_np[4][done:] = max_tree_depth
            elif done > num_warmup_eff and done < total:
                total = done
                break

    # scan emits (steps, C, ...) — concat on steps, drop warmup, chain-major
    zs = jnp.concatenate(zs_parts, axis=0)[num_warmup_eff:total]
    zs = jnp.swapaxes(zs, 0, 1)
    stats = {
        k: jnp.swapaxes(
            jnp.concatenate([p[k] for p in stats_parts],
                            axis=0)[num_warmup_eff:total],
            0, 1)
        for k in stats_parts[0]
    }
    # same per-segment telemetry as run_nuts_segmented (CLAUDE.md: trust
    # per-segment numbers over single wall clocks on this tunnel runtime);
    # leapfrogs summed over chains AND all transitions incl. warmup
    stats["segment_wall_s"] = jnp.asarray(seg_wall)
    stats["segment_leapfrogs"] = jnp.asarray(
        [p["num_steps"].sum() for p in stats_parts], jnp.int32)
    stats["warmup_steps_run"] = jnp.asarray(num_warmup_eff, jnp.int32)
    acc_all = jnp.concatenate(
        [p["accept_prob"] for p in stats_parts], axis=0)[:total]
    stats["accept_mean_all"] = acc_all.mean()
    return zs, stats, unravel
