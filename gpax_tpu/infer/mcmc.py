"""MCMC driver: chain orchestration over the jitted NUTS engine.

API mirrors ``numpyro.infer.MCMC`` as used by the reference (gpax/models/gp.py:209-218):
``MCMC(NUTS(model), num_warmup, num_samples, num_chains, chain_method).run(key, *args)``
then ``get_samples(group_by_chain)``.

Chain methods (all single-program, TPU-idiomatic):
  * 'vectorized'  — chains vmapped into one XLA program (default for num_chains > 1).
  * 'parallel'    — vmapped AND sharded across the device mesh (chain axis split over
                    ``jax.devices()`` with a NamedSharding) — XLA runs chains on
                    separate chips with zero inter-chip traffic.
  * 'sequential'  — Python loop (debugging / memory-constrained).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.flatten_util
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ppl import initialize_model, trace as ppl_trace, substitute, seed
from . import diagnostics
from .nuts import NUTS, run_nuts


class MCMC:
    def __init__(self, kernel: NUTS, num_warmup: int = 2000, num_samples: int = 2000,
                 num_chains: int = 1, chain_method: str = "sequential",
                 progress_bar: bool = False, jit_model_args: bool = False,
                 segment_size: Optional[int] = None):
        self.kernel = kernel
        self.num_warmup = num_warmup
        self.num_samples = num_samples
        self.num_chains = num_chains
        self.chain_method = chain_method
        self.progress_bar = progress_bar  # accepted for API parity; sampling is one jit
        # segment_size: execute the sampler in bounded Python-driven segments
        # (single-chain only) — progress reporting + bounded device executions
        self.segment_size = segment_size
        # optional per-segment telemetry hook + soft wall-clock deadline for
        # the segmented paths (bench harnesses emit provisional result lines
        # from the callback).  A deadline firing after warmup truncates
        # sampling; firing mid-warmup it FREEZES adaptation at a segment
        # boundary and samples from there (warmup_steps_run reports it) — so
        # a budget-bound run still returns a posterior either way.
        self.segment_callback = None
        self.deadline = None
        # optional (cap, n_steps): run the first n_steps warmup transitions
        # with tree depth <= cap (see nuts._warmup_xs) — big-n fits burn
        # 2^max_depth leapfrogs per step while dual averaging is still
        # pulling the step size into range
        self.warmup_depth_cap = None
        self._samples_by_chain: Optional[Dict[str, jnp.ndarray]] = None
        self._stats: Optional[Dict[str, jnp.ndarray]] = None
        self._model_args = ()
        self._model_kwargs: Dict = {}

    def run(self, rng_key, *model_args, extra_fields=(), init_params=None, **model_kwargs):
        from ..config import get_config, set_config

        cfg = get_config()
        if (cfg.hmc_wtw_precision
                and cfg.hmc_wtw_precision != cfg.wtw_precision):
            # HMC-scoped gradient-precision override (see Config.hmc_wtw_precision):
            # the potential-gradient programs trace inside this call, so the
            # override binds exactly the sampler's backward WᵀW; every other
            # consumer (SVI, predict, user grads) traces outside it.
            set_config(wtw_precision=cfg.hmc_wtw_precision)
            try:
                return self._run(rng_key, *model_args, extra_fields=extra_fields,
                                 init_params=init_params, **model_kwargs)
            finally:
                set_config(wtw_precision=cfg.wtw_precision)
        return self._run(rng_key, *model_args, extra_fields=extra_fields,
                         init_params=init_params, **model_kwargs)

    def _run(self, rng_key, *model_args, extra_fields=(), init_params=None, **model_kwargs):
        import time as _time
        import warnings

        # the hostile-window options only exist on the segmented runners;
        # silently ignoring them on other paths hid real bugs (advisor r04)
        if not self.segment_size:
            ignored = [n for n, v in (("segment_callback", self.segment_callback),
                                      ("deadline", self.deadline),
                                      ("warmup_depth_cap", self.warmup_depth_cap))
                       if v is not None]
            if ignored:
                warnings.warn(
                    f"{', '.join(ignored)} require segment_size (the segmented "
                    "runner paths); ignored on this non-segmented run",
                    stacklevel=2)
        elif self.num_chains > 1 and self.chain_method == "sequential" and (
                self.segment_callback is not None or self.deadline is not None
                or self.warmup_depth_cap is not None):
            warnings.warn(
                "segment_callback/deadline/warmup_depth_cap are not threaded "
                "through chain_method='sequential'; use 'vectorized' or "
                "'parallel' for hostile-window multi-chain runs", stacklevel=2)

        model = self.kernel.model
        self._model_args = model_args
        self._model_kwargs = model_kwargs
        self.timing: Dict[str, float] = {}
        _t0 = _time.perf_counter()

        key_init, key_run = jax.random.split(rng_key)
        # defer_init: structure is captured via eval_shape (zero device
        # programs); the init trace itself fuses into the sampler's compiled
        # program — a cold fit pays ONE compile round trip through the TPU
        # tunnel instead of three (VERDICT r03 item 2, ~200 s of the n=4096
        # headline was the standalone init-program compile)
        info = initialize_model(
            model, key_init, model_args, model_kwargs,
            init_strategy=self.kernel.init_strategy, defer_init=True,
        )
        from .nuts import _host_sync

        # deferred init: a pure init_fn(key) the samplers fuse into their own
        # program.  Concrete values are only materialized where a path needs
        # them (eager fallback for tracer-valued supports, or explicit
        # init_params).
        if init_params is not None:
            init_z = init_params
        elif info.init_fn is None:
            init_z = info.init_unconstrained
        else:
            init_z = None  # deferred

        def init_thunk(key):
            # single-chain init in unconstrained space (key_init is threaded
            # as a program ARGUMENT by the samplers, not baked as a constant)
            if init_z is not None:
                return init_z
            return info.init_fn(key)

        if init_z is not None:
            _host_sync(jax.tree_util.tree_leaves(init_z)[0])
        self.timing["initialize_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        def one_chain(key):
            zs, stats, unravel = run_nuts(
                info.potential_fn, init_thunk, key,
                num_warmup=self.num_warmup,
                num_samples=self.num_samples,
                max_tree_depth=self.kernel.max_tree_depth,
                target_accept_prob=self.kernel.target_accept_prob,
                init_step_size=self.kernel.step_size,
                dense_mass=self.kernel.dense_mass,
            )
            return zs, stats

        # per-chain jitter of the init point (chain 0 keeps the median init)
        def init_batch_fn(key):
            base = init_thunk(jax.random.fold_in(key, 0))
            flat, unravel = jax.flatten_util.ravel_pytree(base)
            jitter_keys = jax.random.split(
                jax.random.fold_in(key, 7), self.num_chains)

            def one(k, i):
                jitter = jnp.where(i == 0, 0.0, 1.0) * jax.random.uniform(
                    k, flat.shape, minval=-1.0, maxval=1.0
                )
                return unravel(flat + jitter)

            return jax.vmap(one)(jitter_keys, jnp.arange(self.num_chains))

        chain_keys = jax.random.split(key_run, self.num_chains)

        if self.num_chains == 1 and self.segment_size:
            from .nuts import run_nuts_segmented

            zs_1, stats_1, _ = run_nuts_segmented(
                info.potential_fn, init_thunk, chain_keys[0],
                num_warmup=self.num_warmup, num_samples=self.num_samples,
                segment_size=self.segment_size,
                max_tree_depth=self.kernel.max_tree_depth,
                target_accept_prob=self.kernel.target_accept_prob,
                init_step_size=self.kernel.step_size,
                dense_mass=self.kernel.dense_mass,
                progress=self.progress_bar,
                segment_callback=self.segment_callback,
                deadline=self.deadline,
                warmup_depth_cap=self.warmup_depth_cap,
            )
            zs = zs_1[None]
            stats = jax.tree_util.tree_map(lambda x: x[None], stats_1)
        elif self.num_chains == 1:
            zs, stats = jax.jit(jax.vmap(one_chain))(chain_keys)
        elif self.chain_method == "sequential":
            outs = []
            for c in range(self.num_chains):
                # per-chain deferred init: slice chain c out of the batched
                # init inside the sampler's own program
                def chain_thunk(key, c=c):
                    return jax.tree_util.tree_map(
                        lambda x: x[c], init_batch_fn(key))

                if self.segment_size:
                    # chains run one at a time, but each chain's device calls
                    # still need bounding at large n (duration-fault rule,
                    # N8192_NOTE.md) — per-chain segmented execution
                    from .nuts import run_nuts_segmented

                    zs_c, stats_c, _ = run_nuts_segmented(
                        info.potential_fn, chain_thunk, chain_keys[c],
                        num_warmup=self.num_warmup,
                        num_samples=self.num_samples,
                        segment_size=self.segment_size,
                        max_tree_depth=self.kernel.max_tree_depth,
                        target_accept_prob=self.kernel.target_accept_prob,
                        init_step_size=self.kernel.step_size,
                        dense_mass=self.kernel.dense_mass,
                        progress=self.progress_bar,
                    )
                    stats_c = {k: v for k, v in stats_c.items()
                               if not k.startswith("segment_")}
                    outs.append((zs_c, stats_c))
                else:
                    def one_chain_c(key, c=c):
                        zs, stats, _ = run_nuts(
                            info.potential_fn,
                            lambda k: jax.tree_util.tree_map(
                                lambda x: x[c], init_batch_fn(k)),
                            key,
                            num_warmup=self.num_warmup,
                            num_samples=self.num_samples,
                            max_tree_depth=self.kernel.max_tree_depth,
                            target_accept_prob=self.kernel.target_accept_prob,
                            init_step_size=self.kernel.step_size,
                            dense_mass=self.kernel.dense_mass,
                        )
                        return zs, stats

                    outs.append(jax.jit(one_chain_c)(chain_keys[c]))
            zs = jnp.stack([o[0] for o in outs])
            stats = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *[o[1] for o in outs])
        elif self.segment_size and self.chain_method in ("vectorized", "parallel"):
            # lockstep-vmapped chains in bounded device segments: tree
            # bookkeeping paid once per step instead of once per chain, and
            # the O(n³) leapfrog work batches on the MXU (nuts.py)
            from .nuts import run_nuts_segmented_chains

            shard_put = None
            if self.chain_method == "parallel" and len(jax.devices()) > 1:
                n_dev = min(len(jax.devices()), self.num_chains)
                while self.num_chains % n_dev:
                    n_dev -= 1
                mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("chains",))
                sharding = NamedSharding(mesh, P("chains"))
                shard_put = lambda tree: jax.tree_util.tree_map(  # noqa: E731
                    lambda x: jax.device_put(x, sharding), tree)
            zs, stats, _ = run_nuts_segmented_chains(
                info.potential_fn, init_batch_fn, key_run,
                num_chains=self.num_chains,
                num_warmup=self.num_warmup, num_samples=self.num_samples,
                segment_size=self.segment_size,
                max_tree_depth=self.kernel.max_tree_depth,
                target_accept_prob=self.kernel.target_accept_prob,
                init_step_size=self.kernel.step_size,
                dense_mass=self.kernel.dense_mass,
                progress=self.progress_bar,
                shard_put=shard_put,
                warmup_depth_cap=self.warmup_depth_cap,
                segment_callback=self.segment_callback,
                deadline=self.deadline,
            )
        else:
            def one_chain_z(key, z0):
                zs, stats, _ = run_nuts(
                    info.potential_fn, z0, key,
                    num_warmup=self.num_warmup,
                    num_samples=self.num_samples,
                    max_tree_depth=self.kernel.max_tree_depth,
                    target_accept_prob=self.kernel.target_accept_prob,
                    init_step_size=self.kernel.step_size,
                    dense_mass=self.kernel.dense_mass,
                )
                return zs, stats

            # materialize the batched init (one program) so the chain axis
            # can be device_put with an explicit sharding for 'parallel'
            z0s = jax.jit(init_batch_fn)(key_run)
            run = jax.jit(jax.vmap(one_chain_z))
            if self.chain_method == "parallel" and len(jax.devices()) > 1:
                n_dev = min(len(jax.devices()), self.num_chains)
                while self.num_chains % n_dev:
                    n_dev -= 1
                mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("chains",))
                sharding = NamedSharding(mesh, P("chains"))
                chain_keys = jax.device_put(chain_keys, sharding)
                z0s = jax.tree_util.tree_map(
                    lambda x: jax.device_put(
                        x, NamedSharding(mesh, P("chains"))), z0s)
            zs, stats = run(chain_keys, z0s)

        _host_sync(zs)
        self.timing["sample_s"] = _time.perf_counter() - _t0
        _t0 = _time.perf_counter()

        # unflatten + constrain + collect deterministic sites, vmapped over (chain, draw)
        if init_z is not None:
            _, unravel = jax.flatten_util.ravel_pytree(init_z)
        else:
            shapes = jax.eval_shape(info.init_fn, key_init)
            _, unravel = jax.flatten_util.ravel_pytree(
                jax.tree_util.tree_map(
                    lambda s: np.zeros(s.shape, s.dtype), shapes))

        def postprocess(z_flat):
            z = unravel(z_flat)
            params = info.constrain_fn(z)
            if not info.deterministic_sites:
                # no deterministic sites: postprocess is a pure constrain — a
                # tiny program; re-tracing the model here would put the O(n²)
                # gram back into the compiled HLO for nothing
                return dict(params)
            tr = ppl_trace(substitute(seed(model, 0), data=params)).get_trace(
                *model_args, **model_kwargs
            )
            out = dict(params)
            for name, site in tr.items():
                if site["type"] == "deterministic":
                    out[name] = site["value"]
            return out

        self._samples_by_chain = jax.jit(jax.vmap(jax.vmap(postprocess)))(zs)
        _host_sync(jax.tree_util.tree_leaves(self._samples_by_chain)[0])
        self.timing["postprocess_s"] = _time.perf_counter() - _t0
        self._stats = stats
        return self

    def get_samples(self, group_by_chain: bool = False) -> Dict[str, jnp.ndarray]:
        if self._samples_by_chain is None:
            raise RuntimeError("run() first")
        if group_by_chain:
            return self._samples_by_chain
        return {
            k: v.reshape((-1,) + v.shape[2:]) for k, v in self._samples_by_chain.items()
        }

    def get_extra_fields(self, group_by_chain: bool = False) -> Dict[str, jnp.ndarray]:
        if self._stats is None:
            raise RuntimeError("run() first")
        if group_by_chain:
            return self._stats
        return {k: v.reshape((-1,) + v.shape[2:]) for k, v in self._stats.items()}

    def print_summary(self, prob: float = 0.9) -> None:
        diagnostics.print_summary(self.get_samples(group_by_chain=True), prob)
