"""Model-introspection utilities bridging the PPL core and the inference engines.

Equivalent role to ``numpyro.infer.util`` (initialize_model / potential_energy /
Predictive), which the reference uses implicitly via NUTS/MCMC/SVI and explicitly via
``Predictive`` in ``ExactGP.sample_from_prior`` (gpax/models/gp.py:401-408).
"""

from __future__ import annotations

from typing import Callable, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..distributions import biject_to
from .core import log_density, seed, substitute, trace


class ModelInfo(NamedTuple):
    potential_fn: Callable[[Dict[str, jnp.ndarray]], jnp.ndarray]
    init_unconstrained: Optional[Dict[str, jnp.ndarray]]
    transforms: Dict[str, object]
    constrain_fn: Callable[[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]]
    prototype_trace: Dict[str, dict]
    # init_fn(key) -> unconstrained init pytree: a PURE function the inference
    # engine can fuse into its own compiled program instead of executing the
    # init trace as a standalone device program (each extra program is a 1-6
    # minute compile round trip through the TPU tunnel — VERDICT r03 item 2).
    # None when the model needs the eager fallback (tracer-valued supports).
    init_fn: Optional[Callable] = None
    # names of deterministic sites in the prototype trace: when empty, sample
    # postprocessing is a pure constrain (a tiny program) and never needs to
    # re-trace the model (whose forward pass holds the O(n²) gram)
    deterministic_sites: tuple = ()


def get_latent_sites(model, rng_key, model_args=(), model_kwargs=None) -> Dict[str, dict]:
    """One seeded forward trace; returns all non-observed sample sites."""
    model_kwargs = model_kwargs or {}
    tr = trace(seed(model, rng_key)).get_trace(*model_args, **model_kwargs)
    return {
        name: site
        for name, site in tr.items()
        if site["type"] == "sample" and not site["is_observed"]
    }


def get_latent_structure(model, rng_key, model_args=(), model_kwargs=None,
                         jit_trace: bool = True
                         ) -> Tuple[Dict[str, jnp.ndarray], Dict[str, object]]:
    """(prior-draw values, supports) for every latent site, with the forward
    trace compiled into ONE program (``jit_trace``) instead of dispatching the
    model's ops eagerly — on a remote-executed runtime each eager dispatch is
    a tiny sub-cache-threshold compile repaid by EVERY process (measured 43 s
    per multitask-GP fit; PROFILE_r03 mtgp_setup_cost).  Falls back to the
    eager trace when a support holds traced parameters."""
    model_kwargs = model_kwargs or {}
    if jit_trace:
        meta: Dict[str, dict] = {}

        def prog(key):
            tr = trace(seed(model, key)).get_trace(*model_args, **model_kwargs)
            out = {}
            for n, s in tr.items():
                if s["type"] == "sample" and not s["is_observed"]:
                    meta[n] = s  # trace-time host capture
                    out[n] = s["value"]
            return out

        values = jax.jit(prog)(rng_key)
        if meta and not any(_support_holds_tracer(s["fn"].support)
                            for s in meta.values()):
            return values, {n: s["fn"].support for n, s in meta.items()}
    sites = get_latent_sites(model, rng_key, model_args, model_kwargs)
    return ({n: s["value"] for n, s in sites.items()},
            {n: s["fn"].support for n, s in sites.items()})


def constrain(transforms: Dict, unconstrained: Dict) -> Dict:
    return {k: transforms[k](v) for k, v in unconstrained.items()}


def unconstrain(transforms: Dict, constrained: Dict) -> Dict:
    return {k: transforms[k].inv(v) for k, v in constrained.items()}


def transform_log_det(transforms: Dict, unconstrained: Dict, constrained: Dict):
    out = jnp.zeros(())
    for k, z in unconstrained.items():
        out = out + jnp.sum(transforms[k].log_abs_det_jacobian(z, constrained[k]))
    return out


def make_potential_fn(model, transforms: Dict, model_args=(), model_kwargs=None):
    """U(z) = -[log p(constrain(z), data) + log|det J|], jit/grad/vmap-safe."""
    model_kwargs = model_kwargs or {}

    def potential_fn(unconstrained: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        params = constrain(transforms, unconstrained)
        ld, _ = log_density(model, model_args, model_kwargs, params)
        return -(ld + transform_log_det(transforms, unconstrained, params))

    return potential_fn


def init_to_median(model, rng_key, model_args=(), model_kwargs=None, num_samples: int = 10,
                   latent_sites: Optional[Dict[str, dict]] = None) -> Dict[str, jnp.ndarray]:
    """Initialize each latent at the median of ``num_samples`` prior draws
    (parity with numpyro's ``init_to_median`` used at gpax/models/gp.py:207)."""
    model_kwargs = model_kwargs or {}
    if latent_sites is None:
        latent_sites = get_latent_sites(model, rng_key, model_args, model_kwargs)
    init = {}
    for i, (name, site) in enumerate(latent_sites.items()):
        k = jax.random.fold_in(rng_key, i)
        draws = site["fn"].sample(k, (num_samples,) + tuple(site["sample_shape"]))
        # median over the prior-draw axis only
        init[name] = jnp.median(draws, axis=0)
    return init


def _support_holds_tracer(support) -> bool:
    vals = vars(support).values() if hasattr(support, "__dict__") else ()
    for v in vals:
        if isinstance(v, jax.core.Tracer):
            return True
        if isinstance(v, (tuple, list)) and any(
                isinstance(x, jax.core.Tracer) for x in v):
            return True
    return False


def _initialize_model_structure(model, rng_key, model_args, model_kwargs,
                                init_strategy, num_init_samples):
    """Model structure + a PURE init function, with ZERO device programs.

    ``jax.eval_shape`` runs the init trace abstractly: site metadata
    (supports, shapes, deterministic-site names) is captured on the host at
    trace time, and the returned ``init_fn(key)`` — prior/median draws
    followed by unconstrain — is a pure function the caller fuses into its own
    compiled program.  The round-3 design executed the init trace as its own
    jitted program; through the TPU tunnel that standalone compile (whose HLO
    carries the model's O(n²) gram before DCE) cost ~200 s of the n=4096
    bench headline (BENCH_r03 phase_initialize_s; VERDICT r03 item 2).
    model_args stay closed-over, so data is concrete at trace time (models
    may branch on it — e.g. CoregGP infers num_tasks from X); only RNG/draws
    are abstract.

    Returns None when a latent's support holds traced parameters (e.g. a
    Uniform whose bounds were sampled upstream) — the transforms would leak
    tracers — and the caller falls back to the eager path.
    """
    meta: Dict[str, dict] = {}
    deterministic: list = []

    def init_program(key):
        meta.clear()
        deterministic.clear()
        tr = trace(seed(model, key)).get_trace(*model_args, **model_kwargs)
        out = {}
        i = 0
        for name, site in tr.items():
            if site["type"] == "deterministic":
                deterministic.append(name)
            if site["type"] != "sample" or site["is_observed"]:
                continue
            meta[name] = site  # trace-time host capture (values are abstract)
            if init_strategy == "median":
                k = jax.random.fold_in(key, i)
                i += 1
                draws = site["fn"].sample(
                    k, (num_init_samples,) + tuple(site["sample_shape"]))
                out[name] = jnp.median(draws, axis=0)
            else:  # "prior"
                out[name] = site["value"]
        return out

    jax.eval_shape(init_program, rng_key)
    if not meta:
        return None
    supports = {}
    for name, site in meta.items():
        sup = site["fn"].support
        if _support_holds_tracer(sup):
            return None
        supports[name] = sup
    transforms = {n: biject_to(s) for n, s in supports.items()}

    def init_fn(key):
        return unconstrain(transforms, init_program(key))

    potential_fn = make_potential_fn(model, transforms, model_args, model_kwargs)

    def constrain_fn(z):
        return constrain(transforms, z)

    return ModelInfo(potential_fn, None, transforms, constrain_fn, meta,
                     init_fn=init_fn, deterministic_sites=tuple(deterministic))


def initialize_model(model, rng_key, model_args=(), model_kwargs=None,
                     init_strategy: str = "median", num_init_samples: int = 10,
                     jit_init: bool = True, defer_init: bool = False) -> ModelInfo:
    """Model structure + initial latent values for inference.

    ``defer_init=True`` skips executing the init trace: ``init_unconstrained``
    comes back None and the caller runs ``info.init_fn(key)`` inside its own
    compiled program (one fewer compile round trip through the TPU tunnel).
    The default executes ``init_fn`` as one jitted program for API parity
    with callers that want concrete values.
    """
    model_kwargs = model_kwargs or {}
    if init_strategy not in ("median", "prior"):
        raise ValueError(f"unknown init strategy {init_strategy}")
    if jit_init:
        info = _initialize_model_structure(
            model, rng_key, model_args, model_kwargs, init_strategy,
            num_init_samples)
        if info is not None:
            if defer_init:
                return info
            return info._replace(
                init_unconstrained=jax.jit(info.init_fn)(rng_key))
    tr = trace(seed(model, rng_key)).get_trace(*model_args, **model_kwargs)
    latent_sites = {
        n: s for n, s in tr.items() if s["type"] == "sample" and not s["is_observed"]
    }
    transforms = {n: biject_to(s["fn"].support) for n, s in latent_sites.items()}
    if init_strategy == "median":
        init_constrained = init_to_median(
            model, rng_key, model_args, model_kwargs, num_init_samples, latent_sites
        )
    else:
        init_constrained = {n: s["value"] for n, s in latent_sites.items()}
    init_unconstrained = unconstrain(transforms, init_constrained)
    potential_fn = make_potential_fn(model, transforms, model_args, model_kwargs)

    def constrain_fn(z):
        return constrain(transforms, z)

    deterministic = tuple(
        n for n, s in tr.items() if s["type"] == "deterministic")
    return ModelInfo(potential_fn, init_unconstrained, transforms, constrain_fn,
                     tr, init_fn=None, deterministic_sites=deterministic)


class Predictive:
    """Prior/posterior predictive sampler (``numpyro.infer.Predictive`` equivalent).

    With ``posterior_samples``: substitutes each posterior draw and runs the model
    forward (vmapped).  Without: draws ``num_samples`` independent prior traces.
    """

    def __init__(self, model, posterior_samples: Optional[Dict] = None,
                 num_samples: Optional[int] = None, return_sites: Optional[list] = None):
        self.model = model
        self.posterior_samples = posterior_samples
        self.num_samples = num_samples
        self.return_sites = return_sites
        if posterior_samples is None and num_samples is None:
            raise ValueError("Provide posterior_samples or num_samples")

    def __call__(self, rng_key, *args, **kwargs):
        def single(key, sample_dict):
            tr = trace(seed(substitute(self.model, data=sample_dict), rng_seed=key))
            sites = tr.get_trace(*args, **kwargs)
            keep = {}
            for name, site in sites.items():
                if self.return_sites is not None and name not in self.return_sites:
                    continue
                if site["type"] in ("sample", "deterministic") and name not in (sample_dict or {}):
                    keep[name] = site["value"]
            return keep

        # jit around the vmap: a bare vmap executes its batched ops eagerly,
        # which on the remote-executed runtime costs a sub-cache-threshold
        # compile per op per process (see get_latent_structure)
        if self.posterior_samples is not None:
            n = len(next(iter(self.posterior_samples.values())))
            keys = jax.random.split(rng_key, n)
            return jax.jit(jax.vmap(single))(keys, self.posterior_samples)
        keys = jax.random.split(rng_key, self.num_samples)
        return jax.jit(jax.vmap(lambda k: single(k, {})))(keys)
