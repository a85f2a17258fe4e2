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
    init_unconstrained: Dict[str, jnp.ndarray]
    transforms: Dict[str, object]
    constrain_fn: Callable[[Dict[str, jnp.ndarray]], Dict[str, jnp.ndarray]]
    prototype_trace: Dict[str, dict]


def get_latent_sites(model, rng_key, model_args=(), model_kwargs=None) -> Dict[str, dict]:
    """One seeded forward trace; returns all non-observed sample sites."""
    model_kwargs = model_kwargs or {}
    tr = trace(seed(model, rng_key)).get_trace(*model_args, **model_kwargs)
    return {
        name: site
        for name, site in tr.items()
        if site["type"] == "sample" and not site["is_observed"]
    }


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


def initialize_model(model, rng_key, model_args=(), model_kwargs=None,
                     init_strategy: str = "median", num_init_samples: int = 10) -> ModelInfo:
    model_kwargs = model_kwargs or {}
    tr = trace(seed(model, rng_key)).get_trace(*model_args, **model_kwargs)
    latent_sites = {
        n: s for n, s in tr.items() if s["type"] == "sample" and not s["is_observed"]
    }
    transforms = {n: biject_to(s["fn"].support) for n, s in latent_sites.items()}
    if init_strategy == "median":
        init_constrained = init_to_median(
            model, rng_key, model_args, model_kwargs, num_init_samples, latent_sites
        )
    elif init_strategy == "prior":
        init_constrained = {n: s["value"] for n, s in latent_sites.items()}
    else:
        raise ValueError(f"unknown init strategy {init_strategy}")
    init_unconstrained = unconstrain(transforms, init_constrained)
    potential_fn = make_potential_fn(model, transforms, model_args, model_kwargs)

    def constrain_fn(z):
        return constrain(transforms, z)

    return ModelInfo(potential_fn, init_unconstrained, transforms, constrain_fn, tr)


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

        if self.posterior_samples is not None:
            n = len(next(iter(self.posterior_samples.values())))
            keys = jax.random.split(rng_key, n)
            return jax.vmap(single)(keys, self.posterior_samples)
        keys = jax.random.split(rng_key, self.num_samples)
        return jax.vmap(lambda k: single(k, {}))(keys)
