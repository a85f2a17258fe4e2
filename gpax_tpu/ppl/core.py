"""Effect-handler probabilistic-programming core.

This is the substrate the reference borrows from NumPyro: models are plain Python
functions that call :func:`sample` / :func:`deterministic` / :func:`param` /
:func:`factor` inside optional :class:`plate` contexts, and inference programs
interpret them by stacking effect handlers (:class:`seed`, :class:`trace`,
:class:`substitute`, :class:`condition`).

Coverage spec = exactly what gpax uses of numpyro (gpax/models/gp.py:137-164,
sparse_gp.py:62-114, uigp.py:113-129, hskgp.py:100-150, vi_mtdkl.py:150-210).

Handler-stack manipulation happens at Python trace time only, so any composition of
``jit`` / ``vmap`` / ``grad`` over a handler-wrapped closure is safe, as long as the
wrapped function itself is pure given the handler state (it is: all randomness flows
from a `seed` handler's key, all values from `substitute`).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ..distributions import Delta, Distribution

_PPL_STACK = []   # active Messengers, innermost last
_PLATE_STACK = []  # active plates, outermost first


class _PlateCtx:
    __slots__ = ("name", "size")

    def __init__(self, name, size):
        self.name = name
        self.size = size


class plate:
    """Batch-dimension context: latent sites sampled inside acquire a leading dim of
    ``size`` (outer plates produce dims further left), unless the site's distribution
    already broadcasts over that dim.  Matches the reference's usage of
    ``numpyro.plate`` (e.g. ARD lengthscales, gpax/models/gp.py:238-239)."""

    def __init__(self, name: str, size: int):
        self.ctx = _PlateCtx(name, size)

    def __enter__(self):
        _PLATE_STACK.append(self.ctx)
        return self

    def __exit__(self, *exc):
        _PLATE_STACK.pop()
        return False


class Messenger:
    def __init__(self, fn: Optional[Callable] = None):
        self.fn = fn

    def __enter__(self):
        _PPL_STACK.append(self)
        return self

    def __exit__(self, *exc):
        assert _PPL_STACK[-1] is self
        _PPL_STACK.pop()
        return False

    def process_message(self, msg: Dict[str, Any]):
        pass

    def postprocess_message(self, msg: Dict[str, Any]):
        pass

    def __call__(self, *args, **kwargs):
        with self:
            return self.fn(*args, **kwargs)


def _apply_stack(msg: Dict[str, Any]) -> Dict[str, Any]:
    for handler in reversed(_PPL_STACK):
        handler.process_message(msg)
    # default execution if no handler supplied a value
    if msg["type"] == "sample" and msg["value"] is None:
        key = msg["rng_key"]
        if key is None:
            raise RuntimeError(
                f"Latent site '{msg['name']}' needs a PRNG key: wrap the model in "
                f"gpax_tpu.ppl.seed(model, rng_key) or substitute a value."
            )
        msg["value"] = msg["fn"].sample(key, msg["sample_shape"])
    for handler in _PPL_STACK:
        handler.postprocess_message(msg)
    return msg


def _plate_sample_shape(fn: Distribution):
    """Extra leading dims a distribution needs so its draw covers active plates."""
    plate_shape = tuple(p.size for p in _PLATE_STACK)
    if not plate_shape:
        return ()
    batch = fn.batch_shape
    # right-align: plates the dist already broadcasts over need no extra sample dims
    need = len(plate_shape) - len(batch)
    if need <= 0:
        # verify trailing dims match where known; rely on broadcasting otherwise
        return ()
    return plate_shape[:need]


def sample(name: str, fn: Distribution, obs=None, rng_key=None, sample_shape=()):
    """Draw (or observe) a random variable.  Equivalent of ``numpyro.sample``."""
    if not _PPL_STACK:
        if obs is not None:
            return obs
        if rng_key is None:
            raise RuntimeError(f"sample('{name}') outside an inference context needs rng_key=")
        return fn.sample(rng_key, sample_shape)
    msg = {
        "type": "sample",
        "name": name,
        "fn": fn,
        "value": obs,
        "is_observed": obs is not None,
        "rng_key": rng_key,
        "sample_shape": tuple(sample_shape) + _plate_sample_shape(fn),
        "plates": tuple(_PLATE_STACK),
    }
    return _apply_stack(msg)["value"]


def deterministic(name: str, value):
    """Record a deterministic site (``numpyro.deterministic`` equivalent)."""
    if not _PPL_STACK:
        return value
    msg = {
        "type": "deterministic",
        "name": name,
        "fn": None,
        "value": value,
        "is_observed": True,
        "rng_key": None,
        "sample_shape": (),
        "plates": (),
    }
    return _apply_stack(msg)["value"]


def param(name: str, init_value=None, constraint=None):
    """Learnable parameter site (``numpyro.param`` equivalent); SVI optimizes these."""
    if not _PPL_STACK:
        return init_value
    msg = {
        "type": "param",
        "name": name,
        "fn": None,
        "value": None,
        "init_value": init_value,
        "constraint": constraint,
        "is_observed": False,
        "rng_key": None,
        "sample_shape": (),
        "plates": (),
    }
    out = _apply_stack(msg)["value"]
    return init_value if out is None else out


def factor(name: str, log_factor):
    """Add an arbitrary log-probability term (``numpyro.factor`` equivalent)."""
    if not _PPL_STACK:
        return
    msg = {
        "type": "factor",
        "name": name,
        "fn": None,
        "value": log_factor,
        "is_observed": True,
        "rng_key": None,
        "sample_shape": (),
        "plates": (),
    }
    _apply_stack(msg)


class seed(Messenger):
    """Thread a PRNG key through all sample sites."""

    def __init__(self, fn: Optional[Callable] = None, rng_seed=None):
        super().__init__(fn)
        if rng_seed is None:
            raise ValueError("seed handler needs rng_seed")
        if isinstance(rng_seed, int):
            rng_seed = jax.random.PRNGKey(rng_seed)
        self.key = rng_seed

    def process_message(self, msg):
        if msg["type"] == "sample" and not msg["is_observed"] and msg["rng_key"] is None:
            self.key, sub = jax.random.split(self.key)
            msg["rng_key"] = sub


class trace(Messenger):
    """Record every site into an OrderedDict keyed by name."""

    def __init__(self, fn: Optional[Callable] = None):
        super().__init__(fn)
        self.sites: "OrderedDict[str, Dict]" = OrderedDict()

    def __enter__(self):
        self.sites = OrderedDict()
        return super().__enter__()

    def postprocess_message(self, msg):
        if msg["name"] in self.sites and msg["type"] != "param":
            raise ValueError(f"Duplicate site name '{msg['name']}' in model trace")
        self.sites[msg["name"]] = dict(msg)

    def get_trace(self, *args, **kwargs):
        with self:
            self.fn(*args, **kwargs)
        return self.sites


class substitute(Messenger):
    """Replace site values (latent samples AND params) by entries of ``data``."""

    def __init__(self, fn: Optional[Callable] = None, data: Optional[Dict] = None,
                 substitute_fn: Optional[Callable] = None):
        super().__init__(fn)
        self.data = data if data is not None else {}
        self.substitute_fn = substitute_fn

    def process_message(self, msg):
        if msg["type"] in ("sample", "param"):
            if msg["name"] in self.data:
                msg["value"] = self.data[msg["name"]]
            elif self.substitute_fn is not None:
                val = self.substitute_fn(msg)
                if val is not None:
                    msg["value"] = val


class condition(Messenger):
    """Fix sample sites to observed values."""

    def __init__(self, fn: Optional[Callable] = None, data: Optional[Dict] = None):
        super().__init__(fn)
        self.data = data or {}

    def process_message(self, msg):
        if msg["type"] == "sample" and msg["name"] in self.data:
            msg["value"] = self.data[msg["name"]]
            msg["is_observed"] = True


class block(Messenger):
    """Hide sites from outer handlers (rarely needed; provided for API parity)."""

    def __init__(self, fn: Optional[Callable] = None, hide_fn: Optional[Callable] = None,
                 hide: Optional[list] = None):
        super().__init__(fn)
        if hide_fn is None:
            hide_set = set(hide or [])
            hide_fn = lambda msg: msg["name"] in hide_set if hide_set else True
        self.hide_fn = hide_fn

    def process_message(self, msg):
        if self.hide_fn(msg):
            msg["_blocked"] = True


def log_density(model: Callable, model_args=(), model_kwargs=None, params: Optional[Dict] = None):
    """Sum of log-probabilities of all sample/factor sites given latent values.

    Returns ``(log_joint, trace)``.  All latent sites must receive values via
    ``params`` (or be observed); this is the jit/grad-safe path used by NUTS and SVI.
    """
    model_kwargs = model_kwargs or {}
    tr = trace(substitute(model, data=params or {}))
    sites = tr.get_trace(*model_args, **model_kwargs)
    log_joint = jnp.zeros(())
    for name, site in sites.items():
        if site["type"] == "sample":
            lp = site["fn"].log_prob(site["value"])
            log_joint = log_joint + jnp.sum(lp)
        elif site["type"] == "factor":
            log_joint = log_joint + jnp.sum(site["value"])
    return log_joint, sites
