"""Observability: phase timing, fit metrics, NaN debugging, and profiler hooks.

The reference has print-based observability only (SURVEY.md §5).  This module adds:
  * ``profile(logdir)``        — jax.profiler trace context (xprof-compatible).
  * ``timed(label)``           — wall-clock phase timing context manager.
  * ``fit_report(mcmc)``       — structured dict: wall-clock, acceptance rate,
                                 divergences, tree depth stats, per-site r-hat/ESS.
  * ``debug_nans(enable)``     — toggles jax NaN debugging globally.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional

import jax
import numpy as np


@contextlib.contextmanager
def profile(logdir: str):
    """Capture a device trace viewable in xprof / tensorboard."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class timed(contextlib.ContextDecorator):
    """Wall-clock timer: ``with timed('fit') as t: ...; t.seconds``."""

    def __init__(self, label: str = "", verbose: bool = False):
        self.label = label
        self.verbose = verbose
        self.seconds: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.seconds = time.perf_counter() - self._t0
        if self.verbose:
            print(f"[{self.label}] {self.seconds:.3f}s")
        return False


def debug_nans(enable: bool = True) -> None:
    jax.config.update("jax_debug_nans", enable)


def fit_report(mcmc) -> Dict[str, object]:
    """Structured post-fit diagnostics from an MCMC object."""
    from ..infer import diagnostics

    stats = mcmc.get_extra_fields()
    samples = mcmc.get_samples(group_by_chain=True)
    report: Dict[str, object] = {
        "num_chains": int(next(iter(samples.values())).shape[0]),
        "num_samples": int(next(iter(samples.values())).shape[1]),
        "mean_accept_prob": float(np.mean(np.asarray(stats["accept_prob"]))),
        "num_divergences": int(np.sum(np.asarray(stats["diverging"]))),
        "mean_leapfrogs_per_step": float(np.mean(np.asarray(stats["num_steps"]))),
        "final_step_size": float(np.asarray(stats["step_size"]).reshape(-1)[-1]),
    }
    rhat = {}
    ess = {}
    for name, arr in samples.items():
        a = np.asarray(arr)
        if a.ndim < 2 or not np.issubdtype(a.dtype, np.floating):
            continue
        r = diagnostics.gelman_rubin(a)
        e = diagnostics.effective_sample_size(a)
        rhat[name] = float(np.nanmax(np.atleast_1d(r)))
        ess[name] = float(np.nanmin(np.atleast_1d(e)))
    report["max_rhat"] = rhat
    report["min_ess"] = ess
    return report
