"""Fully-Bayesian exact Gaussian-process regression (NUTS), TPU-native.

API parity with the reference ExactGP (gpax/models/gp.py:29-433): same constructor
arguments, same ``model``/``fit``/``get_samples``/``predict``/``predict_in_batches``/
``sample_from_prior`` lifecycle, same prior structure (LogNormal(0,1) noise and
ARD lengthscales under an 'ard' plate, LogNormal output scale, Periodic 'period').

TPU-native differences (deliberate improvements, not bugs):
  * Inference is this framework's jit-compiled NUTS (one XLA program for
    warmup+sampling) instead of numpyro's Python-loop MCMC driver.
  * The predictive posterior uses one Cholesky factorization + triangular solves
    per posterior sample, vmapped across samples — replacing the per-sample
    ``jnp.linalg.inv`` at gpax/models/gp.py:271 (O(n³) with worse constants and
    numerics).
  * ``predict`` is compiled once per test-grid shape; ``predict_in_batches`` pads
    the trailing chunk so the whole sweep reuses a single compiled program.
"""

from __future__ import annotations

import warnings
from typing import Callable, Dict, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import jax.random as jra

from .. import distributions as dist
from .. import ppl
from ..infer import MCMC, NUTS
from ..kernels import get_kernel
from ..ops.linalg import gp_predictive_moments, robust_mvn_sample
from ..utils import split_in_batches

kernel_fn_type = Callable[..., jnp.ndarray]


def _auto_segment_size(n_points: int, total: int,
                       cost_mult: int = 1) -> Optional[int]:
    """TPU auto-segmenting: bound the sampler's per-device-call duration.

    The TPU runtime kills long-running device calls — observed as UNAVAILABLE
    "kernel fault" whenever one call was expected to run multiple minutes,
    while every call bounded under ~a minute succeeded (full A/B evidence in
    N8192_NOTE.md).  Estimate per-transition cost from the measured
    216 ms/leapfrog at n=8192 (cubic in n, ~64 leapfrogs per adapted
    transition) and run the sampler in bounded segments whenever the whole run
    would exceed one acceptable device call.  Explicit ``segment_size=``
    always wins; CPU runs are never segmented."""
    if jax.default_backend() not in ("tpu", "axon"):
        return None
    s_per_leapfrog = 0.216 * (n_points / 8192.0) ** 3
    per_transition = 64.0 * s_per_leapfrog * max(cost_mult, 1)
    if per_transition * total <= 60.0:
        return None  # the whole run fits in one acceptable device call
    return max(1, min(total, int(30.0 / max(per_transition, 1e-9))))


class ExactGP:
    """Fully Bayesian exact GP.

    Class attribute ``_exact_moments_ok``: subclasses whose posterior math departs
    from the plain-GP form (NN embeddings, latent inputs, per-task noise, ...)
    set this False so the acquisition layer falls back to the sampled-moments path
    instead of using the closed-form mixture moments.

    Args:
        input_dim: number of input feature dimensions (ARD lengthscale size).
        kernel: 'RBF' | 'Matern' | 'Periodic' | 'NNGP' or a custom kernel callable
            with signature ``k(X, Z, params, noise=0, jitter=1e-6)``.
        mean_fn: optional deterministic mean function ``m(X)`` or ``m(X, params)``.
        kernel_prior: optional custom prior program returning kernel params dict.
        mean_fn_prior: optional prior program returning mean-fn params dict.
        noise_prior: DEPRECATED prior program for noise (use noise_prior_dist).
        noise_prior_dist: prior distribution over observational noise variance
            (default LogNormal(0, 1)).
        lengthscale_prior_dist: prior distribution over kernel lengthscales
            (default LogNormal(0, 1)).
    """

    _exact_moments_ok = True
    # default NUTS metric: diagonal.  Multitask subclasses flip this — their
    # ICM mixing parameters (W, v) have an intrinsically correlated posterior
    # (B12 pins w1*w2; the w1/w2 ratio is compensated by the task noises) that
    # a diagonal metric cannot unit-scale; measured ~800 leapfrogs/transition
    # diagonal vs tens dense (PROFILE_r03.jsonl mtgp entries).
    _default_dense_mass = False
    # instance arrays that jitted prediction programs bake in as constants —
    # the _cached_program guard re-traces when any of their identities change
    _traced_constants = ("X_train", "y_train")
    # ExactGP.model treats X as constant data: the fused likelihood op returns
    # a ZERO cotangent for X (ops/fused_density.py).  A subclass that reuses
    # this model with a parameter-dependent X (latent inputs) MUST set this
    # False (or override model, as UIGP/DKL do) — otherwise gradients through
    # the inputs silently vanish.  Checked in _fused_likelihood_ok.
    _input_is_constant = True
    # bound on cached compiled prediction programs per instance (see
    # _cached_program): stale-state entries are evicted eagerly, this cap
    # guards against signature churn (many grid shapes) in one model state
    _prog_cache_max = 8

    def __init__(
        self,
        input_dim: int,
        kernel: Union[str, kernel_fn_type] = "RBF",
        mean_fn: Optional[Callable] = None,
        kernel_prior: Optional[Callable] = None,
        mean_fn_prior: Optional[Callable] = None,
        noise_prior: Optional[Callable] = None,
        noise_prior_dist: Optional[dist.Distribution] = None,
        lengthscale_prior_dist: Optional[dist.Distribution] = None,
    ) -> None:
        if noise_prior is not None:
            warnings.warn(
                "`noise_prior` is deprecated; pass `noise_prior_dist` (a distribution "
                "instance) instead.",
                FutureWarning,
            )
        if kernel_prior is not None:
            warnings.warn(
                "`kernel_prior` remains available for complex priors; for lengthscales "
                "only, prefer `lengthscale_prior_dist`.",
                UserWarning,
            )
        self.kernel_dim = input_dim
        self.kernel = get_kernel(kernel)
        self.kernel_name = kernel if isinstance(kernel, str) else None
        self.mean_fn = mean_fn
        self.kernel_prior = kernel_prior
        self.mean_fn_prior = mean_fn_prior
        self.noise_prior = noise_prior
        self.noise_prior_dist = noise_prior_dist
        self.lengthscale_prior_dist = lengthscale_prior_dist
        self.X_train: Optional[jnp.ndarray] = None
        self.y_train: Optional[jnp.ndarray] = None
        self.mcmc: Optional[MCMC] = None

    # ------------------------------------------------------------------ model

    def model(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None,
              noise_mask: Optional[jnp.ndarray] = None, **kwargs) -> None:
        """Generative program: kernel/noise/mean priors + MVN likelihood
        (structure parity: gpax/models/gp.py:137-164).

        ``noise_mask`` (optional, (n,)) is added to the sampled noise on the
        diagonal; rows padded by bucketed fits carry a huge mask value so they
        contribute ~zero information (shape-bucketing for active learning)."""
        f_loc = jnp.zeros(X.shape[0])
        if self.kernel_prior:
            kernel_params = self.kernel_prior()
        else:
            kernel_params = self._sample_kernel_params()
        if self.noise_prior:  # deprecated path, kept for compatibility
            noise = self.noise_prior()
        else:
            noise = self._sample_noise()
        if noise_mask is not None:
            noise = noise + noise_mask
        if self.mean_fn is not None:
            args = [X]
            if self.mean_fn_prior is not None:
                args += [self.mean_fn_prior()]
            f_loc += self.mean_fn(*args).squeeze()
        if y is not None and self._fused_likelihood_ok(X, kernel_params, kwargs):
            # fused gram→Cholesky→density op with closed-form θ-gradients:
            # one custom-VJP boundary instead of two, backward in one fusion
            # scope (measured ~1.7x per-leapfrog at n=8192; ops/fused_density)
            from ..ops.fused_density import gp_mvn_log_prob

            jitter = kwargs.get("jitter", 1e-6)
            n = X.shape[0]
            # noise + jitter (kernel-diagonal contract) + the θ-independent
            # base regularization chol_tri_factors would otherwise add
            noise_eff = (noise + jitter
                         + 4.0 * n * float(jnp.finfo(jnp.float32).eps))
            kind = "rbf" if self.kernel_name == "RBF" else "matern52"
            lp = gp_mvn_log_prob(
                X.astype(jnp.float32), kernel_params["k_length"],
                kernel_params["k_scale"], noise_eff, y - f_loc, kind)
            ppl.factor("y_log_lik", lp)
        else:
            k = self.kernel(X, X, kernel_params, noise, **kwargs)
            ppl.sample("y", dist.MultivariateNormal(loc=f_loc, covariance_matrix=k),
                       obs=y)

    def _fused_likelihood_ok(self, X, kernel_params, kwargs) -> bool:
        """Dispatch rule for the fused-likelihood op (ops/fused_density.py):
        standard RBF/Matérn hyperparameterization on 2-D f32 data, TPU backend
        (or forced via Config.use_fused_likelihood='always' for CPU tests)."""
        from ..config import get_config
        from ..parallel.distributed_chol import active_sharded_linalg

        cfg = get_config()
        if cfg.use_fused_likelihood == "never":
            return False
        if not getattr(type(self), "_input_is_constant", False):
            return False  # latent-input subclass: X needs real gradients
        if active_sharded_linalg() is not None:
            return False  # model-parallel context owns the density
        if self.kernel_name not in ("RBF", "Matern"):
            return False
        if set(kernel_params) - {"k_length", "k_scale", "period"} or \
                kernel_params.get("period") is not None:
            return False
        if X.ndim != 2 or jnp.result_type(X, jnp.float32) != jnp.float32:
            return False
        if cfg.use_fused_likelihood == "always":
            return True
        # measured crossover: composed + compensated backward wins above ~2k
        # (see Config.fused_likelihood_max_n)
        return (jax.default_backend() in ("tpu", "axon")
                and X.shape[0] <= cfg.fused_likelihood_max_n)

    def _sample_noise(self) -> jnp.ndarray:
        noise_dist = self.noise_prior_dist
        if noise_dist is None:
            noise_dist = dist.LogNormal(0.0, 1.0)
        return ppl.sample("noise", noise_dist)

    def _sample_kernel_params(self, output_scale: bool = True) -> Dict[str, jnp.ndarray]:
        """Weakly-informative LogNormal priors; ARD lengthscales under a plate of
        size ``input_dim`` (parity: gpax/models/gp.py:229-247)."""
        length_dist = self.lengthscale_prior_dist
        if length_dist is None:
            length_dist = dist.LogNormal(0.0, 1.0)
        with ppl.plate("ard", self.kernel_dim):
            length = ppl.sample("k_length", length_dist)
        if output_scale:
            scale = ppl.sample("k_scale", dist.LogNormal(0.0, 1.0))
        else:
            scale = ppl.deterministic("k_scale", jnp.asarray(1.0))
        params = {"k_length": length, "k_scale": scale}
        if self.kernel_name == "Periodic":
            params["period"] = ppl.sample("period", dist.LogNormal(0.0, 1.0))
        else:
            params["period"] = None
        return params

    # ------------------------------------------------------------------ fit

    def fit(
        self,
        rng_key: jnp.ndarray,
        X: jnp.ndarray,
        y: jnp.ndarray,
        num_warmup: int = 2000,
        num_samples: int = 2000,
        num_chains: int = 1,
        chain_method: str = "sequential",
        progress_bar: bool = True,
        print_summary: bool = True,
        device=None,
        pad_to_multiple: Optional[int] = None,
        segment_size: Optional[int] = None,
        dense_mass: Optional[bool] = None,
        max_tree_depth: int = 10,
        target_accept_prob: float = 0.8,
        segment_callback: Optional[Callable] = None,
        deadline: Optional[float] = None,
        warmup_depth_cap: Optional[tuple] = None,
        **kwargs,
    ) -> None:
        """Run NUTS over the GP hyperparameters.

        Accepts the same arguments as the reference fit (gpax/models/gp.py:166-218);
        ``**kwargs`` threads ``jitter`` to the kernel.

        ``pad_to_multiple``: bucket the training-set size by padding to the next
        multiple with effectively-ignored rows (noise 1e6 on their diagonal).
        Active-learning loops that add one point per iteration then reuse ONE
        compiled NUTS program per bucket instead of recompiling every step.
        Prediction always uses the unpadded data.

        ``dense_mass``: adapt a full covariance metric instead of a diagonal
        one (cheap: the hyperparameter dim is tiny).  ``None`` takes the
        class default — True for the multitask models, whose ICM mixing
        parameters have intrinsically correlated posteriors (see infer.NUTS).

        ``max_tree_depth``: NUTS doubling cap (default 10, numpyro's).  Large-n
        TPU fits cap at 7 so the worst-case bounded-segment device call stays
        under the runtime's duration limit (N8192_NOTE.md).

        ``target_accept_prob``: dual-averaging acceptance target (default 0.8,
        numpyro's).  Lowering it trades acceptance for larger steps — fewer
        leapfrogs per transition on posteriors that run deep trees.

        ``segment_callback`` / ``deadline``: per-segment telemetry hook and a
        soft ``time.perf_counter()`` deadline for the segmented runner.  A
        deadline during sampling truncates the draw count; a deadline during
        warmup freezes adaptation at the segment boundary and flips the rest
        of the plan to sampling (still exact MCMC, reduced adaptation —
        reported via ``warmup_steps_run``), so a budget-bound fit always
        returns a valid posterior.
        """
        X, y = self._set_data(X, y)
        if device:
            X = jax.device_put(X, device)
            y = jax.device_put(y, device)
        self.X_train = X
        self.y_train = y

        fit_args = (X, y)
        if pad_to_multiple:
            n = X.shape[0]
            pad = (-n) % pad_to_multiple
            if pad:
                # pad FAR outside the data so the gram is block-diagonal in the
                # padded rows (stationary kernels: cross-covariance ~ 0), with a
                # moderate masked noise — keeps the diagonal scale homogeneous
                # for the f32 Cholesky regularization heuristics
                span = jnp.max(X, axis=0) - jnp.min(X, axis=0) + 1.0
                far = jnp.max(X, axis=0) + 1e3 * span
                X_pad = jnp.broadcast_to(far, (pad, X.shape[1])) + jnp.arange(
                    pad, dtype=X.dtype
                )[:, None] * span
                X_fit = jnp.concatenate([X, X_pad], axis=0)
                y_fit = jnp.concatenate([y, jnp.zeros((pad,), y.dtype)])
                noise_mask = jnp.concatenate(
                    [jnp.zeros((n,), X.dtype), jnp.full((pad,), 1e2, X.dtype)]
                )
                fit_args = (X_fit, y_fit, noise_mask)

        if segment_size is None:
            # vectorized/parallel chains run lockstep in one program (cost
            # scales with num_chains); sequential chains run one at a time
            # (cost_mult=1) but still need bounded per-chain device calls —
            # the runtime-fault trigger is call DURATION (N8192_NOTE.md)
            lockstep = num_chains > 1 and chain_method in ("vectorized", "parallel")
            segment_size = _auto_segment_size(
                fit_args[0].shape[-2] if fit_args[0].ndim > 1 else
                fit_args[0].shape[0],
                num_warmup + num_samples,
                cost_mult=num_chains if lockstep else 1)

        if dense_mass is None:
            dense_mass = self._default_dense_mass
        self.mcmc = MCMC(
            NUTS(self.model, init_strategy="median", dense_mass=dense_mass,
                 max_tree_depth=max_tree_depth,
                 target_accept_prob=target_accept_prob),
            num_warmup=num_warmup,
            num_samples=num_samples,
            num_chains=num_chains,
            chain_method=chain_method,
            progress_bar=progress_bar,
            segment_size=segment_size,
        )
        self.mcmc.segment_callback = segment_callback
        self.mcmc.deadline = deadline
        # (cap, n_steps): shallow trees for the first n_steps warmup
        # transitions — before dual averaging pulls the step size into range
        # every tree maxes out at 2^max_tree_depth leapfrogs for nothing
        self.mcmc.warmup_depth_cap = warmup_depth_cap
        self.mcmc.run(rng_key, *fit_args, **kwargs)
        if print_summary:
            self._print_summary()

    def get_samples(self, chain_dim: bool = False) -> Dict[str, jnp.ndarray]:
        """Posterior samples (flattened across chains unless ``chain_dim``)."""
        return self.mcmc.get_samples(group_by_chain=chain_dim)

    # ------------------------------------------------------------ prediction

    def get_mvn_posterior(
        self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
        noiseless: bool = False, **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Predictive MVN for a single posterior draw, via Cholesky solves
        (replaces the inv-based gpax/models/gp.py:253-277)."""
        noise = params["noise"]
        noise_p = noise * (1 - jnp.asarray(noiseless, int))
        y_residual = self.y_train
        if self.mean_fn is not None:
            args = [self.X_train, params] if self.mean_fn_prior else [self.X_train]
            y_residual = y_residual - self.mean_fn(*args).squeeze()
        k_pp = self.kernel(X_new, X_new, params, noise_p, **kwargs)
        k_pX = self.kernel(X_new, self.X_train, params, jitter=0.0)
        k_XX = self.kernel(self.X_train, self.X_train, params, noise, **kwargs)
        mean, cov = gp_predictive_moments(k_XX, k_pX, k_pp, y_residual)
        if self.mean_fn is not None:
            args = [X_new, params] if self.mean_fn_prior else [X_new]
            mean = mean + self.mean_fn(*args).squeeze()
        return mean, cov

    def _predict(
        self, rng_key: jnp.ndarray, X_new: jnp.ndarray,
        params: Dict[str, jnp.ndarray], n: int,
        noiseless: bool = False, **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Mean + n function draws for one posterior sample of hyperparameters.
        Uses NaN-proof batched MVN sampling (see ops.linalg.robust_mvn_sample);
        task-batched posteriors (vExactGP) sample through the same path."""
        y_mean, K = self.get_mvn_posterior(X_new, params, noiseless, **kwargs)
        y_sampled = robust_mvn_sample(rng_key, y_mean, K, n)
        return y_mean, y_sampled

    def predict(
        self,
        rng_key: jnp.ndarray,
        X_new: jnp.ndarray,
        samples: Optional[Dict[str, jnp.ndarray]] = None,
        n: int = 1,
        filter_nans: bool = False,
        noiseless: bool = False,
        device=None,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Fully-Bayesian prediction: the per-sample Cholesky-solve predictive is
        vmapped over ALL posterior samples in one compiled program
        (sample-parallel fan-out, parity with gpax/models/gp.py:351-399).

        Returns (posterior mean averaged over samples, draws of shape (S*…, n, m)).
        """
        X_new = self._set_data(X_new)
        if samples is None:
            samples = self.get_samples(chain_dim=False)
        if device:
            self._set_training_data(device=device)
            X_new = jax.device_put(X_new, device)
            samples = jax.device_put(samples, device)
        num_samples = len(next(iter(samples.values())))
        keys = jra.split(rng_key, num_samples)

        # chunk the sample axis: a full vmap materializes S x (n² + m²) grams,
        # which exceeds HBM for production S; lax.map(batch_size) runs vmapped
        # chunks sequentially with bounded live memory sized from the device
        bytes_per = 4 * (
            self.X_train.shape[0] ** 2
            + 2 * self.X_train.shape[0] * X_new.shape[0]
            + 2 * X_new.shape[0] ** 2
        )
        from ..utils import device_memory_budget

        cs = int(max(1, min(num_samples, device_memory_budget() // max(bytes_per, 1))))

        def builder():
            def impl(Xn, ks, ss):
                def single(args):
                    key, params = args
                    return self._predict(key, Xn, params, n, noiseless, **kwargs)

                return jax.lax.map(single, (ks, ss), batch_size=cs)

            return jax.jit(impl)

        prog = self._cached_program(
            "predict", builder, X_new, samples,
            (cs, n, noiseless), kwargs)
        y_means, y_sampled = prog(X_new, keys, samples)
        if filter_nans:
            mask = ~jnp.isnan(y_sampled).any(axis=tuple(range(1, y_sampled.ndim)))
            y_sampled = y_sampled[mask]
        return y_means.mean(0), y_sampled

    def _predict_in_batches(
        self,
        rng_key: jnp.ndarray,
        X_new: jnp.ndarray,
        batch_size: int = 100,
        batch_dim: int = 0,
        samples: Optional[Dict[str, jnp.ndarray]] = None,
        n: int = 1,
        filter_nans: bool = False,
        predict_fn: Optional[Callable] = None,
        noiseless: bool = False,
        device=None,
        **kwargs,
    ):
        if predict_fn is None:
            def predict_fn(xi):
                return self.predict(
                    rng_key, xi, samples, n, filter_nans, noiseless, device, **kwargs
                )

        cpu = jax.devices("cpu")[0]
        out1_all, out2_all = [], []
        for xi in split_in_batches(X_new, batch_size, dim=batch_dim):
            # pad the trailing chunk so every batch reuses ONE compiled program
            actual = xi.shape[batch_dim]
            if actual < batch_size and X_new.shape[batch_dim] > batch_size:
                pad = [(0, 0)] * xi.ndim
                pad[batch_dim] = (0, batch_size - actual)
                xi_padded = jnp.pad(xi, pad, mode="edge")
            else:
                xi_padded = xi
            out1, out2 = predict_fn(xi_padded)
            if actual < xi_padded.shape[batch_dim]:
                out1 = jax.lax.slice_in_dim(out1, 0, actual, axis=batch_dim)
                out2 = jax.lax.slice_in_dim(out2, 0, actual, axis=out2.ndim - 1 if batch_dim == 0 else batch_dim)
            # park results on host to avoid accumulating HBM (gp.py:314-315 parity)
            out1_all.append(jax.device_put(out1, cpu))
            out2_all.append(jax.device_put(out2, cpu))
        return out1_all, out2_all

    def predict_in_batches(
        self,
        rng_key: jnp.ndarray,
        X_new: jnp.ndarray,
        batch_size: int = 100,
        samples: Optional[Dict[str, jnp.ndarray]] = None,
        n: int = 1,
        filter_nans: bool = False,
        predict_fn: Optional[Callable] = None,
        noiseless: bool = False,
        device=None,
        **kwargs,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Chunked prediction over large grids with per-chunk host offload
        (parity: gpax/models/gp.py:325-349)."""
        y_pred, y_sampled = self._predict_in_batches(
            rng_key, X_new, batch_size, 0, samples, n, filter_nans,
            predict_fn, noiseless, device, **kwargs,
        )
        y_pred = jnp.concatenate(y_pred, 0)
        y_sampled = jnp.concatenate(y_sampled, -1)
        return y_pred, y_sampled

    def get_predictive_mean_var(self, X_new: jnp.ndarray, params: Dict[str, jnp.ndarray],
                                noiseless: bool = False, **kwargs
                                ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mean, DIAGONAL variance) for one posterior draw — O(n²m), never builds
        the m×m test covariance.  The diagonal k(x*,x*) is computed by a vmapped
        1×1 kernel evaluation (O(m·d))."""
        jitter = kwargs.get("jitter", 1e-6)
        noise = params["noise"]
        noise_p = noise * (1 - jnp.asarray(noiseless, int))
        y_residual = self.y_train
        if self.mean_fn is not None:
            args = [self.X_train, params] if self.mean_fn_prior else [self.X_train]
            y_residual = y_residual - self.mean_fn(*args).squeeze()
        k_pX = self.kernel(X_new, self.X_train, params, jitter=0.0)
        k_XX = self.kernel(self.X_train, self.X_train, params, noise, **kwargs)
        k_pp_diag = jax.vmap(
            lambda x: self.kernel(x[None], x[None], params, jitter=0.0)[0, 0]
        )(X_new) + noise_p + jitter
        from ..ops.linalg import gp_predictive_mean_var

        mean, var = gp_predictive_mean_var(k_XX, k_pX, k_pp_diag, y_residual)
        if self.mean_fn is not None:
            args = [X_new, params] if self.mean_fn_prior else [X_new]
            mean = mean + self.mean_fn(*args).squeeze()
        return mean, var

    def predict_moments(self, rng_key, X_new: jnp.ndarray,
                        samples: Optional[Dict[str, jnp.ndarray]] = None,
                        noiseless: bool = False, **kwargs
                        ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """EXACT moments of the fully-Bayesian predictive mixture:
        mean = E_s[mean_s],  var = E_s[var_s] + Var_s[mean_s].

        This is what the reference estimates by drawing MVN function samples per
        posterior draw (acquisition.py:22-35) — but closed-form, deterministic,
        and O(S·n²·m) instead of O(S·(n³+m³)).  Used by the acquisition layer.
        """
        X_new = self._set_data(X_new)
        if samples is None:
            samples = self.get_samples(chain_dim=False)
        num_samples = len(next(iter(samples.values())))

        bytes_per = 4 * (
            self.X_train.shape[0] ** 2 + 2 * self.X_train.shape[0] * X_new.shape[0]
        )
        from ..utils import device_memory_budget

        cs = int(max(1, min(num_samples, device_memory_budget() // max(bytes_per, 1))))

        def builder():
            def impl(Xn, ss):
                def single(params):
                    return self.get_predictive_mean_var(
                        Xn, params, noiseless, **kwargs)

                return jax.lax.map(single, ss, batch_size=cs)

            return jax.jit(impl)

        prog = self._cached_program(
            "predict_moments", builder, X_new, samples, (cs, noiseless), kwargs)
        means, variances = prog(X_new, samples)
        return means.mean(0), variances.mean(0) + means.var(0)

    def sample_from_prior(self, rng_key: jnp.ndarray, X: jnp.ndarray,
                          num_samples: int = 10) -> jnp.ndarray:
        """Prior predictive draws at X (parity: gpax/models/gp.py:401-408)."""
        X = self._set_data(X)
        prior_predictive = ppl.Predictive(self.model, num_samples=num_samples)
        samples = prior_predictive(rng_key, X)
        return samples["y"]

    # ------------------------------------------------------------- utilities

    def _cached_program(self, kind, builder, X_new, samples, extra, kwargs):
        """Executable cache for per-call jitted prediction programs.

        ``jax.jit`` of a FRESH closure never hits jax's executable cache (it is
        keyed on function identity), so re-jitting per predict call recompiles
        from scratch — minutes per call through a TPU tunnel, and every
        active-learning iteration pays it.  Programs are cached on the
        instance, keyed by input structure plus the IDENTITY of the training
        arrays the closure bakes in as constants (held strongly in the cache
        value so their ids cannot be recycled); any non-hashable kwargs fall
        back to the uncached path.

        Bounded: entries whose traced constants no longer match the live model
        state are evicted on every lookup (each refit replaces X_train/y_train,
        so an active-learning loop holds only the CURRENT program set instead of
        pinning every past training set + executable), and the cache is capped
        at ``_prog_cache_max`` entries (oldest first) against grid-shape churn."""
        if not all(isinstance(v, (int, float, bool, str, type(None)))
                   for v in kwargs.values()):
            return builder()
        cache = self.__dict__.setdefault("_prog_cache", {})
        state = tuple(getattr(self, name, None) for name in self._traced_constants)
        for key in [k for k, (st, _) in cache.items()
                    if len(st) != len(state)
                    or any(a is not b for a, b in zip(st, state))]:
            del cache[key]
        leaves, treedef = jax.tree_util.tree_flatten(samples)
        sig = (
            kind, X_new.shape, str(X_new.dtype),
            str(treedef),
            tuple((v.shape, str(v.dtype)) for v in leaves),
            extra, tuple(sorted(kwargs.items())),
            tuple(id(s) for s in state),
        )
        hit = cache.get(sig)
        if hit is not None:
            return hit[1]
        prog = builder()
        cache[sig] = (state, prog)
        while len(cache) > self._prog_cache_max:
            del cache[next(iter(cache))]
        return prog

    def _set_data(self, X: jnp.ndarray, y: Optional[jnp.ndarray] = None):
        X = jnp.asarray(X)
        X = X if X.ndim > 1 else X[:, None]
        if y is not None:
            return X, jnp.asarray(y).squeeze()
        return X

    def _set_training_data(self, X_train_new=None, y_train_new=None, device=None) -> None:
        X_train = self.X_train if X_train_new is None else X_train_new
        y_train = self.y_train if y_train_new is None else y_train_new
        if device:
            X_train = jax.device_put(X_train, device)
            y_train = jax.device_put(y_train, device)
        self.X_train = X_train
        self.y_train = y_train

    def _print_summary(self) -> None:
        self.mcmc.print_summary()
