"""Example-script smoke tests — the integration suite (reference analog: CI runs
every notebook under CI_SMOKE=True, .github/workflows/notebook_smoke.yml)."""

import os
import runpy
import sys

import pytest

EXAMPLES = [
    "simple_gp.py",
    "vigp_sparse_image.py",
    "gp_bo.py",
    "vidkl_active_learning.py",
    "multitask_bo.py",
    "hypothesis_learning.py",
    "sparse_gp_reconstruction.py",
    "heteroskedastic_gp.py",
    "uncertain_inputs.py",
    "measured_noise_gp.py",
    "compare_gps.py",
    "structured_gp.py",
]

EXAMPLES_DIR = os.path.join(os.path.dirname(__file__), "..", "examples")


@pytest.mark.parametrize("script", EXAMPLES)
def test_example_smoke(script, monkeypatch, capsys):
    monkeypatch.setenv("SMOKE", "1")
    path = os.path.join(EXAMPLES_DIR, script)
    runpy.run_path(path, run_name="__main__")
    out = capsys.readouterr().out
    assert out.strip(), f"{script} produced no output"
    assert "nan" not in out.lower().replace("nanarg", "")


# ---------------------------------------------------------------------------
# Golden statistical gates for the bundled example workflows (VERDICT r03
# item 6).  NUTS leapfrog counts are chaotically revision-sensitive, so these
# pin POSTERIOR STATISTICS (mean/sd bands, coverage, reconstruction error) —
# the quantities a reference user relies on — not bitwise outputs.  Bands are
# set at ~3x the observed seed-to-seed spread.  Reference workflows:
# examples/gpax_simpleGP.ipynb, gpax_viGP.ipynb, GPax_MultiTaskGP_BO.ipynb,
# gpax_viDKL_plasmons.ipynb (BASELINE.md parity gate).
# ---------------------------------------------------------------------------

import jax.numpy as jnp
import numpy as np

import gpax_tpu
from gpax_tpu.utils import get_keys


def _simple_gp_fit():
    rng = np.random.default_rng(1)
    X = np.sort(rng.uniform(-2, 2, 48))
    f = lambda x: np.sin(2 * x)  # noqa: E731
    y = f(X) + 0.1 * rng.normal(size=X.shape)
    gp = gpax_tpu.ExactGP(1, "RBF")
    gp.fit(get_keys()[0], jnp.asarray(X, jnp.float32),
           jnp.asarray(y, jnp.float32), num_warmup=200, num_samples=200,
           print_summary=False, progress_bar=False)
    X_test = np.linspace(-2, 2, 101)
    return gp, X_test, f(X_test)


def test_golden_simple_gp_posterior_bands():
    """simpleGP workflow: posterior predictive recovers sin(2x) and the noise
    posterior concentrates near the generating sd (0.1)."""
    gp, X_test, truth = _simple_gp_fit()
    mean, var = gp.predict_moments(get_keys()[1],
                                   jnp.asarray(X_test, jnp.float32)[:, None],
                                   noiseless=True)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - truth) ** 2)))
    assert rmse < 0.12, rmse
    noise = np.asarray(gp.get_samples()["noise"])  # variance parameterization
    assert 0.004 < float(noise.mean()) < 0.05, noise.mean()
    ls = np.asarray(gp.get_samples()["k_length"])
    assert 0.2 < float(ls.mean()) < 3.0, ls.mean()


def test_golden_simple_gp_calibration():
    """Central ~95% predictive intervals cover the truth at a sane rate."""
    gp, X_test, truth = _simple_gp_fit()
    mean, var = gp.predict_moments(get_keys()[1],
                                   jnp.asarray(X_test, jnp.float32)[:, None],
                                   noiseless=True)
    sd = np.sqrt(np.asarray(var))
    inside = np.abs(np.asarray(mean) - truth) < 2.0 * sd
    assert 0.75 <= float(inside.mean()) <= 1.0, inside.mean()


def test_golden_vigp_sparse_image():
    """viGP workflow: 2D sparse-image reconstruction error band."""
    from gpax_tpu.utils import preprocess_sparse_image

    rng = np.random.default_rng(0)
    size = 24
    xx, yy = np.meshgrid(np.arange(size), np.arange(size))
    truth = np.sin(xx / 4.0) * np.cos(yy / 5.0) + 1.5
    mask = rng.uniform(size=truth.shape) < 0.25
    coords, values, full_grid = preprocess_sparse_image(
        np.where(mask, truth, 0.0))
    model = gpax_tpu.viGP(input_dim=2, kernel="Matern")
    model.fit(get_keys()[0], jnp.asarray(coords), jnp.asarray(values),
              num_steps=600, print_summary=False, progress_bar=False)
    mean, _ = model.predict(get_keys()[1], jnp.asarray(full_grid))
    rmse = float(np.sqrt(np.mean(
        (np.asarray(mean).reshape(truth.shape) - truth) ** 2)))
    assert rmse < 0.08, rmse


def test_golden_visparsegp_reconstruction():
    """viSparseGP workflow: inducing-point 1D reconstruction error band."""
    rng = np.random.default_rng(0)
    X = rng.uniform(0, 4, 400)
    f = lambda x: np.sin(3 * x) * np.exp(-0.3 * x)  # noqa: E731
    y = f(X) + 0.05 * rng.normal(size=X.shape)
    model = gpax_tpu.viSparseGP(input_dim=1, kernel="RBF")
    model.fit(get_keys()[0], jnp.asarray(X, jnp.float32),
              jnp.asarray(y, jnp.float32), inducing_points_ratio=0.1,
              num_steps=800, print_summary=False, progress_bar=False)
    grid = np.linspace(0, 4, 201)
    mean, _ = model.predict(get_keys()[1], jnp.asarray(grid, jnp.float32))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - f(grid)) ** 2)))
    assert rmse < 0.08, rmse


def test_golden_mtgp_bo_step():
    """MultiTaskGP BO workflow: posterior predictive band on the target task
    and an EI argmax inside the known-good region of the objective."""
    def f_hi(x):
        return np.sin(5 * x) * np.exp(-x)

    def f_lo(x):
        return 0.8 * f_hi(x) + 0.2 * np.cos(3 * x)

    rng = np.random.default_rng(0)
    X_lo, X_hi = rng.uniform(0, 2, 32), rng.uniform(0, 2, 10)
    X = np.concatenate([np.column_stack([X_lo, np.zeros(32)]),
                        np.column_stack([X_hi, np.ones(10)])])
    y = np.concatenate([f_lo(X_lo), f_hi(X_hi)]) + 0.05 * rng.normal(size=42)
    mtgp = gpax_tpu.MultiTaskGP(1, "Matern", num_latents=1, num_tasks=2)
    mtgp.fit(get_keys()[0], jnp.asarray(X, jnp.float32),
             jnp.asarray(y, jnp.float32), num_warmup=400, num_samples=400,
             target_accept_prob=0.7, print_summary=False, progress_bar=False)
    grid = np.linspace(0, 2, 51)
    X_test = jnp.asarray(np.column_stack([grid, np.ones_like(grid)]),
                         jnp.float32)
    mean, _ = mtgp.predict_in_batches(get_keys()[1], X_test, batch_size=64)
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - f_hi(grid)) ** 2)))
    assert rmse < 0.25, rmse
    from gpax_tpu.acquisition import EI

    acq = EI(get_keys()[1], mtgp, X_test, maximize=True, noiseless=True)
    next_x = float(grid[int(np.asarray(acq).argmax())])
    # the high-fidelity optimum is x* ≈ 0.298; EI must propose nearby or in
    # an unexplored high-value region — band covers observed seed spread
    assert 0.0 <= next_x <= 0.9, next_x


def test_golden_vidkl_active_learning_step():
    """viDKL AL workflow: pool RMSE band + the acquisition step proposes an
    informative (unmeasured) pool point."""
    rng = np.random.default_rng(0)
    n_pool, d = 200, 32
    latent = rng.normal(size=(n_pool, 2))
    mix = rng.normal(size=(2, d)) / np.sqrt(2)
    X_pool = latent @ mix
    y_pool = np.sin(latent[:, 0] * 2.0) + 0.3 * latent[:, 1]
    measured = rng.choice(n_pool, size=48, replace=False)
    dkl = gpax_tpu.viDKL(input_dim=d, z_dim=2, kernel="RBF")
    dkl.fit(get_keys()[0], jnp.asarray(X_pool[measured], jnp.float32),
            jnp.asarray(y_pool[measured], jnp.float32), num_steps=600,
            print_summary=False, progress_bar=False)
    mean, var = dkl.predict(get_keys()[1], jnp.asarray(X_pool, jnp.float32))
    rmse = float(np.sqrt(np.mean((np.asarray(mean) - y_pool) ** 2)))
    assert rmse < 0.45, rmse
    # embeddings collapse d=32 to z=2 and stay finite
    z = dkl.embed(jnp.asarray(X_pool, jnp.float32))
    assert z.shape[-2:] == (n_pool, 2) or z.shape == (n_pool, 2)
    assert bool(np.isfinite(np.asarray(z)).all())
    # AL step: max-variance point should not be one already measured (the
    # measured points' predictive variance is suppressed)
    order = np.argsort(-np.asarray(var))
    top5 = set(int(i) for i in order[:5])
    assert len(top5 - set(int(i) for i in measured)) >= 3


# ---------------------------------------------------------------------------
# Notebook smoke tests (the reference's de-facto integration surface,
# .github/workflows/notebook_smoke.yml).  Executed headlessly via nbclient;
# gated behind NOTEBOOK_SMOKE=1 (CI) because each notebook boots its own
# kernel — locally run `NOTEBOOK_SMOKE=1 SMOKE=1 pytest tests/test_examples.py`.
# ---------------------------------------------------------------------------

_NB_DIR = os.path.join(os.path.dirname(__file__), "..", "examples", "notebooks")


@pytest.mark.skipif(
    not bool(int(os.environ.get("NOTEBOOK_SMOKE", "0"))),
    reason="set NOTEBOOK_SMOKE=1 to execute notebook ports",
)
@pytest.mark.parametrize(
    "nb_name",
    sorted(
        os.path.join(rel, f) if rel else f
        for rel in ("", "contrib")
        if os.path.isdir(os.path.join(_NB_DIR, rel))
        for f in os.listdir(os.path.join(_NB_DIR, rel))
        if f.endswith(".ipynb")
    )
    if os.path.isdir(_NB_DIR) else [],
)
def test_notebook_smoke(nb_name):
    import nbformat
    from nbclient import NotebookClient

    os.environ["SMOKE"] = "1"
    nb = nbformat.read(os.path.join(_NB_DIR, nb_name), as_version=4)
    client = NotebookClient(nb, timeout=2400, kernel_name="python3")
    client.execute()
