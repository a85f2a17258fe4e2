"""Author the tutorial-depth and contrib notebooks (VERDICT r04 item 7).

Unlike make_notebooks.py (which derives notebook forms from the examples/*.py
scripts), these two are written as standalone teaching documents:

  * examples/notebooks/simple_gp_tutorial.ipynb — a walkthrough of fully
    Bayesian GP regression at tutorial depth (parity surface:
    /root/reference/examples/gpax_simpleGP_tutorial.ipynb, rewritten —
    original prose + code on the gpax_tpu API, with TPU-specific notes).
  * examples/notebooks/contrib/dkl_molecular_active_learning.ipynb — DKL
    embeddings + active learning over one-hot molecular-style string
    descriptors (parity surface: /root/reference/examples/contrib/
    gpax_dkl_notebookIII_molecules.ipynb, which needs the QM9 CSV — this
    version generates a synthetic analog locally, zero egress).

Run:  python scripts/make_tutorial_notebooks.py
"""

import pathlib

import nbformat as nbf

ROOT = pathlib.Path(__file__).resolve().parents[1]
OUT = ROOT / "examples" / "notebooks"


def _nb(cells):
    nb = nbf.v4.new_notebook()
    nb.cells = cells
    nb.metadata["kernelspec"] = {
        "display_name": "Python 3", "language": "python", "name": "python3",
    }
    return nb


md = nbf.v4.new_markdown_cell
code = nbf.v4.new_code_cell


# --------------------------------------------------------------- tutorial

tutorial = [
    md(
        "# Fully Bayesian Gaussian processes, step by step\n\n"
        "This tutorial walks through GP regression with `gpax_tpu` on a toy\n"
        "1-D problem: what the model is, how the fully Bayesian treatment\n"
        "differs from point-estimate GPs, and how priors over kernel\n"
        "hyperparameters shape the posterior.\n\n"
        "A GP places a distribution over functions: any finite set of\n"
        "function values is jointly Gaussian with covariance given by a\n"
        "kernel $k_\\theta(x, x')$. Most GP libraries fit the kernel\n"
        "hyperparameters $\\theta$ by maximizing the marginal likelihood and\n"
        "then condition on that single point estimate. Here instead we put\n"
        "priors on $\\theta = (\\sigma, l, \\epsilon)$ and integrate over the\n"
        "posterior $p(\\theta \\mid X, y)$ with NUTS — so the predictive\n"
        "uncertainty reflects hyperparameter uncertainty too, which matters\n"
        "most exactly where data is scarce."
    ),
    code(
        "import numpy as np\n"
        "import matplotlib.pyplot as plt\n\n"
        "import gpax_tpu as gpax\n\n"
        "rng_key, rng_key_predict = gpax.utils.get_keys()"
    ),
    md(
        "## Data\n\n"
        "Noisy observations of a function with both smooth and localized\n"
        "structure — a classic trap for a single lengthscale estimate:"
    ),
    code(
        "np.random.seed(0)\n"
        "NUM_INIT_POINTS = 25\n"
        "NOISE_LEVEL = 0.1\n\n"
        "def f(x):\n"
        "    return 2.0 * np.sin(3.0 * x) + 0.5 * x + "
        "1.5 * np.exp(-12.0 * (x - 0.4) ** 2)\n\n"
        "X = np.random.uniform(-1.0, 1.0, NUM_INIT_POINTS)\n"
        "y = f(X) + np.random.normal(0.0, NOISE_LEVEL, NUM_INIT_POINTS)\n\n"
        "X_test = np.linspace(-1, 1, 100)\n"
        "plt.scatter(X, y, marker='x', c='k')\n"
        "plt.plot(X_test, f(X_test), lw=0.8, c='gray')\n"
        "plt.xlabel('$x$'); plt.ylabel('$y$');"
    ),
    md(
        "## Fit an ExactGP with NUTS\n\n"
        "`ExactGP(input_dim, kernel)` with the RBF kernel. `fit` runs the\n"
        "No-U-Turn Sampler over the kernel scale, lengthscale, and noise —\n"
        "on TPU the whole sampler compiles into one program; on CPU it runs\n"
        "the same math. The summary table reports posterior moments and the\n"
        "split-$\\hat R$ convergence diagnostic for every hyperparameter."
    ),
    code(
        "gp_model = gpax.ExactGP(1, 'RBF')\n"
        "gp_model.fit(rng_key, X, y, num_warmup=500, num_samples=500,\n"
        "             progress_bar=False)"
    ),
    md(
        "## Predict\n\n"
        "`predict` returns the posterior-mean curve and sampled predictive\n"
        "functions — one per posterior draw of $\\theta$ (times `n` draws of\n"
        "the function given $\\theta$). The spread of those curves IS the\n"
        "model's honest uncertainty."
    ),
    code(
        "y_pred, y_sampled = gp_model.predict(rng_key_predict, X_test, n=1)\n"
        "y_pred = np.asarray(y_pred)\n"
        "curves = np.asarray(y_sampled).reshape(-1, len(X_test))\n"
        "print('posterior mean shape:', y_pred.shape,\n"
        "      '| sampled curves:', curves.shape)"
    ),
    code(
        "_, ax = plt.subplots(dpi=100)\n"
        "ax.scatter(X, y, marker='x', c='k', zorder=2, label='observations')\n"
        "for c in curves[::10]:\n"
        "    ax.plot(X_test, c, c='crimson', alpha=0.1, lw=0.8)\n"
        "ax.plot(X_test, y_pred, c='navy', lw=1.5, label='posterior mean')\n"
        "ax.plot(X_test, f(X_test), c='gray', lw=0.8, ls='--', label='truth')\n"
        "ax.legend(); ax.set_xlabel('$x$'); ax.set_ylabel('$y$');"
    ),
    code(
        "sd = curves.std(0)\n"
        "_, ax = plt.subplots(dpi=100)\n"
        "ax.scatter(X, y, marker='x', c='k', zorder=2)\n"
        "ax.plot(X_test, y_pred, c='navy', lw=1.5)\n"
        "ax.fill_between(X_test, y_pred - 2 * sd, y_pred + 2 * sd,\n"
        "                color='navy', alpha=0.2, label='$2\\\\sigma$ band')\n"
        "ax.legend(); ax.set_xlabel('$x$'); ax.set_ylabel('$y$');"
    ),
    md(
        "## Custom hyperparameter priors\n\n"
        "The default $LogNormal(0, 1)$ lengthscale prior is permissive: it\n"
        "admits very long lengthscales, which show up above as a family of\n"
        "nearly-linear sampled curves. Domain knowledge about how fast the\n"
        "function varies belongs in the prior. `gpax.utils.gamma_dist(c, r)`\n"
        "builds a Gamma prior (mean $c/r$); `dviz` plots it:"
    ),
    code(
        "lengthscale_prior_dist = gpax.utils.gamma_dist(2, 5)\n"
        "gpax.utils.dviz(lengthscale_prior_dist, samples=2000)"
    ),
    code(
        "rng_key, rng_key_predict = gpax.utils.get_keys()\n"
        "gp_model2 = gpax.ExactGP(1, 'RBF',\n"
        "                         lengthscale_prior_dist=lengthscale_prior_dist)\n"
        "gp_model2.fit(rng_key, X, y, num_warmup=500, num_samples=500,\n"
        "              progress_bar=False)\n"
        "y_pred2, y_sampled2 = gp_model2.predict(rng_key_predict, X_test, n=1)\n"
        "curves2 = np.asarray(y_sampled2).reshape(-1, len(X_test))"
    ),
    code(
        "_, ax = plt.subplots(dpi=100)\n"
        "ax.scatter(X, y, marker='x', c='k', zorder=2)\n"
        "for c in curves2[::10]:\n"
        "    ax.plot(X_test, c, c='crimson', alpha=0.1, lw=0.8)\n"
        "ax.plot(X_test, np.asarray(y_pred2), c='navy', lw=1.5)\n"
        "ax.set_title('Gamma(2, 5) lengthscale prior')\n"
        "ax.set_xlabel('$x$'); ax.set_ylabel('$y$');"
    ),
    md(
        "With the informative prior the long-lengthscale (quasi-linear)\n"
        "explanations lose posterior mass and the fit tracks local structure\n"
        "more closely. The same `*_prior_dist` hook exists for the noise\n"
        "(`noise_prior_dist`) — useful when the measurement error is known.\n\n"
        "## Notes for TPU runs\n\n"
        "* Everything above works unchanged on a TPU chip; `fit` compiles\n"
        "  the full sampler into one XLA program and auto-segments very long\n"
        "  runs into bounded device calls (`segment_size=`).\n"
        "* All distance/gram products run at f32-exact matmul precision and\n"
        "  every factorization goes through jitter-escalated Cholesky — the\n"
        "  library handles the f32-on-TPU numerics rules for you.\n"
        "* `predict` compiles once per test-grid shape and caches the\n"
        "  program on the model instance — active-learning loops pay the\n"
        "  compile once."
    ),
    code(
        "summary = {k: float(np.asarray(v).mean())\n"
        "           for k, v in gp_model2.get_samples().items()}\n"
        "rmse = float(np.sqrt(np.mean((np.asarray(y_pred2) - f(X_test)) ** 2)))\n"
        "print('posterior means:', summary)\n"
        "print('rmse vs truth:', round(rmse, 4))\n"
        "assert rmse < 0.5\n"
        "print('done')"
    ),
]


# --------------------------------------------------------------- contrib

contrib = [
    md(
        "# DKL on molecular-style descriptors: embeddings + active learning\n\n"
        "Deep Kernel Learning (DKL) composes a neural feature extractor with\n"
        "a GP: the network learns a low-dimensional embedding in which the\n"
        "GP's kernel is a good similarity measure, and the GP supplies\n"
        "calibrated uncertainty on top. That combination is what makes DKL a\n"
        "practical engine for molecular discovery loops — high-dimensional\n"
        "one-hot string descriptors in, uncertainty-aware property\n"
        "predictions out.\n\n"
        "The upstream version of this workflow runs on a QM9 subset\n"
        "(SMILES → SELFIES → one-hot). This notebook is self-contained: it\n"
        "generates a synthetic analog — random 'token sequences' one-hot\n"
        "encoded the same way, with a property that depends nonlinearly on a\n"
        "few latent sequence motifs — so the full pipeline (embed → predict\n"
        "→ active learning) runs anywhere with zero downloads."
    ),
    code(
        "import numpy as np\n"
        "import matplotlib.pyplot as plt\n\n"
        "import gpax_tpu as gpax\n\n"
        "np.random.seed(0)"
    ),
    md(
        "## Synthetic descriptor dataset\n\n"
        "600 'molecules', each a length-24 sequence over a 12-token\n"
        "alphabet, one-hot encoded and flattened (d = 288) — the same shape\n"
        "class as a SELFIES one-hot. The target property counts two motifs\n"
        "and adds a smooth composition effect:"
    ),
    code(
        "N, L, A = 600, 24, 12\n"
        "seqs = np.random.randint(0, A, size=(N, L))\n"
        "X = np.eye(A, dtype=np.float32)[seqs].reshape(N, L * A)\n\n"
        "def property_fn(s):\n"
        "    motif1 = np.mean((s[:, :-1] == 3) & (s[:, 1:] == 7), axis=1)\n"
        "    motif2 = np.mean(s == 11, axis=1)\n"
        "    comp = np.sin(4.0 * s.mean(axis=1) / A)\n"
        "    return 10.0 * motif1 - 4.0 * motif2 + comp\n\n"
        "y = property_fn(seqs) + 0.05 * np.random.randn(N)\n"
        "y = (y - y.mean()) / y.std()\n"
        "print('X:', X.shape, ' y:', y.shape)"
    ),
    md(
        "## Train a viDKL model and look at its latent space\n\n"
        "`viDKL` trains the MLP weights and GP hyperparameters jointly by\n"
        "stochastic variational inference. `embed` exposes the learned\n"
        "2-D latent space:"
    ),
    code(
        "rng_key, rng_key_predict = gpax.utils.get_keys()\n"
        "n_train = 150\n"
        "idx = np.random.choice(N, n_train, replace=False)\n\n"
        "dkl = gpax.viDKL(input_dim=X.shape[-1], z_dim=2, kernel='RBF')\n"
        "dkl.fit(rng_key, X[idx], y[idx], num_steps=400,\n"
        "        print_summary=False, progress_bar=False)\n"
        "z_all = np.asarray(dkl.embed(X))\n"
        "pred_mean, pred_var = dkl.predict_in_batches(rng_key_predict, X,\n"
        "                                             batch_size=250)"
    ),
    code(
        "fig, ax = plt.subplots(1, 2, figsize=(9, 3.5), dpi=100)\n"
        "s0 = ax[0].scatter(z_all[:, 0], z_all[:, 1], c=y, s=8, cmap='viridis')\n"
        "ax[0].set_title('latent space, colored by true property')\n"
        "plt.colorbar(s0, ax=ax[0])\n"
        "ax[1].errorbar(y, np.asarray(pred_mean),\n"
        "               yerr=2 * np.sqrt(np.asarray(pred_var)),\n"
        "               fmt='.', ms=3, alpha=0.4, elinewidth=0.5)\n"
        "ax[1].plot([-3, 3], [-3, 3], c='k', lw=0.8)\n"
        "ax[1].set_xlabel('true'); ax[1].set_ylabel('predicted')\n"
        "plt.tight_layout()"
    ),
    md(
        "## Active learning\n\n"
        "Start from a small seed set and let the model choose what to\n"
        "'measure' next with the UCB acquisition over its own predictive\n"
        "uncertainty — the loop that matters when each measurement is an\n"
        "expensive experiment. Each iteration refits from scratch (fast:\n"
        "the whole SVI fit is one compiled program) and acquires the\n"
        "highest-UCB unmeasured candidate:"
    ),
    code(
        "init_num, steps = 30, 15\n"
        "measured = list(np.random.choice(N, init_num, replace=False))\n"
        "rmse_trace = []\n"
        "for step in range(steps):\n"
        "    pool = np.setdiff1d(np.arange(N), measured)\n"
        "    key_fit, key_acq = gpax.utils.get_keys(step)\n"
        "    model = gpax.viDKL(input_dim=X.shape[-1], z_dim=2, kernel='RBF')\n"
        "    model.fit(key_fit, X[measured], y[measured], num_steps=300,\n"
        "              print_summary=False, progress_bar=False)\n"
        "    mean, var = model.predict_in_batches(key_acq, X[pool],\n"
        "                                         batch_size=250)\n"
        "    ucb = np.asarray(mean) + 2.0 * np.sqrt(np.asarray(var))\n"
        "    measured.append(int(pool[np.argmax(ucb)]))\n"
        "    full_mean, _ = model.predict_in_batches(key_acq, X,\n"
        "                                            batch_size=250)\n"
        "    rmse_trace.append(float(np.sqrt(np.mean(\n"
        "        (np.asarray(full_mean) - y) ** 2))))\n"
        "print('pool rmse per AL step:', [round(r, 3) for r in rmse_trace])"
    ),
    code(
        "plt.figure(dpi=100)\n"
        "plt.plot(rmse_trace, marker='o')\n"
        "plt.xlabel('active-learning step'); plt.ylabel('pool RMSE')\n"
        "best = np.argsort(-y)[:10]\n"
        "found = len(set(best) & set(measured))\n"
        "print(f'top-10 property candidates already measured: {found}/10')\n"
        "assert rmse_trace[-1] < 1.0\n"
        "print('done')"
    ),
]


if __name__ == "__main__":
    (OUT / "contrib").mkdir(parents=True, exist_ok=True)
    nbf.write(_nb(tutorial), str(OUT / "simple_gp_tutorial.ipynb"))
    print("wrote", OUT / "simple_gp_tutorial.ipynb")
    nbf.write(_nb(contrib),
              str(OUT / "contrib" / "dkl_molecular_active_learning.ipynb"))
    print("wrote", OUT / "contrib" / "dkl_molecular_active_learning.ipynb")
