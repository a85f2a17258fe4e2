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
    sorted(f for f in os.listdir(_NB_DIR) if f.endswith(".ipynb"))
    if os.path.isdir(_NB_DIR) else [],
)
def test_notebook_smoke(nb_name):
    import nbformat
    from nbclient import NotebookClient

    os.environ["SMOKE"] = "1"
    nb = nbformat.read(os.path.join(_NB_DIR, nb_name), as_version=4)
    client = NotebookClient(nb, timeout=2400, kernel_name="python3")
    client.execute()
