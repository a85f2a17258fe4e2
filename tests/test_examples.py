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
