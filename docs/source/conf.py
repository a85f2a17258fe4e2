"""Sphinx configuration for gpax-tpu."""

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "gpax-tpu"
author = "gpax-tpu developers"
copyright = "2026, gpax-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
]

autodoc_mock_imports = []
autosummary_generate = True
napoleon_google_docstring = True

html_theme = "sphinx_rtd_theme"
templates_path = ["_templates"]
exclude_patterns = []
