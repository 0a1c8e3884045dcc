# Sphinx configuration for pythonic-disort-tpu
# (counterpart of the reference's docs/conf.py Sphinx/RTD setup).

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pythonic-disort-tpu"
copyright = "2026, pythonic-disort-tpu developers"
author = "pythonic-disort-tpu developers"
release = "0.2"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.mathjax",
    "myst_parser",                 # render the existing markdown docs
]

napoleon_google_docstring = False
napoleon_numpy_docstring = True
napoleon_use_param = False
napoleon_use_ivar = True

autodoc_mock_imports = ["jax", "jaxlib", "scipy", "mpmath"]
autosummary_generate = True

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]

html_theme = "sphinx_rtd_theme"
