"""Sphinx configuration (counterpart of reference docs/conf.py).

The reference wgets example notebooks from pymc-examples at build time
(reference docs/conf.py:44-59); this project's runnable examples live in
``examples/`` in-repo instead, so the docs build needs no network.
Build: ``pip install sphinx myst-parser && sphinx-build -b html docs docs/_build``.
"""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pymc-bart-tpu"
author = "pymc-bart-tpu developers"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "myst_parser",
]

source_suffix = {".rst": "restructuredtext", ".md": "markdown"}
master_doc = "index"
exclude_patterns = ["_build"]
html_theme = "alabaster"
autodoc_mock_imports = ["jax", "jaxlib"]
