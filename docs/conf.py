"""Sphinx configuration for pyfastani-tpu."""

import os
import sys

sys.path.insert(0, os.path.abspath(".."))

project = "pyfastani-tpu"
copyright = "2026, pyfastani-tpu contributors"
author = "pyfastani-tpu contributors"

from pyfastani_tpu import __version__ as release  # noqa: E402

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.napoleon",
    "sphinx.ext.intersphinx",
    "sphinx.ext.viewcode",
]

autodoc_member_order = "groupwise"
autodoc_typehints = "description"
napoleon_google_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable", None),
    "jax": ("https://docs.jax.dev/en/latest", None),
}

html_theme = "alabaster"
html_title = f"pyfastani-tpu {release}"
