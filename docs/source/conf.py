# Sphinx configuration for manipulapy-tpu (mirrors the reference's
# readthedocs setup, /root/reference/docs/source/conf.py, in role only —
# written from scratch for this project).
#
# Build: pip install sphinx furo && sphinx-build -b html docs/source docs/_build
# (Sphinx is not bundled in the runtime image; docs build in CI/dev only.)

import os
import sys

sys.path.insert(0, os.path.abspath("../.."))

project = "manipulapy-tpu"
author = "The manipulapy-tpu contributors"
copyright = "2026, the manipulapy-tpu contributors"
release = "0.3.0"

extensions = [
    "sphinx.ext.autodoc",
    "sphinx.ext.autosummary",
    "sphinx.ext.napoleon",
    "sphinx.ext.viewcode",
    "sphinx.ext.intersphinx",
]

autosummary_generate = True
autodoc_member_order = "bysource"
autodoc_typehints = "description"
napoleon_google_docstring = True
napoleon_numpy_docstring = True

intersphinx_mapping = {
    "python": ("https://docs.python.org/3", None),
    "numpy": ("https://numpy.org/doc/stable/", None),
    "jax": ("https://docs.jax.dev/en/latest/", None),
}

# Heavy optional deps (pybullet, cv2, torch) are not importable on the
# docs builder; autodoc must mock them.
autodoc_mock_imports = [
    "pybullet",
    "pybullet_data",
    "cv2",
    "torch",
    "ultralytics",
    "sklearn",
    "trimesh",
    "matplotlib",
]

templates_path = ["_templates"]
exclude_patterns = []

html_theme = "furo"
html_title = "manipulapy-tpu"
html_static_path = []
