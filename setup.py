"""Classic setuptools shim.

All metadata lives in pyproject.toml; this file exists so the package
installs in OFFLINE environments whose setuptools predates integrated
bdist_wheel (< 70.1) and that have no `wheel` package to pull: there,
PEP 517/660 builds fail with "invalid command 'bdist_wheel'", while the
legacy path (`pip install -e . --no-use-pep517 --no-build-isolation`)
works with nothing but setuptools itself. Environments with modern
tooling can ignore this file entirely — `pip install .` uses
pyproject.toml's build-system table.
"""

from setuptools import setup

setup()
