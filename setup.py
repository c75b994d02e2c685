"""Legacy-editable-install shim: all metadata lives in pyproject.toml;
this exists so `pip install -e . --no-use-pep517` works in environments
without the `wheel` package (PEP 660 editable builds require bdist_wheel).
"""
from setuptools import setup

setup()
