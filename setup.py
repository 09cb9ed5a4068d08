"""Setuptools shim (reference parity: the reference installs via
setup.py:24-29 console scripts).

Metadata lives in pyproject.toml; this file exists so environments
whose setuptools predates PEP 660 editable-wheel support (no ``wheel``
package available) can still do ``python setup.py develop`` /
``pip install .``.
"""

from setuptools import setup

setup()
