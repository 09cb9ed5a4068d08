"""Test package for the PySpark engine."""
