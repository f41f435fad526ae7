"""Reusable column functions and UDF kernels."""
