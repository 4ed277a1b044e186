"""Scalar/array function helpers shared by operators and the harness."""
