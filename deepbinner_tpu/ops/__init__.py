"""Compute ops: in-graph signal preprocessing, calling rules, Pallas kernels."""
