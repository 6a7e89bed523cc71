"""Parallelism: device meshes, shardings, multi-host distribution."""
