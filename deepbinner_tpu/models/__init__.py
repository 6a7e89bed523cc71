"""Model definitions, weight import/export, and the model registry."""
