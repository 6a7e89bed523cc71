"""Training pipeline: prep → balance → train (reference prep/balance/train_network)."""
