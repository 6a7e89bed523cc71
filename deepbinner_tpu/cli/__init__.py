"""CLI dispatch and per-subcommand workloads."""
