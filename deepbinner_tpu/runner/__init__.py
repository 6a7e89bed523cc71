"""Streaming execution: the compiled classify program and the batch executor."""
