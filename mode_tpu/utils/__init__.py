"""Metrics, losses, checkpointing, logging, profiling, visualization."""
