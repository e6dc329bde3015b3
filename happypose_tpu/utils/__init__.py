"""Utilities: logging, timers, RNG discipline, checkpoints, resources."""
