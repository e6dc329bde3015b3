"""CLI entry points (python -m happypose_tpu.scripts.<name>)."""
