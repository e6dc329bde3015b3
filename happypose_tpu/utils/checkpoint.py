"""Checkpoint save/restore + run-directory conventions.

Parity targets: the reference's rank-0 `{"state_dict", "epoch"}` torch saves
with a `checkpoint_epoch=last` fallback copy and `resume_run_id` logic
(/root/reference/happypose/pose_estimators/megapose/training/utils.py:156-215,
train_megapose.py:251-266).

TPU design: orbax-style single-writer checkpoints via flax serialization
(msgpack) — process 0 writes, others restore from the same path; the
truncated-file fallback is kept (primary + `_last` copy)."""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, Optional, Tuple, Union

import jax
from flax import serialization

from happypose_tpu.utils.logging import get_logger

logger = get_logger(__name__)


def save_checkpoint(
    run_dir: Union[str, Path],
    state: Any,
    epoch: int,
    config: Optional[Dict] = None,
    keep_last_copy: bool = True,
) -> Path:
    """Serialize a pytree train state; returns the checkpoint path."""
    run_dir = Path(run_dir)
    run_dir.mkdir(parents=True, exist_ok=True)
    if jax.process_index() != 0:
        return run_dir / "checkpoint.msgpack"
    payload = serialization.to_bytes(jax.device_get(state))
    path = run_dir / "checkpoint.msgpack"
    path.write_bytes(payload)
    (run_dir / "epoch.json").write_text(json.dumps({"epoch": epoch}))
    if config is not None:
        (run_dir / "config.json").write_text(json.dumps(config, default=str))
    if keep_last_copy:
        (run_dir / "checkpoint_last.msgpack").write_bytes(payload)
    return path


def load_checkpoint(
    run_dir: Union[str, Path], target: Any
) -> Tuple[Any, int]:
    """Restore into `target`'s structure; falls back to the `_last` copy on
    corruption (the reference's EOFError fallback)."""
    run_dir = Path(run_dir)
    primary = run_dir / "checkpoint.msgpack"
    fallback = run_dir / "checkpoint_last.msgpack"
    for path in (primary, fallback):
        if not path.exists():
            continue
        try:
            state = serialization.from_bytes(target, path.read_bytes())
            epoch = 0
            ep = run_dir / "epoch.json"
            if ep.exists():
                epoch = json.loads(ep.read_text())["epoch"]
            return state, epoch
        except Exception as e:  # truncated / corrupt file
            logger.warning(f"checkpoint {path} unreadable ({e}); trying next")
    raise FileNotFoundError(f"no readable checkpoint in {run_dir}")
