"""Training-state checkpointing with orbax.

Parity target: the reference's per-iteration model files
(exp/.../N.mdl) and --stage resume contract (SURVEY.md §5
checkpoint/resume row): every iteration's full training state (params,
batch stats, optimizer state, step counter) is a directory on disk;
resume = point at it.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from kaldi_tpu.core.logging import get_logger

log = get_logger(__name__)


def save_train_state(path: str, step: int, params, batch_stats,
                     opt_state) -> None:
    path = os.path.abspath(path)
    ckpt = ocp.StandardCheckpointer()
    state = {
        "step": np.asarray(step),
        "params": jax.tree_util.tree_map(np.asarray, params),
        "batch_stats": jax.tree_util.tree_map(np.asarray, dict(batch_stats)),
        "opt_state": jax.tree_util.tree_map(np.asarray, opt_state),
    }
    ckpt.save(os.path.join(path, f"step_{step}"), state, force=True)
    ckpt.wait_until_finished()
    log.info("checkpoint: saved step %d to %s", step, path)


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            try:
                steps.append(int(name.split("_", 1)[1]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_train_state(path: str, abstract_state: Dict[str, Any],
                        step: Optional[int] = None):
    """abstract_state: a pytree of the same structure (e.g. the freshly
    initialized state) used as the restore template."""
    path = os.path.abspath(path)
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    ckpt = ocp.StandardCheckpointer()
    state = ckpt.restore(os.path.join(path, f"step_{step}"), abstract_state)
    log.info("checkpoint: restored step %d from %s", step, path)
    return state
