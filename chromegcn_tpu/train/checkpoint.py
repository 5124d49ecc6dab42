"""Checkpointing: params + batch stats + optimizer state + step.

A strict superset of the reference's save-only checkpoints
(reference: utils/evals.py:250-263 saves only model weights): we persist the
optimizer state and epoch too, enabling true resume (the reference could
only warm-start weights — SURVEY §5 checkpoint/resume gap).

Orbax handles the array serialization; save modes 'best'/'all' mirror the
reference's ``-save_mode`` flag (reference: config_args.py:25).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def _path(run_dir: str, name: str) -> str:
    return os.path.abspath(os.path.join(run_dir, name))


def save_checkpoint(
    run_dir: str,
    state: Dict[str, Any],
    epoch: int,
    save_mode: str = "best",
    score: Optional[float] = None,
) -> str:
    """Save a checkpoint pytree. state must be a dict of arrays/pytrees."""
    if save_mode == "all" and score is not None:
        name = f"ckpt_epoch{epoch}_score{100 * score:.3f}"
    else:
        name = "ckpt"
    path = _path(run_dir, name)
    ckptr = ocp.StandardCheckpointer()
    payload = dict(state)
    payload["epoch"] = np.asarray(epoch)
    ckptr.save(path, payload, force=True)
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(run_dir: str, name: str = "ckpt",
                       template: Optional[Dict[str, Any]] = None) -> Dict[str, Any]:
    path = _path(run_dir, name)
    ckptr = ocp.StandardCheckpointer()
    if template is not None:
        tpl = dict(template)
        tpl["epoch"] = np.asarray(0)
        restored = ckptr.restore(path, tpl)
    else:
        restored = ckptr.restore(path)
    return restored


def checkpoint_exists(run_dir: str, name: str = "ckpt") -> bool:
    return os.path.isdir(_path(run_dir, name))


def tree_to_numpy(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)
