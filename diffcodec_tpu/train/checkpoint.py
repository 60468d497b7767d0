"""Orbax checkpointing with rotation and resume.

Parity targets (`train_controlnet.py`):
  * `accelerator.save_state('checkpoint-{step}')` + `checkpoints_total_limit`
    rotation (:1174-1197)
  * `--resume_from_checkpoint latest` (dirname step parsing, :1040-1065)
  * final `save_pretrained` export + shape-filtered warm start (:822-832)
"""

from __future__ import annotations

import os
import re
import shutil
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

_CKPT_RE = re.compile(r"^checkpoint-(\d+)$")


def list_checkpoints(ckpt_dir: str):
    """Sorted (step, path) list of checkpoint-N dirs."""
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        m = _CKPT_RE.match(name)
        if m:
            out.append((int(m.group(1)), os.path.join(ckpt_dir, name)))
    return sorted(out)


def save_checkpoint(ckpt_dir: str, step: int, state: Any,
                    total_limit: Optional[int] = None) -> str:
    """Save pytree `state` as checkpoint-{step}; rotate old ones."""
    os.makedirs(ckpt_dir, exist_ok=True)
    # re-saving the same step overwrites without rotating others
    existing = [(s, p) for s, p in list_checkpoints(ckpt_dir) if s != step]
    if total_limit is not None and len(existing) >= total_limit:
        # same policy as train_controlnet.py:1180-1197: delete oldest so the
        # new save keeps the count at the limit
        n_remove = len(existing) - total_limit + 1
        for _, path in existing[:n_remove]:
            shutil.rmtree(path, ignore_errors=True)
    path = os.path.join(ckpt_dir, f"checkpoint-{step}")
    if os.path.exists(path):  # overwrite (e.g. final save == periodic save)
        shutil.rmtree(path, ignore_errors=True)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path) + "/state",
               jax.device_get(state))
    ckptr.wait_until_finished()
    return path


def restore_checkpoint(ckpt_dir: str, target: Any,
                       step: Optional[int] = None):
    """Restore; step=None -> latest.  Returns (state, step) or (None, 0)."""
    existing = list_checkpoints(ckpt_dir)
    if not existing:
        return None, 0
    if step is None:
        step, path = existing[-1]
    else:
        match = [p for s, p in existing if s == step]
        if not match:
            return None, 0
        path = match[0]
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(os.path.abspath(path) + "/state",
                          jax.device_get(target))
    return state, step


def warm_start_filter(params: Any, loaded: Any):
    """Shape-filtered warm start (`train_controlnet.py:822-832`): copy
    leaves whose path+shape match, keep fresh init elsewhere."""
    p_flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    l_flat = dict(jax.tree_util.tree_flatten_with_path(loaded)[0])
    out = []
    copied = 0
    for path, leaf in p_flat:
        cand = l_flat.get(path)
        if cand is not None and np.shape(cand) == np.shape(leaf):
            out.append(cand)
            copied += 1
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out), copied
