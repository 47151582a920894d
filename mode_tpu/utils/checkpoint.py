"""Checkpoint save/restore (orbax) + torch-checkpoint interop.

Replaces the reference's ``torch.save({'epoch','state_dict','train_loss'})``
per-epoch files (``/root/reference/train_disparity.py:91-94``,
``train_fusion.py:178-179``). Unlike the reference, optimizer state IS
checkpointed, so resume is exact. Torch ``.tar`` checkpoints (the released
models) load through ``mode_tpu.utils.torch_convert``.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp


def save_checkpoint(path: str, payload: Any):
  """Save a pytree checkpoint to ``path`` (a directory)."""
  path = os.path.abspath(path)
  with ocp.PyTreeCheckpointer() as ckptr:
    ckptr.save(path, payload, force=True)


def load_checkpoint(path: str, like: Optional[Any] = None) -> Any:
  """Restore a pytree checkpoint; ``like`` provides structure/sharding."""
  path = os.path.abspath(path)
  with ocp.PyTreeCheckpointer() as ckptr:
    if like is None:
      return ckptr.restore(path)
    return ckptr.restore(path, args=ocp.args.PyTreeRestore(
        restore_args=jax.tree_util.tree_map(
            lambda x: ocp.RestoreArgs(restore_type=np.ndarray), like)))


def load_torch_checkpoint(path: str) -> dict:
  """Load a torch .tar/.pth checkpoint into numpy (CPU, weights only)."""
  import torch
  obj = torch.load(path, map_location="cpu", weights_only=False)
  return obj


def latest_epoch_dir(root: str, prefix: str) -> Optional[str]:
  """Find the newest ``<prefix><epoch>`` checkpoint directory under root."""
  if not os.path.isdir(root):
    return None
  best, best_ep = None, -1
  for name in os.listdir(root):
    if name.startswith(prefix):
      try:
        ep = int(name[len(prefix):])
      except ValueError:
        continue
      if ep > best_ep:
        best, best_ep = os.path.join(root, name), ep
  return best
