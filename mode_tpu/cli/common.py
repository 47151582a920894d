"""Shared CLI plumbing: checkpoint resolution (orbax dirs or torch .tar),
metric tables, seeding."""

from __future__ import annotations

import os
import random
from typing import Any

import jax
import numpy as np


def seed_everything(seed: int):
  random.seed(seed)
  np.random.seed(seed)


def format_table(headers: list[str], rows: list[list]) -> str:
  """PrettyTable-style report (test_disparity.py:150-154) without the dep."""
  cells = [[f"{v:^.4f}" if isinstance(v, (float, np.floating)) else str(v)
            for v in row] for row in rows]
  widths = [max(len(h), *(len(r[i]) for r in cells)) if cells else len(h)
            for i, h in enumerate(headers)]
  sep = "+" + "+".join("-" * (w + 2) for w in widths) + "+"
  def fmt(row):
    return "| " + " | ".join(v.center(w) for v, w in zip(row, widths)) + " |"
  lines = [sep, fmt(headers), sep]
  lines += [fmt(r) for r in cells]
  lines.append(sep)
  return "\n".join(lines)


def load_model_checkpoint(path: str, variables: Any, shg_only: bool = False
                          ) -> tuple[Any, int]:
  """Load either a torch ``.tar`` (converted mechanically) or an orbax
  checkpoint directory into flax ``variables``. Returns (variables, epoch).
  """
  from mode_tpu.utils import torch_convert
  from mode_tpu.utils.checkpoint import load_checkpoint, load_torch_checkpoint

  if os.path.isdir(path):
    payload = load_checkpoint(path)
    epoch = int(payload.get("epoch", 0))
    out = dict(variables)
    out["params"] = jax.tree_util.tree_map(
        lambda old, new: np.asarray(new, dtype=np.asarray(old).dtype),
        variables["params"], payload["params"])
    if "batch_stats" in payload and payload["batch_stats"]:
      out["batch_stats"] = jax.tree_util.tree_map(
          lambda old, new: np.asarray(new, dtype=np.asarray(old).dtype),
          variables["batch_stats"], payload["batch_stats"])
    return out, epoch

  obj = load_torch_checkpoint(path)
  epoch = int(obj.get("epoch", 0)) if isinstance(obj, dict) else 0
  if shg_only:
    return torch_convert.convert_shg_only(obj, variables), epoch
  return torch_convert.convert_state_dict(obj, variables), epoch


def count_params(params) -> int:
  return int(sum(np.prod(p.shape)
                 for p in jax.tree_util.tree_leaves(params)))
