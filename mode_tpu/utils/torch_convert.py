"""PyTorch checkpoint → flax variables converter.

The released MODE checkpoints (``/root/reference/README.md:104-111``) are
torch ``state_dict``s, possibly wrapped in ``{'epoch', 'state_dict',
'train_loss'}`` (``train_disparity.py:91-94``) and carrying ``module.``
prefixes from DataParallel (``test_disparity.py:160-166``).

Because every flax child in this framework is named with its torch
state_dict path segment (see ``models/blocks.py``), conversion is mechanical:

  * flax leaf path joined with '.' == torch key prefix;
  * leaf name maps: kernel/kernel_t → weight, scale → weight (BN),
    bias → bias, mean → running_mean, var → running_var;
  * conv-like tensors (ndim ≥ 3) permute torch (A, B, *K) → (*K, B, A),
    which simultaneously handles Conv (O,I,*K)→(*K,I,O) and ConvTranspose
    (I,O,*K)→(*K,O,I) given our ``kernel_t`` storage layout.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import numpy as np

_LEAF_TO_TORCH = {
    "kernel": "weight",
    "kernel_t": "weight",
    "scale": "weight",
    "bias": "bias",
    "mean": "running_mean",
    "var": "running_var",
}


def _to_numpy(t) -> np.ndarray:
  if hasattr(t, "detach"):
    return t.detach().cpu().numpy()
  return np.asarray(t)


def strip_module_prefix(state: Mapping[str, Any]) -> dict[str, Any]:
  """Remove DataParallel's ``module.`` prefixes."""
  return {(k[len("module."):] if k.startswith("module.") else k): v
          for k, v in state.items()}


def unwrap_checkpoint(obj: Mapping[str, Any]) -> dict[str, Any]:
  """Accept either a raw state_dict or the training-checkpoint wrapper."""
  if "state_dict" in obj and not any(k.endswith("weight") for k in obj):
    obj = obj["state_dict"]
  return strip_module_prefix(obj)


def _permute(arr: np.ndarray) -> np.ndarray:
  if arr.ndim >= 3:
    perm = tuple(range(2, arr.ndim)) + (1, 0)
    return np.ascontiguousarray(arr.transpose(perm))
  return arr


def convert_state_dict(torch_state: Mapping[str, Any], variables: Any,
                       strict: bool = True) -> Any:
  """Fill flax ``variables`` (as from ``model.init``) from a torch
  state_dict. Returns a new variables pytree.

  With ``strict``, every flax leaf must be found in the torch dict; torch
  keys that map to nothing (dead params like the fusion BasicBlock's unused
  ``downsample``, or ``num_batches_tracked``) are reported but tolerated.
  """
  state = {k: _to_numpy(v) for k, v in unwrap_checkpoint(torch_state).items()}
  used: set[str] = set()
  flat = jax.tree_util.tree_flatten_with_path(variables)[0]

  new_leaves = {}
  missing = []
  for path, leaf in flat:
    keys = [p.key for p in path]
    # keys[0] is the collection ('params' / 'batch_stats')
    torch_key = ".".join(keys[1:-1]) + "." + _LEAF_TO_TORCH[keys[-1]]
    if torch_key not in state:
      missing.append(torch_key)
      continue
    src = _permute(state[torch_key])
    if src.shape != leaf.shape:
      raise ValueError(f"shape mismatch for {torch_key}: torch {src.shape} "
                       f"vs flax {leaf.shape} at {keys}")
    used.add(torch_key)
    new_leaves[tuple(keys)] = src.astype(np.asarray(leaf).dtype)

  if missing and strict:
    raise KeyError(f"{len(missing)} flax leaves missing from torch "
                   f"checkpoint, e.g. {missing[:5]}")

  def rebuild(path, leaf):
    keys = tuple(p.key for p in path)
    return new_leaves.get(keys, leaf)

  out = jax.tree_util.tree_map_with_path(rebuild, variables)
  unused = [k for k in state
            if k not in used and not k.endswith("num_batches_tracked")]
  if unused:
    print(f"[torch_convert] {len(unused)} torch keys unused "
          f"(dead/unmapped params), e.g. {unused[:4]}")
  return out


def filter_stack_hourglass_only(torch_state: Mapping[str, Any]
                                ) -> dict[str, Any]:
  """The reference's partial-load protocol ``loadStackHourglassOnly``
  (``initModel.py:35-43``): drop feature-extraction (and forfilter1) keys so
  only the 3-D regularization stack is loaded from a PSMNet-pretrained
  checkpoint."""
  state = unwrap_checkpoint(torch_state)
  return {k: v for k, v in state.items()
          if "feature_extraction" not in k and "forfilter1" not in k}


def convert_shg_only(torch_state: Mapping[str, Any], variables: Any) -> Any:
  """Partial conversion: stacked-hourglass weights only, feature extraction
  keeps its fresh initialization."""
  return convert_state_dict(filter_stack_hourglass_only(torch_state),
                            variables, strict=False)
