"""Weight-initialization menu.

Parity target: ``/root/reference/models/initModel.py:9-32`` — the reference
offers kaiming/xavier normal/uniform re-initialization over conv-like
modules (BN reset to 1/0, linear to N(0, 0.01)). Here the menu operates on a
flax variables tree: conv-like leaves are the ``kernel``/``kernel_t`` params
(*K, I, O); fan_in/fan_out follow torch's conventions
(fan_in = I·prod(K), fan_out = O·prod(K)); leaky-ReLU gain with
a=0.01**0.5? — torch's ``kaiming_*(nonlinearity='leaky_relu')`` uses the
default negative_slope 0.01, gain = sqrt(2 / (1 + 0.01²)).

``loadStackHourglassOnly`` (``initModel.py:35-43``) is implemented in
``mode_tpu.utils.torch_convert.convert_shg_only``.
"""

from __future__ import annotations

import math

import jax
import numpy as np

_LEAKY_GAIN = math.sqrt(2.0 / (1.0 + 0.01 ** 2))


def _fans(shape):
  receptive = int(np.prod(shape[:-2])) if len(shape) > 2 else 1
  fan_in = shape[-2] * receptive
  fan_out = shape[-1] * receptive
  return fan_in, fan_out


def init_model_params(variables, init_type: str | None,
                      rng: jax.Array):
  """Re-initialize a variables tree per the reference's init menu.

  init_type ∈ {None, 'default', 'kaiming_normal', 'xavier_normal',
  'kaiming_uniform', 'xavier_uniform', 'normal'}. 'default'/None keeps the
  construction-time init (as the reference does,
  ``train_disparity.py:273-274``).
  """
  if init_type in (None, "default"):
    return variables

  leaves = jax.tree_util.tree_flatten_with_path(variables["params"])[0]
  keys = jax.random.split(rng, len(leaves))
  new = {}
  for (path, leaf), key in zip(leaves, keys):
    name = path[-1].key
    shape = leaf.shape
    if name in ("kernel", "kernel_t") and len(shape) > 2:
      fan_in, fan_out = _fans(shape)
      if init_type == "kaiming_normal":
        std = _LEAKY_GAIN / math.sqrt(fan_in)
        val = jax.random.normal(key, shape) * std
      elif init_type == "kaiming_uniform":
        bound = math.sqrt(3.0) * _LEAKY_GAIN / math.sqrt(fan_in)
        val = jax.random.uniform(key, shape, minval=-bound, maxval=bound)
      elif init_type == "xavier_normal":
        std = math.sqrt(2.0 / (fan_in + fan_out))
        val = jax.random.normal(key, shape) * std
      elif init_type == "xavier_uniform":
        bound = math.sqrt(6.0 / (fan_in + fan_out))
        val = jax.random.uniform(key, shape, minval=-bound, maxval=bound)
      elif init_type == "normal":
        val = jax.random.normal(key, shape)
      else:
        raise ValueError(f"unknown init type {init_type!r}")
      new[tuple(p.key for p in path)] = val.astype(leaf.dtype)
    elif name == "scale":          # BN weight -> 1 (initModel.py:27)
      new[tuple(p.key for p in path)] = jax.numpy.ones_like(leaf)
    elif name == "bias":           # conv/BN bias -> 0 (initModel.py:25,28)
      new[tuple(p.key for p in path)] = jax.numpy.zeros_like(leaf)

  def rebuild(path, leaf):
    return new.get(tuple(p.key for p in path), leaf)

  params = jax.tree_util.tree_map_with_path(rebuild, variables["params"])
  out = dict(variables)
  out["params"] = params
  return out
