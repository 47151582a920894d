"""Device mesh construction and SPMD sharding policy.

The reference's entire parallelism story is single-process
``torch.nn.DataParallel`` (``/root/reference/train_disparity.py:264-265``
etc.). The TPU-native replacement is SPMD over a ``jax.sharding.Mesh``:

  * axis ``"data"`` — batch (data parallelism): gradients are all-reduced
    over ICI by XLA, replacing DataParallel's scatter/gather;
  * axis ``"spatial"`` — the panorama height axis of feature maps and of the
    (B, D, H, W, C) cost volume (the workload's natural model/context-
    parallel axis): XLA inserts halo exchanges for the 3-D convolutions on
    the sharded H dimension, so a single annotation scales the dominant
    compute and memory term across chips.

Multi-host: ``initialize_distributed`` wires DCN via ``jax.distributed``;
batches are assembled from process-local shards with
``jax.make_array_from_process_local_data``.
"""

from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
import numpy as np
from jax.experimental import mesh_utils
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_state = threading.local()


def make_mesh(data: Optional[int] = None, spatial: int = 1,
              devices=None) -> Mesh:
  """Create a ('data', 'spatial') mesh. ``data=None`` uses all remaining
  devices."""
  devices = devices if devices is not None else jax.devices()
  n = len(devices)
  if data is None:
    assert n % spatial == 0, (n, spatial)
    data = n // spatial
  assert data * spatial <= n
  dev = mesh_utils.create_device_mesh((data, spatial),
                                      devices=devices[:data * spatial])
  return Mesh(dev, axis_names=("data", "spatial"))


def batch_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
  """Shard the leading (batch) dim over 'data', replicate the rest."""
  return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
  return NamedSharding(mesh, P())


@contextlib.contextmanager
def activate(mesh: Optional[Mesh]):
  """Make ``mesh`` visible to in-model sharding annotations
  (:func:`constrain_spatial`). No-op when ``mesh`` is None."""
  prev = getattr(_state, "mesh", None)
  _state.mesh = mesh
  try:
    yield
  finally:
    _state.mesh = prev


def active_mesh() -> Optional[Mesh]:
  return getattr(_state, "mesh", None)


def constrain_spatial(x, h_axis: int):
  """Constrain axis ``h_axis`` of ``x`` to the 'spatial' mesh axis and the
  leading axis to 'data'. No-op without an active mesh (single-chip)."""
  mesh = active_mesh()
  if mesh is None or np.prod(mesh.devices.shape) == 1:
    return x
  spec = [None] * x.ndim
  spec[0] = "data"
  spec[h_axis] = "spatial"
  return jax.lax.with_sharding_constraint(
      x, NamedSharding(mesh, P(*spec)))


def initialize_distributed(coordinator: str | None = None,
                           num_processes: int | None = None,
                           process_id: int | None = None):
  """Multi-host (DCN) bring-up; on a single host this is a no-op."""
  if num_processes and num_processes > 1:
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)


def global_batch_from_local(mesh: Mesh, local_batch: np.ndarray):
  """Assemble a mesh-global batch from this process's shard (multi-host DP)."""
  sharding = batch_sharding(mesh, local_batch.ndim)
  return jax.make_array_from_process_local_data(sharding, local_batch)
