"""Test config: force the XLA CPU backend with 8 virtual devices so the
multi-chip SPMD paths (mesh sharding, collectives) are exercised without TPU
hardware.

Note: env vars don't work here — the machine's ``sitecustomize`` imports jax
and registers the axon TPU backend before pytest starts, so we must override
through ``jax.config`` (which takes effect at first backend use)."""

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import numpy as np
import pytest


def pytest_collection_modifyitems(config, items):
  """Run the multihost test FIRST: its two subprocess workers each compile a
  train step, and sharing the host with the rest of the suite has tripped
  the DCN coordinator's internal handshake timeouts (round-2 flake)."""
  items.sort(key=lambda it: 0 if "test_multihost" in it.nodeid else 1)


@pytest.fixture
def rng():
  return np.random.default_rng(0)


@pytest.fixture(autouse=True)
def _assert_cpu():
  assert jax.devices()[0].platform == "cpu"
