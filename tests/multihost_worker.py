"""Worker process for the multi-host (DCN) smoke test.

Usage: python multihost_worker.py <coordinator> <num_processes> <process_id>

Each process owns 2 virtual CPU devices; together they form a (data=2,
spatial=2) global mesh. The worker assembles its local shard of the global
batch with ``global_batch_from_local`` and runs ONE real stage-1 train step
(tiny shapes), printing the (globally identical) loss.
"""

import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 2)


def main():
  coordinator, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])

  import numpy as np

  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity
  from mode_tpu.parallel.mesh import (
      global_batch_from_local,
      initialize_distributed,
      make_mesh,
  )

  initialize_distributed(coordinator, nproc, pid)
  assert jax.process_count() == nproc, jax.process_count()
  assert jax.device_count() == 2 * nproc, jax.device_count()

  mesh = make_mesh(data=2, spatial=2)

  h, w, maxdisp = 64, 32, 16
  model = ModeDisparity(maxdisp=maxdisp, conv="Sphere",
                        sphere_type="Cassini", out_conf=False)
  optimizer = training.make_optimizer()
  dummy = np.zeros((1, h, w, 3), np.float32)
  state = training.init_state(model, optimizer, jax.random.PRNGKey(0),
                              dummy, dummy, train=False)
  # replicate the state as host arrays (identical on every process)
  state = jax.tree_util.tree_map(np.asarray, state)

  step = training.make_disparity_train_step(model, optimizer, mesh)

  # global batch of 2: each process contributes its own single example
  rng = np.random.default_rng(100 + pid)
  local = {
      "left": rng.normal(size=(1, h, w, 3)).astype(np.float32),
      "right": rng.normal(size=(1, h, w, 3)).astype(np.float32),
      "disp": rng.uniform(0.5, maxdisp - 1,
                          size=(1, h, w)).astype(np.float32),
  }
  with mesh:
    batch = {k: global_batch_from_local(mesh, v) for k, v in local.items()}
  state, loss = step(state, batch["left"], batch["right"], batch["disp"])
  print(f"MULTIHOST_LOSS {pid} {float(loss):.6f}", flush=True)


if __name__ == "__main__":
  main()
