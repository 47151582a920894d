#!/usr/bin/env python
"""AOT-compile the full SPMD programs against a described v5e-8 topology.

The virtual-CPU-mesh tests (tests/test_shard_pallas.py, dryrun_multichip)
execute the shard_map partitioning, the ICI halo ppermutes and the psum'd
weight grads for real — but in Pallas *interpret* mode, because CPU cannot
compile Mosaic. This script closes the remaining gap ("would it compile for
a slice?") without needing slice hardware: libtpu is local, so
``jax.experimental.topologies.get_topology_desc`` can stand up a PjRt
v5e-8 (2x4) topology and the real XLA:TPU + Mosaic compilers can lower and
compile the production programs against it:

  1. the full-resolution (1024x512, maxdisp 192, bf16 + remat) sharded
     stage-1 TRAIN step on a ('data','spatial') = (2,4) mesh — the Pallas
     sphere conv fwd+bwd and the strided conv3d custom-VJP kernels compose
     with the mesh via shard_map (parallel/shard_ops.py);
  2. the full-resolution sharded stage-1 EVAL forward (confidence on) —
     lane-major Pallas mid-section, folded/banded kernels, fused
     regression head, all shard_map-partitioned;
  3. the standalone shard_ops kernel wrappers at non-degenerate shard
     extents (the same cases the CPU dryrun runs interpreted).

Writes ONE JSON line per program + a final {"ok": true/false} summary.
Reference anchor: the op-composes-with-DP property of the CUDA extension
(`/root/reference/models/basic/spherical_conv/sphere_conv_cuda.cpp:129-210`
under `train_disparity.py:264-265` DataParallel).

Usage: python scripts/aot_topology_compile.py [--out AOT_COMPILE.json]
"""

import argparse
import json
import os
import sys
import time
import traceback

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mk_mesh():
  import jax
  from jax.experimental import topologies
  from jax.sharding import Mesh

  topo = topologies.get_topology_desc(platform="tpu",
                                      topology_name="v5e:2x4")
  devs = np.array(topo.devices).reshape(2, 4)
  return Mesh(devs, ("data", "spatial"))


def _struct_like(tree, sharding):
  import jax
  shapes = jax.eval_shape(lambda: tree) if callable(tree) else tree
  return jax.tree_util.tree_map(
      lambda s: jax.ShapeDtypeStruct(s.shape, s.dtype, sharding=sharding),
      shapes)


def compile_train(mesh):
  """Full-res sharded train step: B over 'data', cost-volume H over
  'spatial' (training.make_disparity_train_step wires the shardings)."""
  import jax
  import jax.numpy as jnp
  from jax.sharding import NamedSharding, PartitionSpec as P

  from mode_tpu import training
  from mode_tpu.models.disparity import ModeDisparity

  b, h, w, maxdisp = 2, 1024, 512, 192
  model = ModeDisparity(maxdisp=maxdisp, conv="Sphere",
                        sphere_type="Cassini", out_conf=False, remat=True)
  opt = training.make_optimizer()

  dummy = jax.ShapeDtypeStruct((1, h, w, 3), jnp.float32)
  state_shapes = jax.eval_shape(
      lambda: training.init_state(model, opt, jax.random.PRNGKey(0),
                                  jnp.zeros((1, h, w, 3), jnp.float32),
                                  jnp.zeros((1, h, w, 3), jnp.float32),
                                  train=False))
  repl = NamedSharding(mesh, P())
  state = _struct_like(state_shapes, repl)
  bsh = NamedSharding(mesh, P("data", "spatial"))
  left = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32, sharding=bsh)
  right = jax.ShapeDtypeStruct((b, h, w, 3), jnp.float32, sharding=bsh)
  disp = jax.ShapeDtypeStruct((b, h, w), jnp.float32, sharding=bsh)

  from mode_tpu.parallel import mesh as pmesh
  step = training.make_disparity_train_step(model, opt, mesh,
                                            compute_dtype=jnp.bfloat16)
  with mesh, pmesh.activate(mesh):     # tracing happens inside .lower()
    compiled = step.jitted.lower(state, left, right, disp).compile()
  return compiled


def compile_eval(mesh):
  import jax
  import jax.numpy as jnp
  from jax.sharding import NamedSharding, PartitionSpec as P

  from mode_tpu.models.disparity import ModeDisparity

  b, h, w, maxdisp = 2, 1024, 512, 192
  model = ModeDisparity(maxdisp=maxdisp, conv="Sphere",
                        sphere_type="Cassini", out_conf=True)
  variables = jax.eval_shape(
      lambda: model.init(jax.random.PRNGKey(0),
                         jnp.zeros((1, h, w, 3), jnp.bfloat16),
                         jnp.zeros((1, h, w, 3), jnp.bfloat16),
                         train=False))
  repl = NamedSharding(mesh, P())
  variables = _struct_like(variables, repl)
  bsh = NamedSharding(mesh, P("data"))
  left = jax.ShapeDtypeStruct((b, h, w, 3), jnp.bfloat16, sharding=bsh)
  right = jax.ShapeDtypeStruct((b, h, w, 3), jnp.bfloat16, sharding=bsh)

  from mode_tpu.parallel import mesh as pmesh

  def fwd(variables, left, right):
    return model.apply(variables, left, right, train=False)

  with mesh, pmesh.activate(mesh):     # route dispatch to shard_ops
    compiled = jax.jit(fwd).lower(variables, left, right).compile()
  return compiled


def compile_shard_ops(mesh):
  """The standalone shard_map kernel wrappers at the dryrun's shapes."""
  import jax
  import jax.numpy as jnp
  from jax.sharding import NamedSharding, PartitionSpec as P

  from mode_tpu.parallel import shard_ops

  from mode_tpu.parallel import mesh as pmesh

  dp, sp = 2, 4
  b, d, m, c, lanes, cout = dp, 4, 8 * sp, 8, 128, 8
  x = jax.ShapeDtypeStruct((b, d, m, c, lanes), jnp.float32,
                           sharding=NamedSharding(mesh, P("data", None,
                                                          "spatial")))
  w = jax.ShapeDtypeStruct((3, 3, 3, c, cout), jnp.float32,
                           sharding=NamedSharding(mesh, P()))

  def f(x, w):
    with mesh:
      return shard_ops.conv3d_band_sharded(x, w, None, None, None, True,
                                           mesh)

  c1 = jax.jit(f).lower(x, w).compile()

  xs = jax.ShapeDtypeStruct((dp, 128, 64, 8), jnp.float32,
                            sharding=NamedSharding(mesh, P("data")))
  ws = jax.ShapeDtypeStruct((3, 3, 8, 8), jnp.float32,
                            sharding=NamedSharding(mesh, P()))
  static = ("Cassini", 1, 1, 1, None)

  def g(xs, ws):
    with mesh:
      return shard_ops.sphere_conv_fast_sharded(xs, ws, static, mesh)

  c2 = jax.jit(g).lower(xs, ws).compile()
  return c1, c2


def main():
  ap = argparse.ArgumentParser()
  ap.add_argument("--out", default=None)
  ap.add_argument("--skip", nargs="*", default=[],
                  choices=["train", "eval", "shard_ops"])
  args = ap.parse_args()

  results = {"topology": "v5e:2x4", "programs": {}, "ok": True}
  mesh = _mk_mesh()
  legs = [("shard_ops", compile_shard_ops), ("eval", compile_eval),
          ("train", compile_train)]
  for name, fn in legs:
    if name in args.skip:
      continue
    t0 = time.time()
    rec = {"ok": False}
    try:
      out = fn(mesh)
      compiled = out[0] if isinstance(out, tuple) else out
      rec["ok"] = True
      try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
          cost = cost[0]
        rec["xla_visible_tflops"] = round(float(cost["flops"]) / 1e12, 3)
      except Exception:
        pass
      try:
        mem = compiled.memory_analysis()
        rec["hbm_bytes_per_chip"] = int(
            mem.temp_size_in_bytes + mem.argument_size_in_bytes +
            mem.output_size_in_bytes)
      except Exception:
        pass
    except Exception:
      results["ok"] = False
      rec["error"] = traceback.format_exc()[-2000:]
    rec["compile_s"] = round(time.time() - t0, 1)
    results["programs"][name] = rec
    print(json.dumps({name: rec}), flush=True)

  print(json.dumps({"ok": results["ok"]}))
  if args.out:
    with open(args.out, "w") as f:
      json.dump(results, f, indent=1)
  return 0 if results["ok"] else 1


if __name__ == "__main__":
  sys.exit(main())
