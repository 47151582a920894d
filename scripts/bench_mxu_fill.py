#!/usr/bin/env python
"""Attempted isolation of the band kernel's MXU fill overhead — INVALID
as a fill measurement; kept so the next session doesn't repeat it.

Hypothesis: the stride-1 band kernel's (288, 96) @ (96, 128) dots
under-fill the systolic array, so one wider-N dot (same LHS against
several windows side by side) should beat the equivalent N=128 sequence,
motivating a window-fusion kernel restructure (which would cost a 24 KB
VMEM copy per fused pair — adjacent kh-windows overlap).

Result (2026-08-19, v5e): in THIS isolated harness every dot costs
~10-20 us regardless of layout variant — ~50x the dot's actual MXU time —
and the whole bench runs at 0.4-0.9 TF/s, two orders below what the SAME
dots achieve inside the production kernel (30-60 TF/s in-model,
docs/PROFILES.md). The per-dot overhead that dominates here is an
artifact of the isolated single-block grid, so the N-width comparison
says nothing about fill amortization in the real kernel. Conclusion:
window fusion remains unproven either way; the production kernel's dots
already pipeline across rows and the next probe needs to A/B inside the
real kernel, not in a micro harness.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_mxu_fill.py
"""

import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M, K = 288, 96
TOTAL_N = 512 * 16          # per grid step: TOTAL_N/N dots of (M,K)@(K,N)
STEPS = 64                  # grid length (repeats on resident data)


def _kernel(w_ref, x_ref, o_ref, z_ref, *, n):
  # each dot writes its OWN z columns (no dependency chain between dots —
  # exactly the band kernel's structure: dots fill a scratch, the VPU pass
  # reads it afterwards); the final o write is one tiny reduce
  for i in range(TOTAL_N // n):
    z_ref[:, i * n:(i + 1) * n] = jnp.dot(
        w_ref[:], x_ref[:, i * n:(i + 1) * n],
        preferred_element_type=jnp.float32)
  o_ref[0] = z_ref[:, :128] + z_ref[:, TOTAL_N - 128:]


def run(n):
  w = jax.random.normal(jax.random.PRNGKey(0), (M, K), jnp.bfloat16)
  x = jax.random.normal(jax.random.PRNGKey(1), (K, TOTAL_N), jnp.bfloat16)
  f = pl.pallas_call(
      functools.partial(_kernel, n=n),
      grid=(STEPS,),
      in_specs=[pl.BlockSpec((M, K), lambda i: (0, 0)),
                pl.BlockSpec((K, TOTAL_N), lambda i: (0, 0))],
      out_specs=pl.BlockSpec((1, M, 128), lambda i: (0, 0, 0)),
      out_shape=jax.ShapeDtypeStruct((1, M, 128), jnp.float32),
      scratch_shapes=[pltpu.VMEM((M, TOTAL_N), jnp.float32)],
  )
  g = jax.jit(lambda w, x: f(w, x))
  r = g(w, x)
  np.asarray(r)
  t0 = time.time()
  r = g(w, x)
  s = float(np.asarray(r).sum())
  dt = time.time() - t0
  macs = M * K * TOTAL_N * STEPS
  print(json.dumps({"n_per_dot": n, "ms": round(dt * 1e3, 3),
                    "tflops": round(2 * macs / dt / 1e12, 1),
                    "checksum": s}), flush=True)


def main():
  for n in (128, 256, 512):
    run(n)


if __name__ == "__main__":
  main()
