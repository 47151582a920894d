"""mode_tpu — TPU-native framework for MODE: Multi-view Omnidirectional Depth
Estimation with 360° cameras (ECCV 2022).

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
implementation (nju-ee/MODE-2022): omnidirectional stereo matching on
Cassini-projection panoramas (stage 1), spherical-geometry re-projection, and
multi-view depth fusion (stage 2) — built TPU-first:

- arrays are NHWC / NDHWC (channel-minor: maps onto TPU lanes),
- the spherical convolution is a static-position bilinear gather + MXU GEMM
  (with a Pallas fast path) instead of a CUDA im2col kernel,
- the z-buffer re-projection scatter is a deterministic two-pass scatter-min
  instead of a serial numba loop,
- parallelism is SPMD over a `jax.sharding.Mesh` (data + spatial axes) with
  XLA-inserted collectives instead of torch DataParallel.
"""

__version__ = "0.1.0"
