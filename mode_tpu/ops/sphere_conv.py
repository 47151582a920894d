"""Spherical convolution (SphereNet/Coors-style gnomonic sampling) for TPU.

The reference implements this op as a CUDA im2col kernel with precomputed
fractional sampling positions (``/root/reference/models/basic/spherical_conv/
src/sphere_conv_cuda_kernel.cu``) wrapped in a torch autograd Function
(``sphere_conv.py:16-114``). Here the op is re-designed for XLA/TPU:

  * the position grid is identical math (:func:`gen_sphere_positions`,
    parity target ``sphere_conv.py:180-237``) and is *static* — computed once
    in numpy per (shape, kernel, projection) and cached;
  * the fractional bilinear gather is decomposed at trace time into 4
    integer-corner gathers with static indices/weights
    (:func:`build_gather_tables`) — the CUDA kernel's semantics (zero
    contribution outside the image, no longitude wrap at the gather level;
    wrap is baked into the position grid) fall out of plain zero-padded
    bilinear interpolation, which the tests pin against a numpy oracle;
  * the per-pixel K·C column tensor feeds one big MXU GEMM against the
    flattened weights — conv-as-matmul, batched over N·H·W.

Autodiff: the gather/GEMM formulation is differentiable by construction
(gather transposes to a deterministic scatter-add — no CUDA ``atomicAdd``
nondeterminism, cf. ``sphere_conv_cuda_kernel.cu:349``). Positions get no
gradient, same as the reference (``sphere_conv.py:90``).
"""

from __future__ import annotations

import functools
from typing import Literal

import jax
import jax.numpy as jnp
import numpy as np

SphereType = Literal["ERP", "Cassini"]


@functools.lru_cache(maxsize=64)
def gen_sphere_positions(in_height: int, in_width: int, kh: int, kw: int,
                         sphere_type: str = "Cassini") -> np.ndarray:
  """Fractional sampling positions for every input pixel and kernel tap.

  Returns ``(Kh*Kw, H, W, 2)`` float32 where ``[k, i, j, 0]`` is the
  fractional *row* and ``[..., 1]`` the fractional *column* coordinate in the
  input image at which tap ``k`` (row-major over the kernel window) samples
  for output pixel ``(i, j)``. ``(H, W)`` is ``(in_height, in_width)`` as the
  image is actually laid out (for Cassini, H = 2W).

  Math is the reference's inverse-gnomonic construction
  (``sphere_conv.py:180-237``) including its quirks: the ``kerY`` divisor
  uses ``delta_lon`` (line 194), the odd-kernel center rho is clamped to
  1e-8, and longitude is wrapped modulo width while latitude is left
  unwrapped (zero contribution past the poles).
  """
  # The gnomonic grid is built on an ERP-shaped (h, w) = (min, max) canvas;
  # Cassini output is the transpose (sphere_conv.py:131-133, 226-236).
  height = min(in_height, in_width)
  width = max(in_height, in_width)
  assert width == 2 * height, "spherical conv expects a 2:1 panorama"

  delta_lat = np.pi / height
  delta_lon = 2 * np.pi / width
  range_x = np.arange(-(kw // 2), kw // 2 + 1)
  if not kw % 2:
    range_x = np.delete(range_x, kw // 2)
  range_y = np.arange(-(kh // 2), kh // 2 + 1)
  if not kh % 2:
    range_y = np.delete(range_y, kh // 2)
  ker_x = np.tan(range_x * delta_lon)
  ker_y = np.tan(range_y * delta_lat) / np.cos(range_y * delta_lon)
  ker_x, ker_y = np.meshgrid(ker_x, ker_y)  # (kh, kw)
  rho = np.sqrt(ker_x**2 + ker_y**2)
  if kh % 2 and kw % 2:
    rho[kh // 2][kw // 2] = 1e-8
  nu = np.arctan(rho)
  cos_nu, sin_nu = np.cos(nu), np.sin(nu)

  lat_range = ((np.arange(0, height) / height) - 0.5) * np.pi
  lon_range = ((np.arange(0, width) / width) - 0.5) * (2 * np.pi)

  # (h, kh, kw): tap latitude per output row
  lat = np.arcsin(
      cos_nu[None] * np.sin(lat_range)[:, None, None] +
      ker_y[None] * sin_nu[None] * np.cos(lat_range)[:, None, None] / rho[None])
  # (h, kh, kw): tap longitude offset per output row
  lon = np.arctan2(
      ker_x[None] * sin_nu[None],
      rho[None] * np.cos(lat_range)[:, None, None] * cos_nu[None] -
      ker_y[None] * np.sin(lat_range)[:, None, None] * sin_nu[None])

  # broadcast over columns: lat is column-independent, lon shifts with column
  lat = np.broadcast_to(lat[:, None], (height, width, kh, kw))
  lon = lon[:, None] + lon_range[None, :, None, None]

  lat_pix = (lat / np.pi + 0.5) * height
  lon_pix = ((lon / (2 * np.pi) + 0.5) * width) % width

  if sphere_type == "ERP":
    rows, cols = lat_pix, lon_pix            # image is (height, width)
  elif sphere_type == "Cassini":
    # image is (width, height): rows follow longitude, columns latitude
    rows = lon_pix.transpose(1, 0, 2, 3)
    cols = lat_pix.transpose(1, 0, 2, 3)
  else:
    raise ValueError(f"unknown sphere_type {sphere_type!r}")

  pos = np.stack([rows, cols], axis=-1)      # (H, W, kh, kw, 2)
  pos = pos.transpose(2, 3, 0, 1, 4).reshape(kh * kw, *rows.shape[:2], 2)
  return np.ascontiguousarray(pos.astype(np.float32))


def positions_reference_layout(pos: np.ndarray) -> np.ndarray:
  """Re-pack ``(K, H, W, 2)`` positions into the reference's CUDA buffer
  layout ``(1, 2*K, H, W)`` (``sphere_conv_cuda.cpp:8``, checked at
  ``:107-112``) — used by parity tests only."""
  k, h, w, _ = pos.shape
  return pos.transpose(0, 3, 1, 2).reshape(1, 2 * k, h, w)


def conv_output_size(size: int, kernel: int, stride: int, pad: int,
                     dilation: int) -> int:
  """Torch conv output-size formula (``sphere_conv.py:112-113``)."""
  return (size + 2 * pad - (dilation * (kernel - 1) + 1)) // stride + 1


@functools.lru_cache(maxsize=64)
def build_gather_tables(in_height: int, in_width: int, kh: int, kw: int,
                        sphere_type: str, stride: int, pad: int,
                        dilation: int) -> tuple[np.ndarray, np.ndarray]:
  """Static bilinear-corner gather tables for the sphere conv.

  Returns ``(idx, wgt)``:
    * ``idx`` int32 ``(4, K, Ho, Wo)`` — flattened ``row*W + col`` input
      indices per corner (clamped in-range),
    * ``wgt`` float32 ``(4, K, Ho, Wo)`` — bilinear weights, zeroed for
      out-of-range corners (the CUDA kernel's zero-padding semantics,
      ``sphere_conv_cuda_kernel.cu:246``).

  The stride is realized by subsampling the dense position grid at
  ``(i*stride, j*stride)`` — exactly the CUDA addressing
  (``sphere_conv_cuda_kernel.cu:221-222``; padding/dilation only affect the
  output-size formula, ``sphere_conv_cuda.cpp:159-162``).
  """
  pos = gen_sphere_positions(in_height, in_width, kh, kw, sphere_type)
  h_out = conv_output_size(in_height, kh, stride, pad, dilation)
  w_out = conv_output_size(in_width, kw, stride, pad, dilation)
  pos = pos[:, ::stride, ::stride][:, :h_out, :w_out]  # (K, Ho, Wo, 2)

  rows = pos[..., 0].astype(np.float64)
  cols = pos[..., 1].astype(np.float64)
  r0 = np.floor(rows)
  c0 = np.floor(cols)
  wr = (rows - r0).astype(np.float32)
  wc = (cols - c0).astype(np.float32)

  idx_list, wgt_list = [], []
  for dr, dc, wgt in ((0, 0, (1 - wr) * (1 - wc)), (0, 1, (1 - wr) * wc),
                      (1, 0, wr * (1 - wc)), (1, 1, wr * wc)):
    rr = r0 + dr
    cc = c0 + dc
    ok = (rr >= 0) & (rr < in_height) & (cc >= 0) & (cc < in_width)
    rr = np.clip(rr, 0, in_height - 1).astype(np.int64)
    cc = np.clip(cc, 0, in_width - 1).astype(np.int64)
    idx_list.append((rr * in_width + cc).astype(np.int32))
    wgt_list.append(np.where(ok, wgt, 0.0).astype(np.float32))
  return np.stack(idx_list), np.stack(wgt_list)


def sphere_im2col(x: jnp.ndarray, idx: jnp.ndarray,
                  wgt: jnp.ndarray) -> jnp.ndarray:
  """Bilinear-gather the sampling columns.

  Args:
    x: ``(N, H, W, C)`` input feature map.
    idx/wgt: tables from :func:`build_gather_tables`, ``(4, K, Ho, Wo)``.
  Returns:
    ``(N, Ho, Wo, K, C)`` gathered columns.
  """
  n, h, w, c = x.shape
  xf = x.reshape(n, h * w, c)
  k, ho, wo = idx.shape[1:]

  def one(xi):
    col = jnp.zeros((k, ho, wo, c), x.dtype)
    for corner in range(4):
      g = jnp.take(xi, idx[corner].reshape(-1), axis=0)
      g = g.reshape(k, ho, wo, c)
      col = col + wgt[corner][..., None].astype(x.dtype) * g
    return col

  col = jax.vmap(one)(xf)                      # (N, K, Ho, Wo, C)
  return col.transpose(0, 2, 3, 1, 4)          # (N, Ho, Wo, K, C)


def sphere_conv_xla(x: jnp.ndarray, weight: jnp.ndarray, *,
                    sphere_type: str = "Cassini", stride: int = 1,
                    pad: int = 1, dilation: int = 1,
                    precision=None) -> jnp.ndarray:
  """Spherical convolution, XLA gather+GEMM path (reference semantics)."""
  _, h, w, cin = x.shape
  kh, kw, wcin, cout = weight.shape
  assert wcin == cin, (wcin, cin)
  idx_np, wgt_np = build_gather_tables(h, w, kh, kw, sphere_type, stride,
                                       pad, dilation)
  idx = jnp.asarray(idx_np)
  wgt = jnp.asarray(wgt_np)
  col = sphere_im2col(x, idx, wgt)             # (N, Ho, Wo, K, Cin)
  wmat = weight.reshape(kh * kw, cin, cout)
  return jnp.einsum("nhwkc,kco->nhwo", col, wmat,
                    preferred_element_type=jnp.float32,
                    precision=precision).astype(x.dtype)


# --- Pallas fast-path dispatch ---------------------------------------------
# "auto": Pallas forward on TPU for the production config (Cassini, stride 1,
# dense, square odd kernel); XLA backward via custom_vjp (gather transpose).
_PALLAS_MODE = "auto"   # "auto" | "on" | "off"


def set_pallas_mode(mode: str):
  """Force ('on'), forbid ('off'), or auto-select ('auto') the Pallas path."""
  global _PALLAS_MODE
  assert mode in ("auto", "on", "off")
  _PALLAS_MODE = mode


def _pallas_eligible(x, kh, kw, sphere_type, stride, pad, dilation) -> bool:
  if _PALLAS_MODE == "off":
    return False
  n, h, w, cin = x.shape
  if (sphere_type not in ("Cassini", "ERP") or stride != 1 or dilation != 1
      or kh != kw or kh % 2 == 0):
    return False
  # (band, lanes) = (W, H) for Cassini, (H, W) for ERP
  if sphere_type == "Cassini":
    band, lanes = w, h
    if h != 2 * w:
      return False
  else:
    band, lanes = h, w
    if w != 2 * h:
      return False
  # the kernel's im2col lane offsets are jj*lanes: Mosaic requires them
  # provably 128-aligned; channels land on 8-row sublane slots; the
  # per-band-index scalar tables live in SMEM (1 MB) — ~252 B/row caps the
  # band around 2048 (full-res 1024x512 Cassini fits comfortably)
  if lanes % 128 != 0 or cin % 8 != 0 or band % 8 != 0 or band > 2048:
    return False
  if conv_output_size(h, kh, stride, pad, dilation) != h:
    return False
  if _PALLAS_MODE == "on":
    return True
  try:
    platform = jax.devices()[0].platform
  except RuntimeError:
    return False
  if platform not in ("tpu", "axon"):
    return False
  # the kernel shrinks its band block to fit VMEM; the (double-buffered)
  # minimum block of a <=64-channel slice is the floor
  itemsize = jnp.dtype(x.dtype).itemsize
  return 2 * h * w * min(cin, 64) * itemsize <= 9 * 2**20


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sphere_conv_fast(x, weight, static):
  from mode_tpu.ops.pallas import sphere_conv_kernel as sck
  if static[0] == "ERP":
    return sck.sphere_conv_erp_pallas(x, weight)
  return sck.sphere_conv_cassini_pallas(x, weight)


def _fast_fwd(x, weight, static):
  return _sphere_conv_fast(x, weight, static), (x, weight)


_PALLAS_BWD = True   # Pallas col2im-transpose backward (vs XLA gather VJP)


def set_pallas_backward(on: bool):
  """Toggle the Pallas backward (XLA gather-transpose VJP when off)."""
  global _PALLAS_BWD
  _PALLAS_BWD = bool(on)


def pallas_backward_enabled() -> bool:
  return _PALLAS_BWD


def _fast_bwd(static, res, g):
  x, weight = res
  sphere_type, stride, pad, dilation, precision = static
  if _PALLAS_BWD and sphere_type == "Cassini":
    from mode_tpu.ops.pallas.sphere_conv_kernel import (
        sphere_conv_cassini_pallas_bwd)
    return sphere_conv_cassini_pallas_bwd(x, weight, g)
  if _PALLAS_BWD and sphere_type == "ERP":
    from mode_tpu.ops.pallas.sphere_conv_kernel import (
        sphere_conv_erp_pallas_bwd)
    return sphere_conv_erp_pallas_bwd(x, weight, g)
  _, vjp = jax.vjp(
      lambda xx, ww: sphere_conv_xla(xx, ww, sphere_type=sphere_type,
                                     stride=stride, pad=pad,
                                     dilation=dilation, precision=precision),
      x, weight)
  return vjp(g)


_sphere_conv_fast.defvjp(_fast_fwd, _fast_bwd)


def sphere_conv(x: jnp.ndarray, weight: jnp.ndarray,
                bias: jnp.ndarray | None, *, sphere_type: str = "Cassini",
                stride: int = 1, pad: int = 1, dilation: int = 1,
                precision=None) -> jnp.ndarray:
  """Spherical convolution (dispatching XLA / Pallas paths).

  Args:
    x: ``(N, H, W, Cin)``.
    weight: ``(Kh, Kw, Cin, Cout)`` (HWIO — flax/lax convention; the torch
      checkpoint converter transposes from OIHW).
  Returns:
    ``(N, Ho, Wo, Cout)``.
  """
  kh, kw = weight.shape[0], weight.shape[1]
  out = None
  if _pallas_eligible(x, kh, kw, sphere_type, stride, pad, dilation):
    static = (sphere_type, stride, pad, dilation, precision)
    from mode_tpu.parallel.mesh import active_mesh
    mesh = active_mesh()
    if mesh is None or mesh.size == 1:
      out = _sphere_conv_fast(x, weight, static)
    elif x.shape[0] % mesh.shape.get("data", 1) == 0:
      # under a mesh the Pallas custom call cannot be auto-partitioned —
      # route through the shard_map wrapper (batch over 'data', psum'd dw)
      from mode_tpu.parallel.shard_ops import sphere_conv_fast_sharded
      out = sphere_conv_fast_sharded(x, weight, static, mesh)
  if out is None:
    out = sphere_conv_xla(x, weight, sphere_type=sphere_type, stride=stride,
                          pad=pad, dilation=dilation, precision=precision)
  if bias is not None:
    out = out + bias
  return out
