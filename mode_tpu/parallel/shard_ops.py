"""SPMD (shard_map) wrappers for the Pallas kernels.

XLA's SPMD partitioner cannot split a Pallas custom call, so under a device
mesh every Pallas fast path must be partitioned *manually*: ``jax.shard_map``
pins the shard layout at the kernel boundary, each device runs the kernel on
its local shard, and any cross-shard dependence is expressed with explicit
ICI collectives. This is the TPU-native analogue of the reference's
"native op composes with DataParallel for free" property
(``/root/reference/models/basic/spherical_conv/src/sphere_conv_cuda.cpp:129-210``
running per-replica under ``train_disparity.py:264-265``):

  * sphere conv — embarrassingly batch-parallel: shard B over 'data',
    replicate the weight; the weight gradient is ``psum``-reduced over the
    mesh (the custom_vjp below), exactly what DataParallel's gradient
    gather does on GPUs;
  * cost-volume conv3d — the volume is sharded (B over 'data', the band
    axis M over 'spatial'); a stride-1 3x3x3 conv needs each shard's ±1 M
    boundary planes, which ``lax.ppermute`` exchanges over ICI before the
    local kernel runs with ``m_halo=True`` (non-circular permutes: edge
    shards receive zeros = the conv's SAME padding);
  * fused regression head — output rows shard over 'spatial'; the
    quarter-res input is tiny (~1.5 MB) and stays replicated, each device
    expanding only its own row window.

Dispatch: the op-level entry points (``ops/sphere_conv.py``,
``models/blocks.py``, ``models/disparity.py``) route here whenever
``parallel.mesh.active_mesh()`` is set; eligibility gates check the mesh
axes divide the sharded dimensions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P


def _spatial_halo_concat(xx, axis: int, n_shards: int):
  """Exchange ±1 boundary planes of ``axis`` with the 'spatial' neighbours
  and concatenate them as halo rows (zeros at the mesh edges)."""
  last = lax.slice_in_dim(xx, xx.shape[axis] - 1, xx.shape[axis], axis=axis)
  first = lax.slice_in_dim(xx, 0, 1, axis=axis)
  # non-circular permutes: shards with no sender receive zeros (SAME pad)
  up = lax.ppermute(last, "spatial",
                    [(i, i + 1) for i in range(n_shards - 1)])
  down = lax.ppermute(first, "spatial",
                      [(i + 1, i) for i in range(n_shards - 1)])
  return jnp.concatenate([up, xx, down], axis=axis)


def conv3d_band_sharded(x: jnp.ndarray, weight: jnp.ndarray,
                        scale: jnp.ndarray | None,
                        bias: jnp.ndarray | None,
                        residual: jnp.ndarray | None,
                        relu: bool, mesh) -> jnp.ndarray:
  """:func:`~mode_tpu.ops.pallas.conv3d_kernel.conv3d_band_pallas` over a
  ('data', 'spatial') mesh: B sharded over 'data', the band axis M over
  'spatial' with a 1-plane ICI halo exchange. Eval/serving only (no vjp)."""
  from mode_tpu.ops.pallas.conv3d_kernel import conv3d_band_pallas

  sp = mesh.shape.get("spatial", 1)
  has_sb = scale is not None
  has_res = residual is not None
  cout = weight.shape[-1]
  sc = scale if has_sb else jnp.zeros((cout,), jnp.float32)
  bb = bias if bias is not None else jnp.zeros((cout,), jnp.float32)
  rr = (residual if has_res
        else jnp.zeros((1, 1, 1, cout, x.shape[-1]), x.dtype))

  def body(xx, ww, sc_, bb_, rr_):
    xh = _spatial_halo_concat(xx, axis=2, n_shards=sp)
    return conv3d_band_pallas(xh, ww,
                              sc_ if has_sb else None,
                              bb_ if bias is not None else None,
                              rr_ if has_res else None,
                              relu=relu, m_halo=True)

  shard = P("data", None, "spatial", None, None)
  return jax.shard_map(
      body, mesh=mesh,
      in_specs=(shard, P(), P(), P(), shard if has_res else P()),
      out_specs=shard, check_vma=False)(x, weight, sc, bb, rr)


def conv3d_band_s2_sharded(x: jnp.ndarray, weight: jnp.ndarray,
                           scale: jnp.ndarray | None,
                           bias: jnp.ndarray | None,
                           relu: bool, mesh) -> jnp.ndarray:
  """:func:`~mode_tpu.ops.pallas.conv3d_kernel.conv3d_band_s2_pallas` over
  a ('data', 'spatial') mesh: B over 'data', the band axis M over 'spatial'.
  Each shard's M range starts on an even global index (gate: M % 2·sp == 0),
  so the stride-2 windows only need the same ±1-plane ICI halo exchange as
  the stride-1 conv; the output stays 'spatial'-sharded at M//2 per shard."""
  from mode_tpu.ops.pallas.conv3d_kernel import conv3d_band_s2_pallas

  sp = mesh.shape.get("spatial", 1)
  has_sb = scale is not None
  cout = weight.shape[-1]
  sc = scale if has_sb else jnp.zeros((cout,), jnp.float32)
  bb = bias if bias is not None else jnp.zeros((cout,), jnp.float32)

  def body(xx, ww, sc_, bb_):
    xh = _spatial_halo_concat(xx, axis=2, n_shards=sp)
    return conv3d_band_s2_pallas(xh, ww,
                                 sc_ if has_sb else None,
                                 bb_ if bias is not None else None,
                                 relu=relu, m_halo=True)

  shard = P("data", None, "spatial", None, None)
  return jax.shard_map(
      body, mesh=mesh,
      in_specs=(shard, P(), P(), P()),
      out_specs=shard, check_vma=False)(x, weight, sc, bb)


def conv3d_band_deconv_sharded(x: jnp.ndarray, kernel_t: jnp.ndarray,
                               scale: jnp.ndarray | None,
                               bias: jnp.ndarray | None,
                               relu: bool, lane_axis: int, mesh):
  """:func:`~mode_tpu.ops.pallas.conv3d_kernel.conv3d_band_deconv_pallas`
  over a ('data', 'spatial') mesh: B over 'data', the band axis M over
  'spatial'. A k3/s2/p1/op1 transpose conv only reads its own rows plus ONE
  row to the right, so the same ±1 halo exchange covers it (the left halo
  row is ignored by the kernel); the doubled output rows stay sharded."""
  from mode_tpu.ops.pallas.conv3d_kernel import conv3d_band_deconv_pallas

  sp = mesh.shape.get("spatial", 1)
  has_sb = scale is not None
  cout = kernel_t.shape[3]
  sc = scale if has_sb else jnp.zeros((cout,), jnp.float32)
  bb = bias if bias is not None else jnp.zeros((cout,), jnp.float32)

  def body(xx, ww, sc_, bb_):
    xh = _spatial_halo_concat(xx, axis=2, n_shards=sp)
    return conv3d_band_deconv_pallas(xh, ww,
                                     sc_ if has_sb else None,
                                     bb_ if bias is not None else None,
                                     relu=relu, lane_axis=lane_axis,
                                     m_halo=True)

  shard = P("data", None, "spatial", None, None)
  return jax.shard_map(
      body, mesh=mesh,
      in_specs=(shard, P(), P(), P()),
      out_specs=shard, check_vma=False)(x, kernel_t, sc, bb)


def conv2d_band_sharded(x: jnp.ndarray, weight: jnp.ndarray,
                        scale: jnp.ndarray | None,
                        bias: jnp.ndarray | None,
                        residual: jnp.ndarray | None,
                        relu: bool, mesh) -> jnp.ndarray:
  """:func:`~mode_tpu.ops.pallas.conv2d_kernel.conv2d_band_pallas` over a
  ('data', 'spatial') mesh: B sharded over 'data', the band axis M over
  'spatial' with the same ±1-row ICI halo exchange as the 3-D wrappers
  (lane-major (B, M, C, L) input). Eval/serving only (no vjp)."""
  from mode_tpu.ops.pallas.conv2d_kernel import conv2d_band_pallas

  sp = mesh.shape.get("spatial", 1)
  has_sb = scale is not None
  has_res = residual is not None
  cout = weight.shape[-1]
  sc = scale if has_sb else jnp.zeros((cout,), jnp.float32)
  bb = bias if bias is not None else jnp.zeros((cout,), jnp.float32)
  rr = (residual if has_res
        else jnp.zeros((1, 1, cout, x.shape[-1]), x.dtype))

  def body(xx, ww, sc_, bb_, rr_):
    xh = _spatial_halo_concat(xx, axis=1, n_shards=sp)
    return conv2d_band_pallas(xh, ww,
                              sc_ if has_sb else None,
                              bb_ if bias is not None else None,
                              rr_ if has_res else None,
                              relu=relu, m_halo=True)

  shard = P("data", "spatial", None, None)
  return jax.shard_map(
      body, mesh=mesh,
      in_specs=(shard, P(), P(), P(), shard if has_res else P()),
      out_specs=shard, check_vma=False)(x, weight, sc, bb, rr)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def sphere_conv_fast_sharded(x, weight, static, mesh):
  """Pallas sphere conv under a mesh: B sharded over 'data', weight
  replicated; dweight is psum-reduced (DataParallel-gradient semantics)."""
  return _sphere_fwd_impl(x, weight, static, mesh)


def _sphere_fwd_impl(x, weight, static, mesh):
  from mode_tpu.ops.pallas import sphere_conv_kernel as sck
  fn = (sck.sphere_conv_erp_pallas if static[0] == "ERP"
        else sck.sphere_conv_cassini_pallas)
  return jax.shard_map(
      lambda xx, ww: fn(xx, ww), mesh=mesh,
      in_specs=(P("data"), P()), out_specs=P("data"),
      check_vma=False)(x, weight)


def _sphere_fwd(x, weight, static, mesh):
  return _sphere_fwd_impl(x, weight, static, mesh), (x, weight)


def _sphere_bwd(static, mesh, res, g):
  import importlib
  sc = importlib.import_module("mode_tpu.ops.sphere_conv")
  from mode_tpu.ops.pallas import sphere_conv_kernel as sck
  x, weight = res
  sphere_type, stride, pad, dilation, precision = static

  def body(xx, ww, gg):
    if sc.pallas_backward_enabled() and sphere_type == "Cassini":
      dx, dw = sck.sphere_conv_cassini_pallas_bwd(xx, ww, gg)
    elif sc.pallas_backward_enabled() and sphere_type == "ERP":
      dx, dw = sck.sphere_conv_erp_pallas_bwd(xx, ww, gg)
    else:
      _, vjp = jax.vjp(
          lambda a, b: sc.sphere_conv_xla(
              a, b, sphere_type=sphere_type, stride=stride, pad=pad,
              dilation=dilation, precision=precision), xx, ww)
      dx, dw = vjp(gg)
    # weight is replicated across the whole mesh; its cotangent sums over
    # the batch shards (identical across 'spatial', so no psum there)
    return dx, lax.psum(dw, "data")

  return jax.shard_map(
      body, mesh=mesh,
      in_specs=(P("data"), P(), P("data")),
      out_specs=(P("data"), P()), check_vma=False)(x, weight, g)


sphere_conv_fast_sharded.defvjp(_sphere_fwd, _sphere_bwd)


def fused_regression_sharded(cost_q: jnp.ndarray, maxdisp: int, h: int,
                             w: int, mesh):
  """Fused regression head over the mesh: B over 'data', output rows over
  'spatial' (the quarter-res cost is replicated across 'spatial' — ~1.5 MB —
  and each device expands only its own TY-row windows)."""
  from mode_tpu.ops.pallas import regression_kernel as rk

  sp = mesh.shape.get("spatial", 1)
  h_loc = h // sp
  nt_loc = h_loc // rk.TY
  n, d_in, hq, wq = cost_q.shape
  md, mx_t, ys, mh_win, wy = rk._tables(d_in, hq, wq, maxdisp, h, w)
  ys = jnp.asarray(ys)
  mh_win = jnp.asarray(mh_win)

  def body(cq, ys_g, mh_g):
    t0 = lax.axis_index("spatial") * nt_loc
    ys_l = lax.dynamic_slice_in_dim(ys_g, t0, nt_loc)
    mh_l = lax.dynamic_slice_in_dim(mh_g, t0, nt_loc)
    return rk.fused_disparity_regression(cq, maxdisp, h, w, ys=ys_l,
                                         mh_win=mh_l, h_out=h_loc)

  out = P("data", "spatial", None)
  return jax.shard_map(
      body, mesh=mesh, in_specs=(P("data"), P(), P()),
      out_specs=(out, out), check_vma=False)(cost_q, ys, mh_win)
