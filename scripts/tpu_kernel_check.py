#!/usr/bin/env python
"""On-chip parity check for the COMPILED Pallas kernels.

Interpret-mode tests (tests/test_pallas_sphere_conv.py etc.) pin kernel math
but never exercise Mosaic lowering — alignment, pltpu.roll semantics, VMEM
budgeting. This script runs the compiled kernels against the XLA reference
paths at production shapes on the real TPU and prints one JSON line per
check plus a final {"ok": true/false} summary. Run it after any kernel
change (part of the verify recipe):

  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_kernel_check.py
"""

import json
import sys

import numpy as np


def _maxdiff(a, b):
  a = np.asarray(a, np.float32)
  b = np.asarray(b, np.float32)
  denom = np.maximum(np.abs(b), 1e-3)
  return float(np.abs(a - b).max()), float((np.abs(a - b) / denom).max())


def main():
  import jax
  import jax.numpy as jnp

  from mode_tpu.ops.pallas.regression_kernel import fused_disparity_regression
  from mode_tpu.ops.pallas.sphere_conv_kernel import (
      sphere_conv_cassini_pallas,
      sphere_conv_cassini_pallas_bwd,
      sphere_conv_erp_pallas,
  )
  from mode_tpu.ops.sphere_conv import build_gather_tables, sphere_im2col
  from mode_tpu.models.disparity import (
      confidence_from_prob,
      disparity_regression,
  )

  # The XLA reference path with the gather tables passed as ARGUMENTS: baked
  # as HLO constants they blow past the axon relay's compile-payload limit
  # (HTTP 413) on the larger configs.
  def xla_ref(x, wgt, idx, tab):
    kh, kw = wgt.shape[0], wgt.shape[1]
    col = sphere_im2col(x, idx, tab)
    wmat = wgt.reshape(kh * kw, wgt.shape[2], wgt.shape[3])
    return jnp.einsum("nhwkc,kco->nhwo", col, wmat,
                      preferred_element_type=jnp.float32,
                      precision=jax.lax.Precision.HIGHEST).astype(x.dtype)

  def xla_ref_vjp(x, wgt, g, idx, tab):
    _, vjp = jax.vjp(lambda a, b: xla_ref(a, b, idx, tab), x, wgt)
    return vjp(g)

  platform = jax.devices()[0].platform
  print(json.dumps({"platform": platform}), flush=True)
  rng = np.random.default_rng(0)
  ok = True
  results = []

  def check(name, got, ref, atol, rtol):
    nonlocal ok
    ad, rd = _maxdiff(got, ref)
    passed = bool(ad <= atol or rd <= rtol)
    ok = ok and passed
    rec = {"check": name, "max_abs": round(ad, 6), "max_rel": round(rd, 6),
           "pass": passed}
    results.append(rec)
    print(json.dumps(rec), flush=True)

  # --- sphere conv forward + backward at production FE shapes -------------
  for cin, cout, dtype, tag in [(32, 64, jnp.float32, "f32"),
                                (128, 128, jnp.bfloat16, "bf16")]:
    h, w = 256, 128           # 1/4-res Cassini feature map
    x = jnp.asarray(rng.normal(size=(2, h, w, cin)), dtype)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, dtype)
    g = jnp.asarray(rng.normal(size=(2, h, w, cout)), dtype)
    idx_np, tab_np = build_gather_tables(h, w, 3, 3, "Cassini", 1, 1, 1)
    idx, tab = jnp.asarray(idx_np), jnp.asarray(tab_np)

    ref = jax.jit(xla_ref)(x.astype(jnp.float32), wgt.astype(jnp.float32),
                           idx, tab)
    got = jax.jit(sphere_conv_cassini_pallas)(x, wgt)
    tol = 1e-4 if dtype == jnp.float32 else 5e-2
    check(f"sphere_fwd_{tag}_c{cin}to{cout}", got, ref, tol, tol)

    dx_ref, dw_ref = jax.jit(xla_ref_vjp)(
        x.astype(jnp.float32), wgt.astype(jnp.float32),
        jnp.asarray(np.asarray(g, np.float32)), idx, tab)
    dx, dw = jax.jit(sphere_conv_cassini_pallas_bwd)(x, wgt, g)
    # dw accumulates N*H*W products: compare relatively
    dtol = 1e-3 if dtype == jnp.float32 else 6e-2
    check(f"sphere_bwd_dx_{tag}", dx, dx_ref, dtol, dtol)
    check(f"sphere_bwd_dw_{tag}", dw, dw_ref,
          float(np.abs(np.asarray(dw_ref)).max()) * dtol, dtol)

  # --- ERP layout + full-resolution Cassini (widened fast path) -----------
  h, w, cin, cout = 256, 512, 32, 64
  x = jnp.asarray(rng.normal(size=(1, h, w, cin)), jnp.float32)
  wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
  idx_np, tab_np = build_gather_tables(h, w, 3, 3, "ERP", 1, 1, 1)
  ref = jax.jit(xla_ref)(x, wgt, jnp.asarray(idx_np), jnp.asarray(tab_np))
  got = jax.jit(sphere_conv_erp_pallas)(x, wgt)
  # 3e-4: the kernel reads shifts from the j=0 table; the ~4e-6 f32
  # position noise across columns scales by the feature magnitude
  check("sphere_fwd_erp_f32_256x512", got, ref, 3e-4, 3e-4)

  # ERP backward (shared transposed kernels, ERP tables) at the 3D60
  # quarter-res feature shape, both dtypes
  from mode_tpu.ops.pallas.sphere_conv_kernel import sphere_conv_erp_pallas_bwd
  for dtype, tag in [(jnp.float32, "f32"), (jnp.bfloat16, "bf16")]:
    xe = x.astype(dtype)
    we = wgt.astype(dtype)
    ge = jnp.asarray(rng.normal(size=(1, h, w, cout)), dtype)
    dx_ref, dw_ref = jax.jit(xla_ref_vjp)(
        x, wgt, jnp.asarray(np.asarray(ge, np.float32)),
        jnp.asarray(idx_np), jnp.asarray(tab_np))
    dx, dw = jax.jit(sphere_conv_erp_pallas_bwd)(xe, we, ge)
    dtol = 1e-3 if dtype == jnp.float32 else 6e-2
    check(f"sphere_bwd_erp_dx_{tag}", dx, dx_ref, dtol, dtol)
    check(f"sphere_bwd_erp_dw_{tag}", dw, dw_ref,
          float(np.abs(np.asarray(dw_ref)).max()) * dtol, dtol)

  h, w, cin, cout = 1024, 512, 16, 16
  x = jnp.asarray(rng.normal(size=(1, h, w, cin)), jnp.float32)
  wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.1, jnp.float32)
  idx_np, tab_np = build_gather_tables(h, w, 3, 3, "Cassini", 1, 1, 1)
  ref = jax.jit(xla_ref)(x, wgt, jnp.asarray(idx_np), jnp.asarray(tab_np))
  got = jax.jit(sphere_conv_cassini_pallas)(x, wgt)
  check("sphere_fwd_cassini_f32_1024x512", got, ref, 3e-4, 3e-4)

  # --- fused regression head at production shape --------------------------
  # PEAKED cost logits (a smooth disparity ridge + mild noise): softmax over
  # 192 NEAR-UNIFORM random logits is chaotically sensitive to 1e-4 noise
  # and would test float chaos, not the kernel
  d4, h4, w4 = 48, 256, 128
  h, w, maxdisp = 1024, 512, 192
  yy, xx = np.meshgrid(np.linspace(0, 1, h4), np.linspace(0, 1, w4),
                       indexing="ij")
  ridge = 4 + 40 * (0.5 + 0.4 * np.sin(2 * np.pi * yy) * np.cos(np.pi * xx))
  dgrid = np.arange(d4)[:, None, None]
  cost_np = (-2.0 * np.abs(dgrid - ridge[None]) +
             0.3 * rng.normal(size=(d4, h4, w4)))
  cost = jnp.asarray(cost_np[None], jnp.float32)

  def ref_head(c):
    from mode_tpu.ops.resize import upsample_trilinear
    up = upsample_trilinear(c[..., None], maxdisp, h, w)[..., 0]
    prob = jax.nn.softmax(up, axis=1)
    pred = disparity_regression(prob, maxdisp)
    conf = confidence_from_prob(prob, pred, maxdisp)
    return pred, conf

  pred_ref, conf_ref = jax.jit(ref_head)(cost)
  pred, conf = jax.jit(
      lambda c: fused_disparity_regression(c, maxdisp, h, w))(cost)
  check("fused_regression_pred", pred, pred_ref, 5e-3, 1e-3)
  # confidence probes prob slices at round(pred)±1: where pred sits within
  # ~1e-2 of an x.5 boundary, a benign 1e-3 pred delta flips the rounding
  # and swaps one slice — exclude those pixels (sub-0.2% of the image)
  frac = np.abs(np.asarray(pred_ref) % 1.0 - 0.5)
  stable = frac > 2e-2
  assert stable.mean() > 0.95, stable.mean()
  check("fused_regression_conf",
        np.asarray(conf)[stable], np.asarray(conf_ref)[stable], 5e-3, 1e-3)

  # --- fused conv3d (cost-volume stack) at production shapes ---------------
  from mode_tpu.ops.pallas.conv3d_kernel import (
      conv3d_band_pallas, from_lane_major, lane_axis_for, to_lane_major,
      weight_lane_major)
  from jax import lax

  def conv3d_xla_ref(x, wgt, scale, bias, residual, relu):
    dn = lax.conv_dimension_numbers(x.shape, wgt.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(
        x, wgt, (1, 1, 1), [(1, 1)] * 3, dimension_numbers=dn,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT)).astype(jnp.float32)
    y = y * scale + bias
    if residual is not None:
      y = y + residual.astype(jnp.float32)
    if relu:
      y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)

  for b, d, hh, ww, cin, cout, dtype, res, tag in [
      (1, 48, 256, 128, 64, 32, jnp.bfloat16, False, "bf16_c64to32_full"),
      (1, 48, 256, 128, 32, 32, jnp.bfloat16, True, "bf16_c32_full_res"),
      (1, 24, 128, 64, 64, 64, jnp.bfloat16, False, "bf16_c64_half"),
      (1, 8, 64, 128, 32, 32, jnp.float32, True, "f32_c32_small"),
      # B>=2 routes to the accumulator kernel (_use_acc_variant) — gate both
      # its residual and plain paths on-chip at train-family shapes
      (2, 24, 128, 64, 32, 32, jnp.bfloat16, True, "bf16_c32_half_b2_res"),
      (2, 24, 128, 64, 64, 64, jnp.bfloat16, False, "bf16_c64_half_b2"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, d, hh, ww, cin)) * 0.3, dtype)
    wgt = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    residual = (jnp.asarray(rng.normal(size=(b, d, hh, ww, cout)) * 0.3,
                            dtype) if res else None)
    la = lane_axis_for(x.shape)
    got = jax.jit(lambda xl, wl, rl: conv3d_band_pallas(
        xl, wl, scale, bias, rl, relu=True))(
            to_lane_major(x, la), weight_lane_major(wgt, la),
            None if residual is None else to_lane_major(residual, la))
    got = from_lane_major(got, la)
    ref = jax.jit(lambda a, b_, r: conv3d_xla_ref(
        a, b_, scale, bias, r, True))(x, wgt, residual)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv3d_{tag}", got, ref, tol, tol)

  # --- stride-2 band conv (hourglass encoder) -------------------------------
  from mode_tpu.ops.pallas.conv3d_kernel import (
      conv3d_band_deconv_pallas, conv3d_band_s2_pallas)

  def s2_xla_ref(x, wgt, scale, bias):
    dn = lax.conv_dimension_numbers(x.shape, wgt.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(
        x, wgt, (2, 2, 2), [(1, 1)] * 3, dimension_numbers=dn,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT)).astype(jnp.float32)
    return jnp.maximum(y * scale + bias, 0.0).astype(x.dtype)

  for b, d, hh, ww, cin, cout, dtype, tag in [
      (1, 48, 256, 128, 32, 64, jnp.bfloat16, "bf16_conv1_full"),
      (1, 8, 32, 128, 32, 32, jnp.float32, "f32_small"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, d, hh, ww, cin)) * 0.3, dtype)
    wgt = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    got = jax.jit(lambda xl, wl: conv3d_band_s2_pallas(
        xl, wl, scale, bias, relu=True))(
            to_lane_major(x, 3), weight_lane_major(wgt, 3))
    got = from_lane_major(got, 3)
    ref = jax.jit(lambda a, b_: s2_xla_ref(a, b_, scale, bias))(x, wgt)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv3d_s2_{tag}", got, ref, tol, tol)

  # --- deconv band kernel (hourglass decoder) -------------------------------
  def deconv_xla_ref(x, kt, scale, bias):
    w_io = jnp.swapaxes(jnp.flip(kt, axis=(0, 1, 2)), -1, -2)
    dn = lax.conv_dimension_numbers(x.shape, w_io.shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))
    y = lax.conv_general_dilated(
        x, w_io, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
        dimension_numbers=dn,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT)).astype(jnp.float32)
    return (y * scale + bias).astype(x.dtype)

  for b, d, hh, ww, cin, cout, dtype, tag in [
      (1, 24, 128, 64, 64, 32, jnp.bfloat16, "bf16_conv6_shape"),
      (1, 4, 128, 16, 16, 16, jnp.float32, "f32_small"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, d, hh, ww, cin)) * 0.3, dtype)
    kt = jnp.asarray(rng.normal(size=(3, 3, 3, cout, cin)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    # lane axis = H (index 2), as the hourglass decoder uses it
    xl = jnp.transpose(x, (0, 1, 3, 4, 2))
    got = jax.jit(lambda a, k: conv3d_band_deconv_pallas(
        a, k, scale, bias, lane_axis=2))(xl, kt)
    got = jnp.transpose(got, (0, 1, 4, 2, 3))
    ref = jax.jit(lambda a, k: deconv_xla_ref(a, k, scale, bias))(x, kt)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv3d_deconv_{tag}", got, ref, tol, tol)

  # --- folded-lane kernels (1/16 hourglass level: conv4 / conv5) -----------
  from mode_tpu.ops.pallas.conv3d_kernel import (conv3d_fold_pallas,
                                                 conv3d_fold_deconv_pallas)

  for b, d, hh, ww, cin, cout, dtype, tag in [
      (6, 12, 64, 32, 64, 64, jnp.bfloat16, "bf16_conv4_prod"),
      (1, 4, 16, 32, 32, 32, jnp.float32, "f32_small"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, d, hh, ww, cin)) * 0.3, dtype)
    wgt = jnp.asarray(rng.normal(size=(3, 3, 3, cin, cout)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    # lane-major with H on the (folded) lanes, W as the fold-major axis
    xl = jnp.transpose(x, (0, 1, 3, 4, 2))
    got = jax.jit(lambda a, w_: conv3d_fold_pallas(
        a, weight_lane_major(w_, 2), scale, bias, relu=True))(xl, wgt)
    got = jnp.transpose(got, (0, 1, 4, 2, 3))
    ref = jax.jit(lambda a, b_: conv3d_xla_ref(
        a, b_, scale, bias, None, True))(x, wgt)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv3d_fold_{tag}", got, ref, tol, tol)

  for b, d, hh, ww, cin, cout, dtype, tag in [
      (6, 12, 64, 32, 64, 64, jnp.bfloat16, "bf16_conv5_prod"),
      (1, 2, 16, 16, 16, 16, jnp.float32, "f32_small"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, d, hh, ww, cin)) * 0.3, dtype)
    kt = jnp.asarray(rng.normal(size=(3, 3, 3, cout, cin)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    xl = jnp.transpose(x, (0, 1, 3, 4, 2))
    got = jax.jit(lambda a, k: conv3d_fold_deconv_pallas(
        a, k, scale, bias, lane_axis=2))(xl, kt)
    got = jnp.transpose(got, (0, 1, 4, 2, 3))
    ref = jax.jit(lambda a, k: deconv_xla_ref(a, k, scale, bias))(x, kt)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv3d_fold_deconv_{tag}", got, ref, tol, tol)

  # --- 2-D lane-major conv (fusion/stem fast path) -------------------------
  from mode_tpu.ops.pallas.conv2d_kernel import conv2d_fused

  def conv2d_xla_ref(x, wgt, scale, bias, residual, relu):
    dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), [(1, 1)] * 2, dimension_numbers=dn,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT)).astype(jnp.float32)
    y = y * scale + bias
    if residual is not None:
      y = y + residual.astype(jnp.float32)
    if relu:
      y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)

  for b, hh, ww, cin, cout, dtype, res, tag in [
      (1, 512, 1024, 32, 32, jnp.bfloat16, True, "bf16_c32_full_res"),
      (1, 256, 512, 64, 64, jnp.bfloat16, False, "bf16_c64_half"),
      (1, 64, 128, 32, 32, jnp.float32, False, "f32_c32_small"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, hh, ww, cin)) * 0.3, dtype)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    residual = (jnp.asarray(rng.normal(size=(b, hh, ww, cout)) * 0.3, dtype)
                if res else None)
    got = jax.jit(lambda a, w_, r: conv2d_fused(
        a, w_, scale, bias, r, relu=True))(x, wgt, residual)
    ref = jax.jit(lambda a, w_, r: conv2d_xla_ref(
        a, w_, scale, bias, r, True))(x, wgt, residual)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv2d_{tag}", got, ref, tol, tol)

  # --- batch-packed 2-D band conv (FE-stage fast path) ----------------------
  from mode_tpu.ops.pallas.conv2d_kernel import conv2d_band_bpack

  def conv2d_xla_dil_ref(x, wgt, scale, bias, residual, relu, dil):
    dn = jax.lax.conv_dimension_numbers(x.shape, wgt.shape,
                                        ("NHWC", "HWIO", "NHWC"))
    y = jax.lax.conv_general_dilated(
        x, wgt, (1, 1), [(dil, dil)] * 2, rhs_dilation=(dil, dil),
        dimension_numbers=dn,
        precision=(jax.lax.Precision.HIGHEST if x.dtype == jnp.float32
                   else jax.lax.Precision.DEFAULT)).astype(jnp.float32)
    y = y * scale + bias
    if residual is not None:
      y = y + residual.astype(jnp.float32)
    if relu:
      y = jnp.maximum(y, 0.0)
    return y.astype(x.dtype)

  for b, hh, ww, cin, cout, g, dil, dtype, res, tag in [
      (6, 512, 256, 32, 64, 2, 1, jnp.bfloat16, False, "bf16_layer1_g2"),
      (6, 256, 128, 64, 64, 3, 1, jnp.bfloat16, True, "bf16_layer2_g3_res"),
      (6, 256, 128, 64, 64, 3, 2, jnp.bfloat16, True, "bf16_layer3_g3_dil2"),
      (6, 128, 128, 32, 32, 2, 2, jnp.float32, False, "f32_g2_dil2"),
  ]:
    x = jnp.asarray(rng.normal(size=(b, hh, ww, cin)) * 0.3, dtype)
    wgt = jnp.asarray(rng.normal(size=(3, 3, cin, cout)) * 0.08, dtype)
    scale = jnp.asarray(rng.normal(size=(cout,)) * 0.2 + 1.0, jnp.float32)
    bias = jnp.asarray(rng.normal(size=(cout,)) * 0.1, jnp.float32)
    residual = (jnp.asarray(rng.normal(size=(b, hh, ww, cout)) * 0.3, dtype)
                if res else None)
    xl = jnp.transpose(x, (0, 1, 3, 2))
    rl = None if residual is None else jnp.transpose(residual, (0, 1, 3, 2))
    got = jax.jit(lambda a, w_, r: conv2d_band_bpack(
        a, w_, scale, bias, r, relu=True, g=g, dilation=dil))(xl, wgt, rl)
    got = jnp.transpose(got, (0, 1, 3, 2))
    ref = jax.jit(lambda a, w_, r: conv2d_xla_dil_ref(
        a, w_, scale, bias, r, True, dil))(x, wgt, residual)
    tol = 1e-4 if dtype == jnp.float32 else 4e-2
    check(f"conv2d_bpack_{tag}", got, ref, tol, tol)

  # --- FE lane-resident stage path (B=6 production geometry) ---------------
  # Layers 1-3 lane-major with batch-packed convs vs the NHWC XLA FE at the
  # same random weights — the composition (stride-2 lane XLA convs of
  # layer2.0, dilated packed convs of layer3, epilogue-fused shortcuts)
  # that the per-kernel checks can't cover. B=6 is the production stage-1
  # batch (6 pairs/frame); the e2e gates below run B=1 where packing is
  # ineligible by design.
  # Trained-mirror weights: random init explodes feature magnitude through
  # the 15 residual blocks (sqrt(2)x per add), which turns benign bf16
  # reduction-order drift into un-gateable absolute error. At the trained
  # point features are O(1.4) and the measured path diff is f32 4.5e-7 /
  # bf16 one ULP (0.0156).
  try:
    from tests.trained_mirror import get_trained_state_dict as _fe_sd
    from mode_tpu.models.disparity import (ModeDisparity,
                                           SphereFeatureExtraction)
    from mode_tpu.ops.pallas import conv3d_kernel as _c3k
    from mode_tpu.utils.torch_convert import convert_state_dict as _fe_conv
    _fe_m = ModeDisparity(maxdisp=192, out_conf=False)
    _fe_tiny = jnp.zeros((1, 64, 32, 3), jnp.float32)
    _fe_v = jax.jit(lambda: _fe_m.init(jax.random.PRNGKey(0), _fe_tiny,
                                       _fe_tiny, train=False))()
    _fe_v = jax.device_put(_fe_conv(_fe_sd(), _fe_v))
    fe = SphereFeatureExtraction(sphere_type="Cassini")
    fe_vars = {"params": _fe_v["params"]["feature_extraction"],
               "batch_stats": _fe_v["batch_stats"]["feature_extraction"]}
    fe_x32 = jnp.asarray(rng.normal(size=(6, 1024, 512, 3)) * 0.5,
                         jnp.float32)
    for fe_dtype, fe_tol, fe_tag in ((jnp.float32, 1e-5, "f32"),
                                     (jnp.bfloat16, 4e-2, "bf16")):
      fx = fe_x32.astype(fe_dtype)
      fv = {"params": jax.tree.map(lambda a: a.astype(fe_dtype)
                                   if a.dtype == jnp.float32 else a,
                                   fe_vars["params"]),
            "batch_stats": fe_vars["batch_stats"]}
      try:
        _c3k.set_conv3d_pallas("off")
        fe_ref = np.asarray(jax.jit(lambda v, a: fe.apply(
            v, a, train=False))(fv, fx))
        _c3k.set_conv3d_pallas("auto")
        fe_lane = np.asarray(jax.jit(lambda v, a: fe.apply(
            v, a, train=False))(fv, fx))
      finally:
        _c3k.set_conv3d_pallas("auto")
      check(f"fe_lane_stage_b6_{fe_tag}", jnp.asarray(fe_lane),
            jnp.asarray(fe_ref), fe_tol, fe_tol)
  except Exception as e:                                  # pragma: no cover
    ok = False
    print(json.dumps({"check": "fe_lane_stage_b6", "pass": False,
                      "error": repr(e)[:200]}), flush=True)

  # --- fusion net lane-major eval path vs NHWC XLA path --------------------
  # Covers the composition the per-kernel checks can't: whole-net lane
  # residency, fused epilogues, lane-major pools/transpose-convs, and the
  # small-lane XLA fallback at the deepest level (models/fusion.py).
  from mode_tpu.models.fusion import ModeFusion
  from mode_tpu.ops.pallas import conv3d_kernel as c3k
  fh, fw = 256, 512
  fkey = jax.random.PRNGKey(7)
  fmodel = ModeFusion(max_depth=1000.0)
  fdep = [jnp.asarray(rng.uniform(1, 900, (1, fh, fw, 1)), jnp.float32)
          for _ in range(6)]
  fcon = [jnp.asarray(rng.uniform(0, 1, (1, fh, fw, 1)), jnp.float32)
          for _ in range(6)]
  frgb = [jnp.asarray(rng.normal(size=(1, fh, fw, 3)), jnp.float32)
          for _ in range(4)]
  fvars = jax.jit(lambda: fmodel.init(fkey, fdep, fcon, frgb,
                                      train=False))()
  try:
    c3k.set_conv3d_pallas("off")
    f_ref = np.asarray(jax.jit(lambda v: fmodel.apply(
        v, fdep, fcon, frgb, train=False))(fvars))
    c3k.set_conv3d_pallas("auto")
    f_lane = np.asarray(jax.jit(lambda v: fmodel.apply(
        v, fdep, fcon, frgb, train=False))(fvars))
  finally:
    c3k.set_conv3d_pallas("auto")
  check("fusion_lane_f32_256x512", jnp.asarray(f_lane), jnp.asarray(f_ref),
        5e-3, 5e-3)

  # --- z-buffer sort resolver vs scatter resolver (bit-exact) --------------
  from mode_tpu.geometry import reprojection as rp
  zb_depth = np.abs(rng.normal(5.0, 10.0, (1024, 512))).astype(np.float32)
  zb_depth[rng.random((1024, 512)) < 0.05] = 0.0
  zb_conf = rng.random((1024, 512)).astype(np.float32)
  zb_args = (0.0, -1.0, 0.0, 0.5 * np.pi, 0.0, 0.0)
  try:
    rp.set_zbuffer_impl("scatter")
    v0, c0 = jax.jit(lambda d, c: rp.depth_view_transform_with_conf(
        d, c, *zb_args))(jnp.asarray(zb_depth), jnp.asarray(zb_conf))
    v0, c0 = np.asarray(v0), np.asarray(c0)
    rp.set_zbuffer_impl("sort")
    v1, c1 = jax.jit(lambda d, c: rp.depth_view_transform_with_conf(
        d, c, *zb_args))(jnp.asarray(zb_depth), jnp.asarray(zb_conf))
    v1, c1 = np.asarray(v1), np.asarray(c1)
  finally:
    rp.set_zbuffer_impl("sort")
  zb_pass = bool(np.array_equal(v0, v1) and np.array_equal(c0, c1))
  ok = ok and zb_pass
  rec = {"check": "zbuffer_sort_bit_exact_1024x512",
         "max_abs": float(np.abs(v0 - v1).max()), "pass": zb_pass}
  results.append(rec)
  print(json.dumps(rec), flush=True)

  # --- batched K-pair z-buffer vs per-pair (bit-exact on-chip) -------------
  # Guards depth_view_transforms_batched's unrolled rotation against any
  # XLA rewrite into an MXU dot (bf16 default precision would corrupt the
  # target indices): the batched path must reproduce the per-pair path
  # bit-for-bit on the chip.
  zb_depth3 = np.abs(rng.normal(5.0, 10.0, (3, 1024, 512))).astype(np.float32)
  zb_depth3[rng.random((3, 1024, 512)) < 0.05] = 0.0
  zb_conf3 = rng.random((3, 1024, 512)).astype(np.float32)
  zb_transforms = ((0.0, -1.0, 0.0, 0.5 * np.pi, 0.0, 0.0),
                   (0.0, 0.0, -1.0, 0.0, 0.0, 0.0),
                   (1.0, 0.0, 0.0, 0.25 * np.pi, 0.0, 0.0))
  vb, cb = jax.jit(lambda d, c: rp.depth_view_transforms_batched(
      d, c, zb_transforms))(jnp.asarray(zb_depth3), jnp.asarray(zb_conf3))
  vb, cb = np.asarray(vb), np.asarray(cb)
  vs, cs = [], []
  for k in range(3):
    vk, ck = jax.jit(lambda d, c, a=zb_transforms[k]:
                     rp.depth_view_transform_with_conf(d, c, *a))(
                         jnp.asarray(zb_depth3[k]), jnp.asarray(zb_conf3[k]))
    vs.append(np.asarray(vk))
    cs.append(np.asarray(ck))
  vs, cs = np.stack(vs), np.stack(cs)
  zbb_pass = bool(np.array_equal(vb, vs) and np.array_equal(cb, cs))
  ok = ok and zbb_pass
  rec = {"check": "zbuffer_batched_bit_exact_1024x512",
         "max_abs": float(np.abs(vb - vs).max()), "pass": zbb_pass}
  results.append(rec)
  print(json.dumps(rec), flush=True)

  # --- end-to-end bf16 production-path drift gate --------------------------
  # Trained-ish weights (committed artifact, tests/trained_mirror.py) at the
  # full production resolution: the bf16 conv path (bench.py's pipeline
  # configuration) must stay within 0.02 px disparity MAE of the f32 path.
  # Random weights can't gate this (softmax chaos); these weights hold a
  # collapsed, stable softmax, so the MAE measures real kernel/precision
  # drift. Enforces the README's measured-drift claim every round.
  try:
    from tests.trained_mirror import get_trained_state_dict
    from mode_tpu.models.disparity import ModeDisparity
    from mode_tpu.utils.torch_convert import convert_state_dict
    from mode_tpu.training import cast_conv_params

    h, w, maxdisp = 1024, 512, 192
    jmodel = ModeDisparity(maxdisp=maxdisp, out_conf=False)
    tiny = jnp.zeros((1, 64, 32, 3), jnp.float32)
    variables = jax.jit(
        lambda: jmodel.init(jax.random.PRNGKey(0), tiny, tiny, train=False))()
    variables = jax.device_put(
        convert_state_dict(get_trained_state_dict(), variables))

    # synthetic stereo frame with real matching structure (right = left
    # shifted by 16 px), detail at the quarter-res feature scale
    fine = rng.normal(size=(1, h // 2, w // 2, 3)).astype(np.float32)
    left_np = np.kron(fine, np.ones((1, 2, 2, 1), np.float32))
    right_np = np.roll(left_np, -16, axis=2)
    left, right = jnp.asarray(left_np), jnp.asarray(right_np)

    @jax.jit
    def run_f32(v, l, r):
      return jmodel.apply(v, l, r, train=False)

    @jax.jit
    def run_bf16(v, l, r):
      v16 = {"params": cast_conv_params(v["params"], jnp.bfloat16),
             "batch_stats": v["batch_stats"]}
      return jmodel.apply(v16, l.astype(jnp.bfloat16),
                          r.astype(jnp.bfloat16), train=False)

    pred32 = np.asarray(run_f32(variables, left, right))
    pred16 = np.asarray(run_bf16(variables, left, right))
    drift_mae = float(np.abs(pred16 - pred32).mean())
    drift_p99 = float(np.quantile(np.abs(pred16 - pred32), 0.99))
    # Gate: MAE <= 0.15% of the disparity range. bf16 network drift is
    # proportional to the regression range (measured 0.11% of range at the
    # 64x32/maxdisp-16 trained point on XLA-only paths, 0.06% of range
    # here at 1024x512/maxdisp-192 through the Pallas kernels), so a
    # relative bound tracks kernel regressions at ~2.4x today's headroom
    # without encoding a miscalibrated absolute px target.
    bound = 0.0015 * maxdisp
    passed = bool(np.isfinite(pred32).all() and np.isfinite(pred16).all()
                  and drift_mae <= bound)
    ok = ok and passed
    rec = {"check": "e2e_bf16_drift_1024x512", "mae_px": round(drift_mae, 5),
           "p99_px": round(drift_p99, 5),
           "mae_pct_range": round(100.0 * drift_mae / maxdisp, 4),
           "bound_px": round(bound, 4), "pass": passed}
    results.append(rec)
    print(json.dumps(rec), flush=True)
  except Exception as e:                                  # pragma: no cover
    ok = False
    print(json.dumps({"check": "e2e_bf16_drift_1024x512", "pass": False,
                      "error": repr(e)[:200]}), flush=True)

  # --- e2e PATH parity: full Pallas path vs all-XLA path, trained weights --
  # The bf16 drift gate above measures dtype drift; these compare the two
  # dispatch paths at the SAME dtype, so any difference is kernel math.
  #  * 512x256 / maxdisp 48, f32 both sides: the smallest production-family
  #    shape where the sphere kernel is f32-eligible. Same trained weights
  #    as the committed torch<->JAX mid-res pin (tests/
  #    test_trained_parity_midres.py), so together they close the chain
  #    torch -> JAX-XLA -> JAX-Pallas with no shape gap.
  #  * 1024x512 / maxdisp 192, bf16 both sides: every production gate live
  #    (lane mid-section, stride-2/deconv/fold kernels, fused regression).
  import importlib
  _sph = importlib.import_module("mode_tpu.ops.sphere_conv")
  from mode_tpu.models.disparity import set_fused_regression
  from mode_tpu.ops.pallas.conv3d_kernel import set_conv3d_pallas

  def _paths_onoff(jmodel, variables, left, right):
    """(pallas_out, xla_out) of the eval forward at identical inputs."""
    run = jax.jit(lambda v, l, r: jmodel.apply(v, l, r, train=False))
    try:
      _sph.set_pallas_mode("auto")
      set_conv3d_pallas("auto")
      set_fused_regression("auto")
      got = np.asarray(run(variables, left, right))
      _sph.set_pallas_mode("off")
      set_conv3d_pallas("off")
      set_fused_regression("off")
      run_off = jax.jit(
          lambda v, l, r: jmodel.apply(v, l, r, train=False))
      ref = np.asarray(run_off(variables, left, right))
    finally:
      _sph.set_pallas_mode("auto")
      set_conv3d_pallas("auto")
      set_fused_regression("auto")
    return got, ref

  for tag, (h, w, maxdisp), dtype, bound_frac, art in (
      ("path_parity_512x256_f32", (512, 256, 48), jnp.float32, 5e-5, "mid"),
      ("path_parity_1024x512_bf16", (1024, 512, 192), jnp.bfloat16, 0.0015,
       "full"),
  ):
    try:
      from tests.trained_mirror import (get_trained_state_dict,
                                        get_trained_state_dict_mid)
      from mode_tpu.models.disparity import ModeDisparity
      from mode_tpu.utils.torch_convert import convert_state_dict
      from mode_tpu.training import cast_conv_params

      jmodel = ModeDisparity(maxdisp=maxdisp, out_conf=False)
      tiny = jnp.zeros((1, 64, 32, 3), jnp.float32)
      variables = jax.jit(
          lambda: jmodel.init(jax.random.PRNGKey(0), tiny, tiny,
                              train=False))()
      sd = (get_trained_state_dict_mid() if art == "mid"
            else get_trained_state_dict())
      variables = jax.device_put(convert_state_dict(sd, variables))
      shift = maxdisp // 3
      fine = rng.normal(size=(1, h // 2, w // 2, 3)).astype(np.float32)
      left_np = np.kron(fine, np.ones((1, 2, 2, 1), np.float32))
      right_np = np.roll(left_np, -shift, axis=2)
      if dtype == jnp.bfloat16:
        variables = {"params": cast_conv_params(variables["params"], dtype),
                     "batch_stats": variables["batch_stats"]}
      left = jnp.asarray(left_np, dtype)
      right = jnp.asarray(right_np, dtype)
      got, ref = _paths_onoff(jmodel, variables, left, right)
      mae = float(np.abs(got - ref).mean())
      bound = bound_frac * maxdisp
      passed = bool(np.isfinite(got).all() and np.isfinite(ref).all()
                    and mae <= bound)
      ok = ok and passed
      rec = {"check": f"e2e_{tag}", "mae_px": float(f"{mae:.3g}"),
             "bound_px": round(bound, 5), "pass": passed}
      results.append(rec)
      print(json.dumps(rec), flush=True)
    except Exception as e:                                # pragma: no cover
      ok = False
      print(json.dumps({"check": f"e2e_{tag}", "pass": False,
                        "error": repr(e)[:200]}), flush=True)

  print(json.dumps({"ok": ok, "n_checks": len(results)}), flush=True)
  return 0 if ok else 1


if __name__ == "__main__":
  sys.exit(main())
