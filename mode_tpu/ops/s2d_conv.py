"""Stride-2 3-D convs / transpose-convs as full-lane packed GEMMs.

The hourglass encoder/decoder (``/root/reference/models/mode_disparity.py:11-46``)
is stride-2 3x3x3 convs and their transposes over C∈{32,64} volumes. On TPU
both are MXU-hostile as-is: C<128 wastes lanes, and XLA lowers the
transpose-conv via ``lhs_dilation`` — a 27-tap conv over a zero-stuffed
volume, 8/27 of whose MACs touch zeros (measured 3-8 bf16-TFLOP/s across
layouts, ``/tmp`` round-3 probes; the stride-1 Pallas band kernel gets
22-63).

The cure is phase packing (space-to-depth): group the input into its eight
stride-2 phases along the channel axis — ``(B, D/2, H/2, W/2, 8C)`` — and
the stride-2 conv becomes a *stride-1* 2x2x2 conv in packed space whose
contraction runs over 8C ≥ 256 full lanes. Each of the 27 real taps maps to
exactly one slot of the 2x2x2x(8C) packed kernel (the other 37 slots are
zero), so the MXU runs at full lane width for 64/27 = 2.4x the MAC count —
a large net win over 4-8x lane/zero waste. The transpose conv is the mirror
image: a stride-1 2x2x2 conv producing all eight *output* phases as 8·Cout
channels, then depth-to-space.

Used by the eval lane-major fast path (``models/blocks.py:convbn_3d_lane``,
``models/disparity.py:Hourglass``). Pure XLA — composes with jit, SPMD and
autodiff; no Pallas involved.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

# per-dimension tap placement for stride-2, pad-1, kernel-3 convolution:
# output o reads input {2o-1, 2o, 2o+1}; in packed coordinates (input index
# = 2P + phi) that is kernel window P' in {o-1, o} (packed padding (1, 0)):
#   (kp=0, phi=1) <- tap t=0,  (kp=1, phi=0) <- tap t=1,  (kp=1, phi=1) <- t=2
_CONV_TAPS = (((0, 1), 0), ((1, 0), 1), ((1, 1), 2))

# transpose conv (stride 2, k=3, pad=1, output_padding=1; flipped kernel
# w_f): out[2P + phi]: phi=0 <- w_f[1] @ P; phi=1 <- w_f[0] @ P + w_f[2] @
# P+1. Packed window P' in {P, P+1} (packed padding (0, 1)):
_DECONV_TAPS = (((0, 0), 1), ((0, 1), 0), ((1, 1), 2))


def _pack_weight(w, taps):
  """(3,3,3,I,O) tap kernel -> (2,2,2, 8I, O) packed kernel (zeros where no
  real tap lands)."""
  cin, cout = w.shape[3], w.shape[4]
  wp = jnp.zeros((2, 2, 2, 2, 2, 2, cin, cout), w.dtype)
  for (kd, pd), td in taps:
    for (kh, ph), th in taps:
      for (kw, pw), tw in taps:
        wp = wp.at[kd, kh, kw, pd, ph, pw].set(w[td, th, tw])
  return wp.reshape(2, 2, 2, 8 * cin, cout)


def _space_to_depth(x):
  b, d, h, w, c = x.shape
  x = x.reshape(b, d // 2, 2, h // 2, 2, w // 2, 2, c)
  x = jnp.transpose(x, (0, 1, 3, 5, 2, 4, 6, 7))
  return x.reshape(b, d // 2, h // 2, w // 2, 8 * c)


def _depth_to_space(y, cout):
  b, d, h, w, _ = y.shape
  y = y.reshape(b, d, h, w, 2, 2, 2, cout)
  y = jnp.transpose(y, (0, 1, 4, 2, 5, 3, 6, 7))
  return y.reshape(b, 2 * d, 2 * h, 2 * w, cout)


def _dn(x_shape, w_shape):
  return lax.conv_dimension_numbers(x_shape, w_shape,
                                    ("NDHWC", "DHWIO", "NDHWC"))


def _prec(dt):
  return (lax.Precision.HIGHEST if dt == jnp.float32
          else lax.Precision.DEFAULT)


def conv3d_stride2_s2d(x, w):
  """Stride-2 pad-1 3x3x3 conv, NDHWC/DHWIO, via phase packing.

  Equals ``lax.conv_general_dilated(x, w, (2,2,2), [(1,1)]*3)`` with even
  spatial sizes; contraction width 8C keeps the MXU lanes full.
  """
  xp = _space_to_depth(x)
  wp = _pack_weight(w, _CONV_TAPS).astype(x.dtype)
  return lax.conv_general_dilated(
      xp, wp, (1, 1, 1), [(1, 0)] * 3,
      dimension_numbers=_dn(xp.shape, wp.shape), precision=_prec(x.dtype))


def deconv3d_stride2_d2s(x, kernel_t):
  """ConvTranspose3d(k=3, stride=2, padding=1, output_padding=1) via phase
  packing: one stride-1 2x2x2 conv emitting all 8 output phases as
  channels, then depth-to-space. ``kernel_t`` is the torch-layout param
  (3, 3, 3, O, I) (see ``models/blocks.py:ConvTranspose``)."""
  w_flipped = jnp.flip(kernel_t, axis=(0, 1, 2))
  w_io = jnp.swapaxes(w_flipped, -1, -2)               # (3,3,3, I, O)
  cin, cout = w_io.shape[3], w_io.shape[4]
  wp = _pack_weight(w_io, _DECONV_TAPS).astype(x.dtype)
  # packed kernel is (2,2,2, 8I, O) with the PHASE axes living on the input
  # side; for the deconv the phases are OUTPUT phases — move them to O:
  wp = wp.reshape(2, 2, 2, 2, 2, 2, cin, cout)
  wp = jnp.transpose(wp, (0, 1, 2, 6, 3, 4, 5, 7)).reshape(
      2, 2, 2, cin, 8 * cout)
  y = lax.conv_general_dilated(
      x, wp, (1, 1, 1), [(0, 1)] * 3,
      dimension_numbers=_dn(x.shape, wp.shape), precision=_prec(x.dtype))
  return _depth_to_space(y, cout)
