"""MODE stage-2: multi-view depth fusion.

TPU-native re-design of ``ModeFusion`` / ``Baseline``
(``/root/reference/models/mode_fusion.py``): a two-branch UNet — depth branch
over 6 interleaved (depth, confidence) maps, RGB branch over 4 views —
with per-scale fusion layers and a sigmoid×max_depth head.

Flax children are named with torch state_dict path segments (see
``models/blocks.py``). Note the reference's fusion ``BasicBlock`` has *no*
residual connection (mode_fusion.py:29-32) and its constructed ``downsample``
branches are dead parameters — we neither build nor convert them.
"""

from __future__ import annotations

import math
from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp

from mode_tpu.models.blocks import (
    Conv2dLane,
    ConvTranspose,
    FusionBasicBlock,
    FusionBasicBlockLane,
    TorchBatchNorm,
    bn_relu_lane,
    conv_nd,
)


def _layer(x, train, feats, blocks, prefix, start=0):
  """A run of FusionBasicBlocks named ``prefix.start..``"""
  for i in range(blocks):
    x = FusionBasicBlock(feats, name=f"{prefix}.{start + i}")(x, train)
  return x


def _maxpool2(x):
  return nn.max_pool(x, (2, 2), (2, 2))


def _layer_lane(x, feats, blocks, prefix, start=0):
  for i in range(blocks):
    x = FusionBasicBlockLane(feats, name=f"{prefix}.{start + i}")(x)
  return x


def _maxpool2_lane(x):
  """2x2/2 max-pool on lane-major (B, M, C, L)."""
  b, m, c, l = x.shape
  x = jnp.maximum(x[:, 0::2], x[:, 1::2])
  return x.reshape(b, m // 2, c, l // 2, 2).max(axis=-1)


def _lane_eligible(shape) -> bool:
  """Whether the eval forward should run lane-major (W on the TPU lanes)
  end-to-end. Per-call NHWC dispatch of the band kernel measured *slower*
  in-program (see models/blocks.py:conv_nd); whole-net lane residency with
  fused epilogues is the formulation that wins."""
  from mode_tpu.ops.pallas.conv2d_kernel import pallas_policy_ok
  b, h, w, c = shape
  # allow_mesh: under a mesh each Conv2dLane routes through the shard_map
  # wrapper per-call (models/blocks.py) and the lane-major XLA ops are
  # GSPMD-partitioned like any jit op, so whole-net lane residency is
  # mesh-safe
  return w % 128 == 0 and h % 8 == 0 and pallas_policy_ok(allow_mesh=True)


class FeatureExtractionFusion(nn.Module):
  """``feature_extraction_MODE_Fusion`` (mode_fusion.py:91-247).

  channels = [32, 64, 128, 256] for Deep360 (train_fusion.py:64).
  """
  max_depth: float
  channels: Sequence[int] = (32, 64, 128, 256)

  @nn.compact
  def __call__(self, depth_in, rgb_in, train: bool):
    ch = self.channels
    if not train and _lane_eligible(depth_in.shape):
      return self._forward_lane(depth_in, rgb_in, ch)
    # ---- depth encoder
    d1 = _layer(depth_in, train, ch[0], 2, "depth_layer1")
    d2 = _layer(_maxpool2(d1), train, ch[1], 1, "depth_layer2", start=1)
    d3 = _layer(_maxpool2(d2), train, ch[2], 1, "depth_layer3", start=1)
    # depth_layer4: pool + block + transpose-up (mode_fusion.py:181-195)
    d4 = _layer(_maxpool2(d3), train, ch[3], 1, "depth_layer4", start=1)
    d4 = ConvTranspose(ch[3] // 2, (2, 2), stride=2, padding=0,
                       output_padding=0, use_bias=True,
                       name="depth_layer4.2")(d4)
    d4 = TorchBatchNorm(name="depth_layer4.3")(d4, train)
    d4 = nn.relu(d4)
    # ---- rgb encoder
    r1 = _layer(rgb_in, train, ch[0], 2, "rgb_layer1")
    r2 = _layer(_maxpool2(r1), train, ch[1], 1, "rgb_layer2", start=1)
    r3 = _layer(_maxpool2(r2), train, ch[2], 1, "rgb_layer3", start=1)
    # ---- per-scale fusion (2 blocks each, mode_fusion.py:171-179)
    f1 = _layer(jnp.concatenate([d1, r1], -1), train, ch[0], 2,
                "fusion_layer1")
    f2 = _layer(jnp.concatenate([d2, r2], -1), train, ch[1], 2,
                "fusion_layer2")
    f3 = _layer(jnp.concatenate([d3, r3], -1), train, ch[2], 2,
                "fusion_layer3")
    # ---- decoder
    d5 = _layer(jnp.concatenate([f3, d4], -1), train, ch[2], 1,
                "depth_layer5")
    d5 = ConvTranspose(ch[2] // 2, (2, 2), stride=2, padding=0,
                       output_padding=0, use_bias=True,
                       name="depth_layer5.1")(d5)
    d5 = TorchBatchNorm(name="depth_layer5.2")(d5, train)
    d5 = nn.relu(d5)
    d6 = _layer(jnp.concatenate([f2, d5], -1), train, ch[1], 1,
                "depth_layer6")
    d6 = ConvTranspose(ch[1] // 2, (2, 2), stride=2, padding=0,
                       output_padding=0, use_bias=True,
                       name="depth_layer6.1")(d6)
    d6 = TorchBatchNorm(name="depth_layer6.2")(d6, train)
    d6 = nn.relu(d6)
    # ---- head (mode_fusion.py:212-226)
    d7 = _layer(jnp.concatenate([f1, d6], -1), train, ch[0], 2,
                "depth_layer7")
    d7 = conv_nd(d7, 1, (1, 1), stride=1, pad=0, use_bias=True,
                 name="depth_layer7.2")
    # sigmoid × max_depth in f32: a bfloat16 depth at 1000 m quantizes to
    # ~4 m steps
    return jax.nn.sigmoid(d7.astype(jnp.float32)) * self.max_depth

  def _forward_lane(self, depth_in, rgb_in, ch):
    """Eval forward in lane-major (B, H, C, W) layout: one transpose in,
    one out; every stride-1 3x3 convbn(+ReLU) runs the fused Pallas band
    kernel (BN affine + ReLU in the epilogue), the deepest level (W/8
    lanes < 128) and the 2x2 transpose-convs run XLA convs with lane-major
    dimension numbers. Param tree identical to the NHWC path."""
    d = jnp.transpose(depth_in, (0, 1, 3, 2))
    r = jnp.transpose(rgb_in, (0, 1, 3, 2))
    d1 = _layer_lane(d, ch[0], 2, "depth_layer1")
    d2 = _layer_lane(_maxpool2_lane(d1), ch[1], 1, "depth_layer2", start=1)
    d3 = _layer_lane(_maxpool2_lane(d2), ch[2], 1, "depth_layer3", start=1)
    d4 = _layer_lane(_maxpool2_lane(d3), ch[3], 1, "depth_layer4", start=1)
    d4 = ConvTranspose(ch[3] // 2, (2, 2), stride=2, padding=0,
                       output_padding=0, use_bias=True,
                       name="depth_layer4.2")(d4, lane_xla=("W", "W"))
    d4 = bn_relu_lane(d4, "depth_layer4.3", ch[3] // 2)
    r1 = _layer_lane(r, ch[0], 2, "rgb_layer1")
    r2 = _layer_lane(_maxpool2_lane(r1), ch[1], 1, "rgb_layer2", start=1)
    r3 = _layer_lane(_maxpool2_lane(r2), ch[2], 1, "rgb_layer3", start=1)
    f1 = _layer_lane(jnp.concatenate([d1, r1], 2), ch[0], 2, "fusion_layer1")
    f2 = _layer_lane(jnp.concatenate([d2, r2], 2), ch[1], 2, "fusion_layer2")
    f3 = _layer_lane(jnp.concatenate([d3, r3], 2), ch[2], 2, "fusion_layer3")
    d5 = _layer_lane(jnp.concatenate([f3, d4], 2), ch[2], 1, "depth_layer5")
    d5 = ConvTranspose(ch[2] // 2, (2, 2), stride=2, padding=0,
                       output_padding=0, use_bias=True,
                       name="depth_layer5.1")(d5, lane_xla=("W", "W"))
    d5 = bn_relu_lane(d5, "depth_layer5.2", ch[2] // 2)
    d6 = _layer_lane(jnp.concatenate([f2, d5], 2), ch[1], 1, "depth_layer6")
    d6 = ConvTranspose(ch[1] // 2, (2, 2), stride=2, padding=0,
                       output_padding=0, use_bias=True,
                       name="depth_layer6.1")(d6, lane_xla=("W", "W"))
    d6 = bn_relu_lane(d6, "depth_layer6.2", ch[1] // 2)
    d7 = _layer_lane(jnp.concatenate([f1, d6], 2), ch[0], 2, "depth_layer7")
    d7 = Conv2dLane(1, kernel=(1, 1), stride=(1, 1), pad=(0, 0),
                    use_bias=True, name="depth_layer7.2")(d7)
    out = jax.nn.sigmoid(d7.astype(jnp.float32)) * self.max_depth
    return jnp.transpose(out, (0, 1, 3, 2))


class ModeFusion(nn.Module):
  """Stage-2 network (mode_fusion.py:282-307).

  ``__call__(depths, confs, rgbs, train)`` — lists of ``(B, H, W, 1)`` depth
  maps, ``(B, H, W, 1)`` confidence maps (6 each), and ``(B, H, W, 3)`` RGB
  views (4). Depth and confidence are interleaved channel-wise, exactly as
  the reference concatenates them (mode_fusion.py:297-302).
  """
  max_depth: float = 1000.0
  channels: Sequence[int] = (32, 64, 128, 256)

  @nn.compact
  def __call__(self, depths, confs, rgbs, train: bool):
    interleaved = []
    for d, c in zip(depths, confs):
      interleaved.extend([d, c])
    depth_in = jnp.concatenate(interleaved, axis=-1)
    rgb_in = jnp.concatenate(rgbs, axis=-1)
    out = FeatureExtractionFusion(self.max_depth, self.channels,
                                  name="feature_extraction")(
                                      depth_in, rgb_in, train)
    return out


class Baseline(nn.Module):
  """Ablation fusion net (mode_fusion.py:35-88, 262-279): a plain 7-stage
  conv stack over concatenated depths only."""
  max_depth: float = 1000.0

  @nn.compact
  def __call__(self, depths, train: bool):
    x = jnp.concatenate(depths, axis=-1)
    feats = [(32, 2), (64, 1), (128, 1), (256, 1), (128, 1), (64, 1)]
    for li, (f, blocks) in enumerate(feats, start=1):
      x = _layer(x, train, f, blocks, f"feature_extraction.layer{li}")
    x = _layer(x, train, 32, 2, "feature_extraction.layer7")
    x = conv_nd(x, 1, (1, 1), stride=1, pad=0, use_bias=True,
                name="feature_extraction.layer7.2")
    return jax.nn.sigmoid(x.astype(jnp.float32)) * self.max_depth
