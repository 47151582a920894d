"""Test-only torch oracle models.

These mirror the reference architectures (``/root/reference/models/``) in
plain CPU torch so that the JAX models + checkpoint converter can be
golden-tested end to end (the reference itself cannot be imported — its
sphere conv hard-requires a compiled CUDA extension). The sphere conv here
uses the gather tables from ``mode_tpu.ops.sphere_conv``, which are
independently pinned against a loop oracle of the CUDA kernel semantics in
``test_sphere_conv.py`` — so this mirror is CUDA-faithful by composition.

state_dict key layout matches the reference exactly (Sequential indices and
attribute names), which is what the converter consumes.
"""

import numpy as np
import torch
import torch.nn as nn
import torch.nn.functional as F

from mode_tpu.ops.sphere_conv import build_gather_tables


class TorchSphereConv(nn.Module):
  """CUDA-semantics sphere conv on CPU via static gather tables."""

  def __init__(self, in_height, in_width, sphere_type, in_ch, out_ch,
               kernel_size=3, stride=1, padding=1, dilation=1):
    super().__init__()
    self.k = kernel_size
    self.stride = stride
    idx, wgt = build_gather_tables(in_height, in_width, kernel_size,
                                   kernel_size, sphere_type, stride,
                                   padding, dilation)
    self.register_buffer("gidx",
                         torch.from_numpy(idx.astype(np.int64)),
                         persistent=False)
    self.register_buffer("gwgt", torch.from_numpy(wgt), persistent=False)
    self.weight = nn.Parameter(torch.empty(out_ch, in_ch, kernel_size,
                                           kernel_size))
    n = in_ch * kernel_size * kernel_size
    stdv = 1.0 / np.sqrt(n)
    self.weight.data.uniform_(-stdv, stdv)

  def forward(self, x):  # x NCHW
    n, c, h, w = x.shape
    k2, ho, wo = self.gidx.shape[1:]
    xf = x.reshape(n, c, h * w)
    col = torch.zeros(n, k2, c, ho, wo, dtype=x.dtype)
    for corner in range(4):
      g = xf[:, :, self.gidx[corner].reshape(-1)]
      g = g.reshape(n, c, k2, ho, wo).permute(0, 2, 1, 3, 4)
      col = col + self.gwgt[corner][None, :, None] * g
    wmat = self.weight.permute(2, 3, 1, 0).reshape(k2, c, -1)
    out = torch.einsum("nkchw,kco->nohw", col, wmat)
    return out


def convbn(inp, out, k, stride, pad, dilation):
  return nn.Sequential(
      nn.Conv2d(inp, out, kernel_size=k, stride=stride,
                padding=dilation if dilation > 1 else pad,
                dilation=dilation, bias=False),
      nn.BatchNorm2d(out))


def convbn_3d(inp, out, k, stride, pad):
  return nn.Sequential(
      nn.Conv3d(inp, out, kernel_size=k, padding=pad, stride=stride,
                bias=False),
      nn.BatchNorm3d(out))


def sphere_convbn(h, w, st, inp, out, k, stride, pad, dilation):
  return nn.Sequential(
      TorchSphereConv(h, w, st, inp, out, k, stride,
                      dilation if dilation > 1 else pad, dilation),
      nn.BatchNorm2d(out))


class RegularBasicBlock(nn.Module):
  def __init__(self, inplanes, planes, stride, downsample, pad, dilation):
    super().__init__()
    self.conv1 = nn.Sequential(convbn(inplanes, planes, 3, stride, pad,
                                      dilation), nn.ReLU(inplace=True))
    self.conv2 = convbn(planes, planes, 3, 1, pad, dilation)
    self.relu = nn.ReLU(inplace=True)
    self.downsample = downsample

  def forward(self, x):
    out = self.conv2(self.conv1(x))
    if self.downsample is not None:
      x = self.downsample(x)
    return self.relu(out + x)


class SphereBasicBlockT(nn.Module):
  def __init__(self, h, w, st, inplanes, planes, stride, downsample, pad,
               dilation):
    super().__init__()
    self.conv1 = nn.Sequential(
        sphere_convbn(h, w, st, inplanes, planes, 3, stride, pad, dilation),
        nn.ReLU(inplace=True))
    self.conv2 = sphere_convbn(h // stride, w // stride, st, planes, planes,
                               3, 1, pad, dilation)
    self.relu = nn.ReLU(inplace=True)
    self.downsample = downsample

  def forward(self, x):
    out = self.conv2(self.conv1(x))
    if self.downsample is not None:
      x = self.downsample(x)
    return self.relu(out + x)


def _downsample(inplanes, planes, stride):
  return nn.Sequential(
      nn.Conv2d(inplanes, planes, kernel_size=1, stride=stride, bias=False),
      nn.BatchNorm2d(planes))


def _make_layer(block_args, inplanes, planes, blocks, stride, pad, dilation):
  """Regular stage."""
  downsample = None
  if stride != 1 or inplanes != planes:
    downsample = _downsample(inplanes, planes, stride)
  layers = [RegularBasicBlock(inplanes, planes, stride, downsample, pad,
                              dilation)]
  for _ in range(1, blocks):
    layers.append(RegularBasicBlock(planes, planes, 1, None, pad, dilation))
  return nn.Sequential(*layers)


def _make_sphere_layer(h, w, st, inplanes, planes, blocks, stride, pad,
                       dilation):
  downsample = None
  if stride != 1 or inplanes != planes:
    downsample = _downsample(inplanes, planes, stride)
  layers = [SphereBasicBlockT(h, w, st, inplanes, planes, stride, downsample,
                              pad, dilation)]
  for _ in range(1, blocks):
    layers.append(SphereBasicBlockT(h // stride, w // stride, st, planes,
                                    planes, 1, None, pad, dilation))
  return nn.Sequential(*layers)


class SphereFeatureExtractionT(nn.Module):
  def __init__(self, in_height, in_width, sphere_type):
    super().__init__()
    self.firstconv = nn.Sequential(convbn(3, 32, 7, 2, 3, 1),
                                   nn.ReLU(inplace=True),
                                   convbn(32, 32, 3, 1, 1, 1),
                                   nn.ReLU(inplace=True),
                                   convbn(32, 32, 3, 1, 1, 1),
                                   nn.ReLU(inplace=True))
    self.layer1 = _make_layer(None, 32, 64, 3, 1, 1, 1)
    self.layer2 = _make_layer(None, 64, 64, 8, 2, 1, 1)
    self.layer3 = _make_layer(None, 64, 64, 4, 1, 1, 2)
    self.layer4 = _make_sphere_layer(in_height // 4, in_width // 4,
                                     sphere_type, 64, 128, 8, 1, 1, 1)
    self.lastconv = nn.Sequential(convbn(256, 128, 1, 1, 0, 1),
                                  nn.ReLU(inplace=True),
                                  convbn(128, 128, 3, 1, 1, 1),
                                  nn.ReLU(inplace=True),
                                  convbn(128, 32, 1, 1, 0, 1),
                                  nn.ReLU(inplace=True))

  def forward(self, x):
    out = self.firstconv(x)
    out = self.layer1(out)
    raw = self.layer2(out)
    reg = self.layer3(raw)
    sph = self.layer4(reg)
    return self.lastconv(torch.cat((raw, reg, sph), 1))


class HourglassT(nn.Module):
  def __init__(self, inplanes):
    super().__init__()
    self.conv1 = nn.Sequential(convbn_3d(inplanes, inplanes * 2, 3, 2, 1),
                               nn.ReLU(inplace=True))
    self.conv2 = convbn_3d(inplanes * 2, inplanes * 2, 3, 1, 1)
    self.conv3 = nn.Sequential(convbn_3d(inplanes * 2, inplanes * 2, 3, 2, 1),
                               nn.ReLU(inplace=True))
    self.conv4 = nn.Sequential(convbn_3d(inplanes * 2, inplanes * 2, 3, 1, 1),
                               nn.ReLU(inplace=True))
    self.conv5 = nn.Sequential(
        nn.ConvTranspose3d(inplanes * 2, inplanes * 2, 3, padding=1,
                           output_padding=1, stride=2, bias=False),
        nn.BatchNorm3d(inplanes * 2))
    self.conv6 = nn.Sequential(
        nn.ConvTranspose3d(inplanes * 2, inplanes, 3, padding=1,
                           output_padding=1, stride=2, bias=False),
        nn.BatchNorm3d(inplanes))

  def forward(self, x, presqu, postsqu):
    out = self.conv1(x)
    pre = self.conv2(out)
    pre = F.relu(pre + postsqu) if postsqu is not None else F.relu(pre)
    out = self.conv3(pre)
    out = self.conv4(out)
    if presqu is not None:
      post = F.relu(self.conv5(out) + presqu)
    else:
      post = F.relu(self.conv5(out) + pre)
    return self.conv6(post), pre, post


class ModeDisparityT(nn.Module):
  """Torch mirror of ModeDisparity (mode_disparity.py:51-185), CPU."""

  def __init__(self, maxdisp, in_height, in_width, sphere_type="Cassini",
               out_conf=False):
    super().__init__()
    self.maxdisp = maxdisp
    self.out_conf = out_conf
    self.feature_extraction = SphereFeatureExtractionT(in_height, in_width,
                                                       sphere_type)
    self.dres0 = nn.Sequential(convbn_3d(64, 32, 3, 1, 1),
                               nn.ReLU(inplace=True),
                               convbn_3d(32, 32, 3, 1, 1),
                               nn.ReLU(inplace=True))
    self.dres1 = nn.Sequential(convbn_3d(32, 32, 3, 1, 1),
                               nn.ReLU(inplace=True),
                               convbn_3d(32, 32, 3, 1, 1))
    self.dres2 = HourglassT(32)
    self.dres3 = HourglassT(32)
    self.dres4 = HourglassT(32)
    self.classif1 = nn.Sequential(convbn_3d(32, 32, 3, 1, 1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv3d(32, 1, 3, padding=1, stride=1,
                                            bias=False))
    self.classif2 = nn.Sequential(convbn_3d(32, 32, 3, 1, 1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv3d(32, 1, 3, padding=1, stride=1,
                                            bias=False))
    self.classif3 = nn.Sequential(convbn_3d(32, 32, 3, 1, 1),
                                  nn.ReLU(inplace=True),
                                  nn.Conv3d(32, 1, 3, padding=1, stride=1,
                                            bias=False))
    for m in self.modules():
      if isinstance(m, nn.Conv2d):
        n = m.kernel_size[0] * m.kernel_size[1] * m.out_channels
        m.weight.data.normal_(0, np.sqrt(2. / n))
      elif isinstance(m, nn.Conv3d):
        n = (m.kernel_size[0] * m.kernel_size[1] * m.kernel_size[2] *
             m.out_channels)
        m.weight.data.normal_(0, np.sqrt(2. / n))
      elif isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
        m.weight.data.fill_(1)
        m.bias.data.zero_()

  def forward(self, left, right):
    ref = self.feature_extraction(left)
    tgt = self.feature_extraction(right)
    b, c, h, w = ref.shape
    cost = torch.zeros(b, c * 2, self.maxdisp // 4, h, w)
    for i in range(self.maxdisp // 4):
      if i > 0:
        cost[:, :c, i, :, i:] = ref[:, :, :, i:]
        cost[:, c:, i, :, i:] = tgt[:, :, :, :-i]
      else:
        cost[:, :c, i, :, :] = ref
        cost[:, c:, i, :, :] = tgt

    cost0 = self.dres0(cost)
    cost0 = self.dres1(cost0) + cost0
    out1, pre1, post1 = self.dres2(cost0, None, None)
    out1 = out1 + cost0
    out2, pre2, post2 = self.dres3(out1, pre1, post1)
    out2 = out2 + cost0
    out3, pre3, post3 = self.dres4(out2, pre1, post2)
    out3 = out3 + cost0
    cost1 = self.classif1(out1)
    cost2 = self.classif2(out2) + cost1
    cost3 = self.classif3(out3) + cost2

    full = [self.maxdisp, left.size(2), left.size(3)]
    disp = torch.arange(self.maxdisp).float().reshape(1, -1, 1, 1)

    def regress(cost):
      up = F.interpolate(cost, full, mode="trilinear", align_corners=True)
      prob = F.softmax(up.squeeze(1), dim=1)
      return prob, torch.sum(prob * disp, 1)

    if self.training:
      _, p1 = regress(cost1)
      _, p2 = regress(cost2)
      _, p3 = regress(cost3)
      return p1, p2, p3
    prob3, p3 = regress(cost3)
    if self.out_conf:
      # verbatim grid_sample formulation (mode_disparity.py:157-183)
      pred3 = p3.unsqueeze(1)
      prob_volume = prob3
      grid_d = (torch.round(pred3).permute([0, 2, 3, 1]).unsqueeze(1) /
                (self.maxdisp - 1.0) * 2 - 1)
      grid_d_floor = ((torch.round(pred3) - 1).permute([0, 2, 3, 1])
                      .unsqueeze(1) / (self.maxdisp - 1) * 2 - 1)
      grid_d_ceil = ((torch.round(pred3) + 1).permute([0, 2, 3, 1])
                     .unsqueeze(1) / (self.maxdisp - 1) * 2 - 1)
      grid_h, grid_w = torch.meshgrid(torch.arange(0, grid_d.shape[2]),
                                      torch.arange(0, grid_d.shape[3]),
                                      indexing="ij")
      grid_h = ((grid_h / (grid_d.shape[2] - 1.0) * 2 - 1).unsqueeze(0)
                .unsqueeze(-1).unsqueeze(0)
                .repeat_interleave(grid_d.shape[0], dim=0)).float()
      grid_w = ((grid_w / (grid_d.shape[3] - 1.0) * 2 - 1).unsqueeze(0)
                .unsqueeze(-1).unsqueeze(0)
                .repeat_interleave(grid_d.shape[0], dim=0)).float()
      total = None
      for gd in (grid_d, grid_d_floor, grid_d_ceil):
        grid = torch.cat([grid_w, grid_h, gd], dim=-1)
        s = F.grid_sample(prob_volume.unsqueeze(1), grid,
                          align_corners=True, padding_mode="border",
                          mode="nearest")
        total = s if total is None else total + s
      return p3, total.squeeze(1).squeeze(1)
    return p3


# ----------------------------------------------------------------- fusion
class FusionBasicBlockT(nn.Module):
  def __init__(self, inplanes, planes, stride, downsample, pad, dilation):
    super().__init__()
    self.conv1 = nn.Sequential(convbn(inplanes, planes, 3, stride, pad,
                                      dilation), nn.ReLU(inplace=True))
    self.conv2 = nn.Sequential(convbn(planes, planes, 3, 1, pad, dilation),
                               nn.ReLU(inplace=True))
    self.downsample = downsample  # constructed but unused (mode_fusion.py:29)

  def forward(self, x):
    return self.conv2(self.conv1(x))


class FeatureExtractionFusionT(nn.Module):
  """Mirror of feature_extraction_MODE_Fusion (mode_fusion.py:91-247)."""

  def __init__(self, maxdepth, channels, inplanes):
    super().__init__()
    self.depth_inplanes = inplanes["depth"]
    self.rgb_inplanes = inplanes["rgb"]
    ch = channels
    B = FusionBasicBlockT

    def run(inp, planes, blocks, pre=None, post=None):
      layers = list(pre or [])
      ds = _downsample(inp, planes, 1) if inp != planes else None
      layers.append(B(inp, planes, 1, ds, 1, 1))
      for _ in range(1, blocks):
        layers.append(B(planes, planes, 1, None, 1, 1))
      layers.extend(post or [])
      return nn.Sequential(*layers)

    self.depth_layer1 = run(self.depth_inplanes, ch[0], 2)
    self.depth_layer2 = run(ch[0], ch[1], 1, pre=[nn.MaxPool2d(2, 2)])
    self.depth_layer3 = run(ch[1], ch[2], 1, pre=[nn.MaxPool2d(2, 2)])
    self.rgb_layer1 = run(self.rgb_inplanes, ch[0], 2)
    self.rgb_layer2 = run(ch[0], ch[1], 1, pre=[nn.MaxPool2d(2, 2)])
    self.rgb_layer3 = run(ch[1], ch[2], 1, pre=[nn.MaxPool2d(2, 2)])
    self.fusion_layer1 = run(2 * ch[0], ch[0], 2)
    self.fusion_layer2 = run(2 * ch[1], ch[1], 2)
    self.fusion_layer3 = run(2 * ch[2], ch[2], 2)
    self.depth_layer4 = run(ch[2], ch[3], 1, pre=[nn.MaxPool2d(2, 2)],
                            post=[nn.ConvTranspose2d(ch[3], ch[3] // 2, 2, 2),
                                  nn.BatchNorm2d(ch[3] // 2),
                                  nn.ReLU(inplace=True)])
    self.depth_layer5 = run(ch[3], ch[2], 1,
                            post=[nn.ConvTranspose2d(ch[2], ch[2] // 2, 2, 2),
                                  nn.BatchNorm2d(ch[2] // 2),
                                  nn.ReLU(inplace=True)])
    self.depth_layer6 = run(ch[2], ch[1], 1,
                            post=[nn.ConvTranspose2d(ch[1], ch[1] // 2, 2, 2),
                                  nn.BatchNorm2d(ch[1] // 2),
                                  nn.ReLU(inplace=True)])
    self.depth_layer7 = run(ch[1], ch[0], 2,
                            post=[nn.Conv2d(ch[0], 1, 1, padding=0, stride=1,
                                            bias=True),
                                  nn.Sigmoid()])
    self.maxdepth = torch.tensor(float(maxdepth))
    for m in self.modules():
      if isinstance(m, nn.Conv2d):
        n = m.kernel_size[0] * m.kernel_size[1] * m.out_channels
        m.weight.data.normal_(0, np.sqrt(2. / n))
      elif isinstance(m, nn.BatchNorm2d):
        m.weight.data.fill_(1)
        m.bias.data.zero_()

  def forward(self, depth_input, rgb_input):
    d1 = self.depth_layer1(depth_input)
    d2 = self.depth_layer2(d1)
    d3 = self.depth_layer3(d2)
    d4 = self.depth_layer4(d3)
    r1 = self.rgb_layer1(rgb_input)
    r2 = self.rgb_layer2(r1)
    r3 = self.rgb_layer3(r2)
    f1 = self.fusion_layer1(torch.cat((d1, r1), 1))
    f2 = self.fusion_layer2(torch.cat((d2, r2), 1))
    f3 = self.fusion_layer3(torch.cat((d3, r3), 1))
    d5 = self.depth_layer5(torch.cat((f3, d4), 1))
    d6 = self.depth_layer6(torch.cat((f2, d5), 1))
    d7 = self.depth_layer7(torch.cat((f1, d6), 1))
    return d7 * self.maxdepth


class ModeFusionT(nn.Module):
  def __init__(self, maxdepth, channels, inplanes):
    super().__init__()
    self.feature_extraction = FeatureExtractionFusionT(maxdepth, channels,
                                                       inplanes)

  def forward(self, depthes, confs, rgbs):
    dc = []
    for i in range(len(depthes)):
      dc.append(depthes[i])
      dc.append(confs[i])
    return self.feature_extraction(torch.cat(dc, 1), torch.cat(rgbs, 1))
