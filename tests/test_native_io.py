"""Native IO runtime (libmodeio.so) vs PIL/numpy golden decodes."""

import numpy as np
import pytest
from PIL import Image

from mode_tpu.data import native_io
from mode_tpu.data.preprocess import rgb_to_tensor

pytestmark = pytest.mark.skipif(not native_io.available(),
                                reason="libmodeio.so not built")


def test_png_roundtrip(tmp_path, rng):
  for ch, mode in [(3, "RGB"), (1, "L"), (4, "RGBA")]:
    img = rng.integers(0, 255, size=(37, 53, ch), dtype=np.uint8)
    pil = Image.fromarray(img[..., 0] if ch == 1 else img, mode=mode)
    p = str(tmp_path / f"t{ch}.png")
    pil.save(p)
    got = native_io.decode_png(p)
    want = np.asarray(Image.open(p))
    if want.ndim == 2:
      want = want[..., None]
    np.testing.assert_array_equal(got, want)


def test_batch_normalized_matches_python(tmp_path, rng):
  paths = []
  for i in range(5):
    img = rng.integers(0, 255, size=(24, 16, 3), dtype=np.uint8)
    p = str(tmp_path / f"b{i}.png")
    Image.fromarray(img).save(p)
    paths.append(p)
  got = native_io.decode_rgb_batch_normalized(paths, 24, 16, threads=3)
  for i, p in enumerate(paths):
    want = rgb_to_tensor(Image.open(p).convert("RGB"))
    np.testing.assert_allclose(got[i], want, rtol=1e-5, atol=1e-6)


def test_batch_u8_and_device_normalize(tmp_path, rng):
  """uint8 decode + on-device normalize == host-normalized float decode."""
  paths = []
  for i in range(4):
    img = rng.integers(0, 255, size=(24, 16, 3), dtype=np.uint8)
    p = str(tmp_path / f"u{i}.png")
    Image.fromarray(img).save(p)
    paths.append(p)
  u8 = native_io.decode_rgb_batch_u8(paths, 24, 16, threads=2)
  for i, p in enumerate(paths):
    np.testing.assert_array_equal(u8[i], np.asarray(Image.open(p)))
  from mode_tpu.training import normalize_rgb_on_device
  host = native_io.decode_rgb_batch_normalized(paths, 24, 16, threads=2)
  dev = np.asarray(normalize_rgb_on_device(u8))
  np.testing.assert_allclose(dev, host, rtol=1e-5, atol=1e-6)


def test_npz_variants(tmp_path, rng):
  a32 = rng.normal(size=(17, 9)).astype(np.float32)
  p1 = str(tmp_path / "a.npz")
  np.savez(p1, a32)                      # stored (no compression)
  np.testing.assert_array_equal(native_io.read_npz(p1, a32.shape), a32)

  p2 = str(tmp_path / "b.npz")
  np.savez_compressed(p2, a32)           # deflate
  np.testing.assert_array_equal(native_io.read_npz(p2, a32.shape), a32)

  a64 = rng.normal(size=(8, 4)).astype(np.float64)
  p3 = str(tmp_path / "c.npz")
  np.savez(p3, a64)                      # f8 -> f32 cast
  np.testing.assert_allclose(native_io.read_npz(p3, a64.shape),
                             a64.astype(np.float32))

  p4 = str(tmp_path / "d.npy")
  np.save(p4, a32)                       # raw npy
  np.testing.assert_array_equal(native_io.read_npz(p4, a32.shape), a32)


def test_npz_batch(tmp_path, rng):
  paths = []
  arrs = []
  for i in range(7):
    a = rng.normal(size=(6, 5)).astype(np.float32)
    p = str(tmp_path / f"n{i}.npz")
    np.savez(p, a)
    paths.append(p)
    arrs.append(a)
  got = native_io.read_npz_batch(paths, (6, 5), threads=4)
  np.testing.assert_array_equal(got, np.stack(arrs))


def test_error_paths(tmp_path):
  with pytest.raises(IOError):
    native_io.read_npz(str(tmp_path / "missing.npz"), (2, 2))
  bad = tmp_path / "bad.png"
  bad.write_bytes(b"not a png")
  with pytest.raises(IOError):
    native_io.decode_png(str(bad))


def test_fusion_get_batch_matches_items(tmp_path):
  """Deep360DatasetFusion.get_batch (batched native 12-PNG + 7-NPZ ingest)
  == stacked per-item PIL/numpy decodes."""
  from mode_tpu.data.deep360 import Deep360DatasetFusion
  from mode_tpu.data.file_lists import list_deep360_fusion_train
  from tests.synth_data import make_deep360_tree, make_fusion_inputs

  ds_root = str(tmp_path / "dataset")
  in_root = str(tmp_path / "inputs")
  make_deep360_tree(ds_root, episodes=("ep1_t",), frames_per_subset=3,
                    h=32, w=16, subsets=("training", "validation"))
  make_fusion_inputs(in_root, ds_root)
  td, tc, tr, tg, *_ = list_deep360_fusion_train(in_root, ds_root)
  ds = Deep360DatasetFusion(td, tc, tr, tg, resize=False, training=True)

  indices = [2, 0]
  batch = ds.get_batch(indices, threads=2)
  assert batch is not None, "native fusion ingest did not engage"
  for b, i in enumerate(indices):
    item = ds[i]
    assert batch["gtNames"][b] == item["gtNames"]
    np.testing.assert_allclose(batch["depths"][b], item["depths"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(batch["confs"][b], item["confs"],
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(batch["rgbs"][b], item["rgbs"],
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(batch["gt"][b], item["gt"],
                               rtol=1e-6, atol=1e-6)

  # resize mode must fall back to the per-item path
  ds_r = Deep360DatasetFusion(td, tc, tr, tg, resize=True, training=True)
  assert ds_r.get_batch(indices) is None
