"""Threaded batching data loader.

Replaces torch's multi-process ``DataLoader`` (used by every reference CLI,
e.g. ``train_disparity.py:257-258``) with a thread-pool prefetcher: decode is
numpy/PIL (GIL-releasing) so threads scale, batches are collated into pinned
numpy arrays ready for a single host→device transfer, and a bounded queue
keeps a configurable number of batches in flight ahead of the accelerator.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Any, Iterator, Sequence

import numpy as np


def default_collate(items: Sequence[dict]) -> dict:
  """Stack numpy leaves; collect non-array leaves (names) into lists."""
  out: dict[str, Any] = {}
  for key in items[0]:
    vals = [it[key] for it in items]
    if isinstance(vals[0], np.ndarray):
      out[key] = np.stack(vals)
    elif isinstance(vals[0], (int, float, np.floating, np.integer)):
      out[key] = np.asarray(vals)
    else:
      out[key] = list(vals)
  return out


class DataLoader:
  """Iterable over collated batches with background prefetch.

  Args mirror torch's: dataset (len/getitem), batch_size, shuffle (epoch-
  seeded), num_workers (decode threads), drop_last, prefetch (batches kept
  in flight).
  """

  def __init__(self, dataset, batch_size: int = 1, shuffle: bool = False,
               num_workers: int = 4, drop_last: bool = False,
               seed: int = 0, prefetch: int = 2, collate=default_collate):
    self.dataset = dataset
    self.batch_size = batch_size
    self.shuffle = shuffle
    self.num_workers = max(1, num_workers)
    self.drop_last = drop_last
    self.seed = seed
    self.prefetch = max(1, prefetch)
    self.collate = collate
    self.epoch = 0

  def set_epoch(self, epoch: int):
    self.epoch = epoch

  def __len__(self):
    n = len(self.dataset)
    if self.drop_last:
      return n // self.batch_size
    return (n + self.batch_size - 1) // self.batch_size

  def _batches(self) -> list[list[int]]:
    idx = np.arange(len(self.dataset))
    if self.shuffle:
      rng = np.random.default_rng(self.seed + self.epoch)
      rng.shuffle(idx)
    batches = [idx[i:i + self.batch_size].tolist()
               for i in range(0, len(idx), self.batch_size)]
    if self.drop_last and batches and len(batches[-1]) < self.batch_size:
      batches.pop()
    return batches

  def __iter__(self) -> Iterator[dict]:
    batches = self._batches()
    q: queue.Queue = queue.Queue(maxsize=self.prefetch)
    stop = threading.Event()

    get_batch = getattr(self.dataset, "get_batch", None)

    def produce():
      with ThreadPoolExecutor(self.num_workers) as pool:
        try:
          for batch_idx in batches:
            if stop.is_set():
              return
            if get_batch is not None:
              batch = get_batch(batch_idx, self.num_workers)
              if batch is None:     # dataset declined (fallback path)
                items = list(pool.map(self.dataset.__getitem__, batch_idx))
                batch = self.collate(items)
              q.put(batch)
              continue
            items = list(pool.map(self.dataset.__getitem__, batch_idx))
            q.put(self.collate(items))
        except Exception as e:  # surface worker errors to the consumer
          q.put(e)
        finally:
          q.put(None)

    t = threading.Thread(target=produce, daemon=True)
    t.start()
    try:
      while True:
        item = q.get()
        if item is None:
          return
        if isinstance(item, Exception):
          raise item
        yield item
    finally:
      stop.set()
      # drain so the producer can exit
      while t.is_alive():
        try:
          q.get_nowait()
        except queue.Empty:
          break
