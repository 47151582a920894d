"""Tracing / profiling subsystem.

The reference has no profiler — only wall-clock prints
(``/root/reference/train_disparity.py:234``). This is the superior
TPU-native equivalent: ``jax.profiler`` traces viewable in
TensorBoard/Perfetto, an annotation context for named regions, and a
wall-clock step timer whose summaries land in the same TensorBoard event
files the trainers already write.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
  """Capture a device trace into ``log_dir`` (no-op when None).

  View with TensorBoard's profile plugin or Perfetto.
  """
  if not log_dir:
    yield
    return
  jax.profiler.start_trace(log_dir)
  try:
    yield
  finally:
    jax.profiler.stop_trace()


def annotate(name: str):
  """Named region that shows up in profiler traces."""
  return jax.profiler.TraceAnnotation(name)


class StepTimer:
  """Rolling wall-clock timing of train steps, TensorBoard-loggable."""

  def __init__(self, writer=None, tag: str = "step_time_ms",
               window: int = 50):
    self.writer = writer
    self.tag = tag
    self.window = window
    self._times: list[float] = []
    self._t0: Optional[float] = None

  def start(self):
    self._t0 = time.time()

  def stop(self, step: int):
    if self._t0 is None:
      return
    dt = (time.time() - self._t0) * 1e3
    self._times.append(dt)
    if len(self._times) > self.window:
      self._times.pop(0)
    if self.writer is not None:
      self.writer.add_scalar(self.tag, dt, step)
    self._t0 = None

  @property
  def mean_ms(self) -> float:
    return sum(self._times) / max(len(self._times), 1)
