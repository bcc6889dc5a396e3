"""Observability: text log, TensorBoard scalars, step timing, profiler.

Capability parity with the reference (SURVEY.md C25):
  IOStream       — stdout + run.log tee (reference util/initPara.py:77-90)
  MetricsWriter  — tensorboardX scalars per epoch (reference initPara.py:208,
                   vcrnet_model.py:997-1010), gracefully disabled when
                   tensorboardX is unavailable
Upgrades the reference lacked:
  StepTimer      — steps/sec & pairs/sec EMA without per-step host syncs
  profile_trace  — jax.profiler trace context for TPU timeline capture
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional


class IOStream:
    """print + append to a logfile (reference util/initPara.py:77-90)."""

    def __init__(self, path: str):
        self.f = open(path, "a")

    def cprint(self, text: str):
        print(text)
        self.f.write(text + "\n")
        self.f.flush()

    def close(self):
        self.f.close()


class MetricsWriter:
    """TensorBoard scalar writer; no-op if tensorboardX is missing."""

    def __init__(self, log_dir: Optional[str]):
        self._writer = None
        if log_dir is None:
            return
        try:
            from tensorboardX import SummaryWriter

            self._writer = SummaryWriter(log_dir=log_dir)
        except Exception:
            self._writer = None

    def scalar(self, tag: str, value: float, step: int):
        if self._writer is not None:
            self._writer.add_scalar(tag, value, step)

    def scalars(self, prefix: str, values: dict, step: int):
        for k, v in values.items():
            if isinstance(v, (int, float)):
                self.scalar(f"{prefix}/{k}", v, step)

    def close(self):
        if self._writer is not None:
            self._writer.close()


class StepTimer:
    """Wall-clock steps/sec with exponential smoothing."""

    def __init__(self, ema: float = 0.9):
        self.ema = ema
        self._last = None
        self.step_time = None

    def tick(self) -> Optional[float]:
        now = time.perf_counter()
        if self._last is not None:
            dt = now - self._last
            self.step_time = (
                dt if self.step_time is None
                else self.ema * self.step_time + (1 - self.ema) * dt
            )
        self._last = now
        return self.step_time

    def rate(self, items_per_step: int = 1) -> Optional[float]:
        return (
            items_per_step / self.step_time if self.step_time else None
        )


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str]):
    """jax.profiler trace context; no-op when log_dir is None."""
    if log_dir is None:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
