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


class Progress:
    """tqdm-style single-line progress for batch loops (the reference wraps
    every loop in tqdm, e.g. model/vcrnet_model.py:655). Counts host-side
    batch submissions only — no device syncs — so it never perturbs step
    pipelining. Renders to stderr when it is a TTY; VCRNET_PROGRESS=1
    forces it on (e.g. piped logs), VCRNET_PROGRESS=0 forces it off."""

    def __init__(self, total: Optional[int] = None, desc: str = ""):
        import os
        import sys

        self.total = total
        self.desc = desc
        self.n = 0
        self._t0 = time.perf_counter()
        self._last_render = 0.0
        self._file = sys.stderr
        force = os.environ.get("VCRNET_PROGRESS", "")
        if force == "0":
            self.enabled = False
        elif force:
            self.enabled = True
        else:
            self.enabled = bool(
                getattr(self._file, "isatty", lambda: False)()
            )

    def update(self, k: int = 1) -> None:
        self.n += k
        if not self.enabled:
            return
        now = time.perf_counter()
        done = self.total is not None and self.n >= self.total
        if now - self._last_render < 0.25 and not done:
            return
        self._last_render = now
        elapsed = now - self._t0
        rate = self.n / elapsed if elapsed > 0 else 0.0
        if self.total:
            eta = (self.total - self.n) / rate if rate > 0 else 0.0
            msg = (
                f"\r{self.desc}: {self.n}/{self.total} "
                f"[{elapsed:.0f}s<{eta:.0f}s, {rate:.2f} batch/s]"
            )
        else:
            msg = f"\r{self.desc}: {self.n} [{elapsed:.0f}s, {rate:.2f} batch/s]"
        self._file.write(msg)
        self._file.flush()

    def close(self) -> None:
        if self.enabled and self.n:
            self._file.write("\n")
            self._file.flush()

    def wrap(self, iterable, total: Optional[int] = None):
        """Yield from ``iterable`` with a progress tick per item."""
        if total is not None:
            self.total = total
        elif self.total is None:
            try:
                self.total = len(iterable)
            except TypeError:
                pass
        try:
            for item in iterable:
                yield item
                self.update()
        finally:
            self.close()


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
