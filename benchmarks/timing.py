"""Shared chained-scan timing helper for the TPU benchmarks.

On this tunnel-backed platform a host fetch costs ~30 ms RTT and
``block_until_ready`` does not reliably wait, so per-call timing overstates
step time by the round trip. ``chain_time`` runs T1- and T2-iteration
``lax.scan`` chains (each step data-dependent on the previous so nothing is
elided), times both with a single fetch each, and reports the per-step
delta — pure device time, fetch latency cancelled. The median over ``reps``
suppresses tunnel jitter (day-to-day variance on this TPU is ~±8%; within
a session the median of 5 is stable to ~1-2%).
"""

from __future__ import annotations

import time

import numpy as np
import jax


def chain_time(fn, x0, T1=2, T2=10, reps=5):
    """Median per-step device time of ``fn`` (an array -> same-shape-array
    step function) via chained-scan differencing."""

    def chained(x, iters):
        def body(c, _):
            return fn(c), c.ravel()[0]

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.ravel()[0]

    fns = {}
    for T in (T1, T2):
        fns[T] = jax.jit(lambda x, TT=T: chained(x, TT))
        np.asarray(fns[T](x0))  # compile + warm
    deltas = []
    for _ in range(reps):
        out = {}
        for T in (T1, T2):
            t0 = time.perf_counter()
            np.asarray(fns[T](x0))
            out[T] = time.perf_counter() - t0
        deltas.append((out[T2] - out[T1]) / (T2 - T1))
    return float(np.median(deltas))
