"""Trace-time algorithmic-FLOP meter for the Pallas kernels.

XLA's ``lowered.cost_analysis()`` counts Pallas kernels as opaque
custom-calls with ZERO flops, so any MFU computed from it alone
undercounts exactly the ops this framework moved into kernels (flash
attention, fused kNN distance matrices, in-kernel edge convs). The
meter closes that gap: each public kernel wrapper reports its
*algorithmic* FLOPs at trace time, and a harness that traces one step
under ``meter()`` gets the per-step supplement to add to XLA's count.

Convention (documented for the bench consumer):
  * counted: matmul-shaped algorithmic work — attention score/value
    matmuls, pairwise-distance matrices, in-kernel convolutions and
    dense projections (2*M*N*K per matmul);
  * NOT counted: selection scans, gathers/scatters (incl. the one-hot
    gather matmuls — implementation detail, not algorithmic work), max
    pools, softmax transcendentals. MFU is therefore a conservative
    "useful flops" fraction, comparable to the usual 6ND-style counts.

Trace-time counting means: a call site inside ``lax.scan`` is counted
once (multiply by the scan length yourself — the bench traces an
UNSCANNED single step); duplicate call sites that XLA later CSEs are
counted per call site (documented ~7% overcount on the unrolled
refinement loop, where the iteration-invariant decoder self-attention
prefix is deduplicated by the compiler).
"""

from __future__ import annotations

import contextlib
import threading

_state = threading.local()


def add(flops: float) -> None:
    """Record algorithmic FLOPs for one kernel call (no-op outside meter())."""
    acc = getattr(_state, "acc", None)
    if acc is not None:
        acc[0] += float(flops)


@contextlib.contextmanager
def meter():
    """Collect kernel-reported FLOPs during tracing; yields a 1-elem list
    whose [0] holds the running total."""
    prev = getattr(_state, "acc", None)
    acc = [0.0]
    _state.acc = acc
    try:
        yield acc
    finally:
        _state.acc = prev


def matmul(m: float, n: float, k: float, count: float = 1.0) -> float:
    """FLOPs of ``count`` [m,k]x[k,n] matmuls."""
    return 2.0 * m * n * k * count


def attention(b: float, h: float, nq: float, nk: float, dk: float,
              passes: float = 2.0) -> float:
    """Score (QK^T) + value (PV) matmuls are one "pass" pair each of
    2*b*h*nq*nk*dk; a standard forward is passes=2 (scores + values)."""
    return 2.0 * b * h * nq * nk * dk * passes


def pairwise_dist(b: float, n: float, m: float, d: float) -> float:
    """-|x|^2 + 2 x.y^T - |y|^2 distance matrix: the x@y^T matmul term."""
    return 2.0 * b * n * m * d
