#!/usr/bin/env python
"""Benchmark: ModelNet40 registration pairs/sec on the flagship VCR-Net
eval path (full model: LPDNet embedding + transformer pointer + topK VCP +
SVD solve, N=1024 points, emb_dims=512 — the reference's default config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s/chip", "vs_baseline": N / 625}
The driver north star is >=5,000 pairs/sec on a v5e-8 (8 chips) at reference
RMSE (BASELINE.json; the reference itself publishes no numbers), i.e.
625 pairs/sec/chip. This bench runs on ONE chip, so vs_baseline is
value / 625; data parallelism over the 8-chip mesh is embarrassingly
parallel for eval (no cross-batch coupling), making per-chip the honest
unit.
"""

from __future__ import annotations

import json
import time

import numpy as np

# persistent XLA/Mosaic compilation cache: the fused Pallas kernels take
# minutes to compile cold; warm runs load from cache
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def bench_eval_throughput(batch: int = 64, iters: int = 20, warmup: int = 3):
    import jax
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet

    # fast TPU profile: bf16 MXU matmuls (f32 accumulation), fused Pallas
    # kNN (exact), flash attention — validated to <1 deg rotation deviation
    # from the full-f32 path (tests/test_fastpath.py)
    cfg = Config(num_points=1024, emb_dims=512, compute_dtype="bfloat16")
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(batch, cfg.num_points, 3).astype(np.float32) - 0.5
    tgt = rng.rand(batch, cfg.num_points, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    fwd = jax.jit(lambda v, s, t: model.apply(v, s, t))
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)

    # NOTE: we force a host fetch of the (tiny) rotation output — on this
    # tunnel-backed platform block_until_ready alone does not reliably wait
    # for execution, which inflates async-chained timings ~1000x. Fetches
    # are pipelined two steps behind dispatch so device compute overlaps
    # the tunnel's fetch latency (as it would in a real eval loop).
    from collections import deque

    for _ in range(warmup):
        out = fwd(variables, src_d, tgt_d)
        np.asarray(out[2])

    t0 = time.perf_counter()
    pending = deque()
    for _ in range(iters):
        pending.append(fwd(variables, src_d, tgt_d))
        if len(pending) > 2:
            np.asarray(pending.popleft()[2])
    while pending:
        np.asarray(pending.popleft()[2])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    import sys
    import traceback

    best = 0.0
    for batch in (64, 128, 256, 512):
        pairs_per_sec = None
        for attempt in range(2):  # tunnel hiccups happen; retry once
            try:
                pairs_per_sec = bench_eval_throughput(batch=batch)
                break
            except Exception:
                traceback.print_exc(file=sys.stderr)
        if pairs_per_sec is None:
            break
        best = max(best, pairs_per_sec)
    if best == 0.0:
        raise RuntimeError("all benchmark configurations failed")
    print(
        json.dumps(
            {
                "metric": "modelnet40_vcrnet_eval_pairs_per_sec_per_chip",
                "value": round(best, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(best / 625.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
