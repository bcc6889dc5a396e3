#!/usr/bin/env python
"""Benchmark: ModelNet40 registration pairs/sec on the flagship VCR-Net
eval path (full model: LPDNet embedding + transformer pointer + topK VCP +
SVD solve, N=1024 points, emb_dims=512 — the reference's default config).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "pairs/s", "vs_baseline": N / 5000}
vs_baseline is against the driver's north star of 5,000 pairs/sec
(BASELINE.json; the reference publishes no numbers of its own).
"""

from __future__ import annotations

import json
import time

import numpy as np


def bench_eval_throughput(batch: int = 64, iters: int = 20, warmup: int = 3):
    import jax
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet

    cfg = Config(num_points=1024, emb_dims=512)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(batch, cfg.num_points, 3).astype(np.float32) - 0.5
    tgt = rng.rand(batch, cfg.num_points, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    fwd = jax.jit(lambda v, s, t: model.apply(v, s, t))
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)

    # warmup / compile. NOTE: we force a host fetch of the (tiny) rotation
    # output every iteration — on this tunnel-backed platform
    # block_until_ready alone does not reliably wait for execution, which
    # inflates async-chained timings ~1000x.
    for _ in range(warmup):
        out = fwd(variables, src_d, tgt_d)
        np.asarray(out[2])

    t0 = time.perf_counter()
    for _ in range(iters):
        out = fwd(variables, src_d, tgt_d)
        np.asarray(out[2])
    dt = time.perf_counter() - t0
    return batch * iters / dt


def main():
    best = 0.0
    for batch in (32, 64, 128):
        try:
            pairs_per_sec = bench_eval_throughput(batch=batch)
        except Exception:
            break
        best = max(best, pairs_per_sec)
    print(
        json.dumps(
            {
                "metric": "modelnet40_vcrnet_eval_pairs_per_sec",
                "value": round(best, 2),
                "unit": "pairs/s",
                "vs_baseline": round(best / 5000.0, 4),
            }
        )
    )


if __name__ == "__main__":
    main()
