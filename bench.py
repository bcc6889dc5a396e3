#!/usr/bin/env python
"""Benchmark: ModelNet40 registration pairs/sec on the flagship VCR-Net,
covering the reference's THREE eval protocols (README.md:25-41):

  whole_iter1    whole-whole, single forward      (reference test default)
  whole_iter3    whole-whole, --iter 3 refinement (paper protocol)
  partial_iter3  part-part, --overlap 0.575 --iter 3

All on the full model (LPDNet embedding + transformer pointer + topK VCP +
SVD solve, N=1024, emb_dims=512 — the reference's default config), fast TPU
profile (bf16 MXU matmuls, fused Pallas kernels, flash attention; accuracy
parity vs exact f32 validated in tests/test_fastpath.py and
benchmarks/parity_report.py). Refinement uses the exact cached-target-
embedding optimization (tests/test_models.py proves exactness).

Prints ONE JSON line. Headline value = whole_iter1 pairs/s/chip (the
reference's test default); per-protocol numbers in "configs". The driver
north star is >=5,000 pairs/sec on a v5e-8 at reference RMSE, i.e. 625
pairs/sec/chip; eval data parallelism has no cross-batch coupling, so
per-chip is the honest unit (multi-chip sharding is validated separately by
the driver's dryrun_multichip).
"""

from __future__ import annotations

import json
import sys
import time
import traceback

import numpy as np

# persistent XLA/Mosaic compilation cache: the fused Pallas kernels take
# minutes to compile cold; warm runs load from cache
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

NORTH_STAR = 625.0  # pairs/s/chip


def _model_and_inputs(batch: int, partial: bool, n_iter: int):
    import jax
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet

    cfg = Config(
        num_points=1024, emb_dims=512, compute_dtype="bfloat16",
        partial=partial, overlap=0.575 if partial else 0.75, iter=n_iter,
    )
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    n = cfg.n_cropped if partial else cfg.num_points
    src = rng.rand(batch, n, 3).astype(np.float32) - 0.5
    tgt = rng.rand(batch, n, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    return model, variables, src, tgt


def bench_protocol(
    batch: int, partial: bool, n_iter: int, iters: int = 20, warmup: int = 3
) -> float:
    import jax
    from vcrnet_tpu.models.vcrnet import vcrnet_iter

    model, variables, src, tgt = _model_and_inputs(batch, partial, n_iter)

    if n_iter <= 1:
        fwd = jax.jit(lambda v, s, t: model.apply(v, s, t))
    else:
        fwd = jax.jit(
            lambda v, s, t: vcrnet_iter(
                lambda vv, a, b: model.apply(vv, a, b),
                v, s, t, n_iter, model=model,
            )
        )
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)

    # NOTE: we force a host fetch of the (tiny) rotation output — on this
    # tunnel-backed platform block_until_ready alone does not reliably wait
    # for execution. Fetches are pipelined two steps behind dispatch so
    # device compute overlaps the tunnel's fetch latency (as it would in a
    # real eval loop).
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


def _best_over_batches(partial: bool, n_iter: int, batches) -> float:
    best = 0.0
    for batch in batches:
        for _attempt in range(2):  # tunnel hiccups happen; retry once
            try:
                best = max(
                    best, bench_protocol(batch, partial, n_iter)
                )
                break
            except Exception:
                traceback.print_exc(file=sys.stderr)
    return best


def main():
    configs = {}
    configs["whole_iter1"] = _best_over_batches(
        False, 1, (64, 128, 256, 512)
    )
    configs["whole_iter3"] = _best_over_batches(False, 3, (64, 128, 256))
    configs["partial_iter3"] = _best_over_batches(True, 3, (64, 128, 256))
    if configs["whole_iter1"] == 0.0:
        raise RuntimeError("all benchmark configurations failed")
    value = configs["whole_iter1"]
    print(
        json.dumps(
            {
                "metric": "modelnet40_vcrnet_eval_pairs_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "pairs/s/chip",
                "vs_baseline": round(value / NORTH_STAR, 4),
                "configs": {
                    k: {
                        "pairs_per_sec_per_chip": round(v, 2),
                        "vs_baseline": round(v / NORTH_STAR, 4),
                    }
                    for k, v in configs.items()
                },
            }
        )
    )


if __name__ == "__main__":
    main()
