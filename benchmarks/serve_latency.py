"""Serving-latency benchmark for the Registrar API (vcrnet_tpu/serve.py).

Reports, per batch bucket:
  * DEVICE step latency via chained-scan — the number a co-located host
    approaches and what per-chip serving throughput scales from; this is
    the meaningful figure;
  * end-to-end request wall time (numpy in -> numpy R/t out) — on THIS
    tunnel-backed chip that is dominated by ~1 s (+-40% run-to-run) of
    per-dispatch tunnel latency, so it is reported only as a labeled
    environment artifact, not a framework property (measured: batching
    the four output fetches into one jax.device_get made no difference —
    the cost is the dispatch, not the fetch count).

Uses the committed trained checkpoint when present (same one the bench
accuracy block loads), else init weights — latency is weight-agnostic.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/serve_latency.py [num_points]
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from benchmarks.timing import chain_time  # noqa: E402


def main():
    num_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1024

    from flax import serialization
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet
    from vcrnet_tpu.serve import Registrar
    from vcrnet_tpu.train.checkpoint import merge_params

    cfg = Config(
        num_points=num_points, emb_dims=512, compute_dtype="bfloat16",
        iter=3,
    )
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    probe = rng.rand(1, num_points, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), probe, probe)

    ckpt = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "checkpoints", "pretrained", "vcrnet_shapes_best.msgpack",
    )
    weights = "init"
    if os.path.exists(ckpt):
        with open(ckpt, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        variables = dict(variables)
        variables["params"] = merge_params(
            serialization.to_state_dict(variables["params"]),
            raw.get("params", raw),
        )
        weights = os.path.basename(ckpt)

    buckets = (1, 8, 64)
    reg = Registrar(cfg, variables, buckets=buckets)
    print(f"weights={weights} N={num_points} iter={cfg.iter}")
    t0 = time.perf_counter()
    reg.warmup()
    print(f"warmup (compile {len(buckets)} buckets): "
          f"{time.perf_counter() - t0:.1f}s")

    for b in buckets:
        src = rng.rand(b, num_points, 3).astype(np.float32) - 0.5
        tgt = rng.rand(b, num_points, 3).astype(np.float32) - 0.5
        reg.register(src, tgt)  # shape-warm

        # device step time: chain the bucket's forward so the tunnel's
        # per-dispatch latency cancels (same method as bench.py)
        fwd = reg._forward(b)
        src_d = jax.device_put(src)
        tgt_d = jax.device_put(tgt)

        def step(s):
            R, t, _, _ = fwd(reg._variables, s, tgt_d)
            return s + 1e-9 * t[:, None, :].astype(s.dtype)

        dev = chain_time(step, src_d)

        reps = 5
        t0 = time.perf_counter()
        for _ in range(reps):
            out = reg.register(src, tgt)
            _ = np.asarray(out["R"])
        wall = (time.perf_counter() - t0) / reps
        print(
            f"bucket {b:3d}: device {dev * 1000:7.1f} ms/request "
            f"({b / dev:8.1f} pairs/s/chip) | tunnel end-to-end "
            f"{wall * 1000:7.1f} ms (environment artifact)"
        )


if __name__ == "__main__":
    main()
