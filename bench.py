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
benchmarks/parity_report.py). Refinement caches the three iteration-
invariant quantities (target embedding, target encoder memory, source
spatial-kNN selection — see vcrnet_iter; tests/test_models.py proves the
cached path equals the naive one).

``python bench.py --accuracy`` instead prints a per-protocol rot/trans
RMSE table (fast profile vs exact-f32, pretrained embedding, deterministic
synthetic eval set) so throughput claims carry their accuracy.

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


def _reuse_knob() -> dict:
    """Parse VCRNET_REUSE_FEATURE_KNN into Config kwargs (single source for
    both the throughput and --accuracy paths). '' / '0' / 'false' / 'off' =
    reuse OFF; a positive integer enables reuse with that refresh count;
    any other truthy value = refresh 1."""
    import os

    v = os.environ.get("VCRNET_REUSE_FEATURE_KNN", "").strip().lower()
    if v in ("", "0", "false", "off", "no"):
        return {"reuse_feature_knn": False, "feature_knn_refresh": 1}
    refresh = int(v) if v.isdigit() else 1
    return {
        "reuse_feature_knn": True,
        "feature_knn_refresh": max(1, refresh),
    }


def _subsample_knob() -> dict:
    """Parse VCRNET_REFINE_SUBSAMPLE into Config kwargs: M = run
    refinement iterations 2+ on the first M points (whole mode only,
    models/vcrnet.py). '' / '0' / non-numeric = off."""
    import os

    v = os.environ.get("VCRNET_REFINE_SUBSAMPLE", "").strip()
    return {"refine_subsample": int(v) if v.isdigit() else 0}


def _model_and_inputs(batch: int, partial: bool, n_iter: int):
    import os

    import jax
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet

    # A/B knob for the approximate feature-graph reuse across refinement
    # iterations: VCRNET_REUSE_FEATURE_KNN=<refresh count> (1 = reuse
    # iteration 1's graph everywhere, 2 = refresh once at iteration 2).
    # Accuracy side: --accuracy with the same env var.
    cfg = Config(
        num_points=1024, emb_dims=512, compute_dtype="bfloat16",
        partial=partial, overlap=0.575 if partial else 0.75, iter=n_iter,
        **_reuse_knob(), **_subsample_knob(),
    )
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    n = cfg.n_cropped if partial else cfg.num_points
    src = rng.rand(batch, n, 3).astype(np.float32) - 0.5
    tgt = rng.rand(batch, n, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    return model, variables, src, tgt


def bench_protocol(
    batch: int, partial: bool, n_iter: int, t_short: int = 2,
    t_long: int = 8, reps: int = 5,
) -> float:
    """Per-batch eval step time via CHAINED-SCAN differencing: run the
    protocol T times inside one jit (each step's source perturbed by the
    previous step's output so nothing is elided), time T_long and T_short,
    and report (T_long - T_short) steps' delta. On this tunnel-backed
    platform a host fetch costs ~30 ms RTT and ``block_until_ready`` does
    not reliably wait, so per-call timing overstates step time by the RTT;
    differencing cancels it. This is the number a pipelined eval loop
    (train/engine.py prefetches and never syncs per batch) actually sees.
    """
    import jax
    import jax.numpy as jnp
    from vcrnet_tpu.models.vcrnet import vcrnet_iter

    model, variables, src, tgt = _model_and_inputs(batch, partial, n_iter)

    if n_iter <= 1:
        fwd = lambda v, s, t: model.apply(v, s, t)
    else:
        fwd = lambda v, s, t: vcrnet_iter(
            lambda vv, a, b: model.apply(vv, a, b),
            v, s, t, n_iter, model=model,
        )
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)

    def chained(s0, n_steps):
        def body(s, _):
            out = fwd(variables, s, tgt_d)
            # data-dependent perturbation keeps steps sequential under jit
            return s + 1e-9 * out[3][:, None, :], out[3].ravel()[0]

        s, _ = jax.lax.scan(body, s0, None, length=n_steps)
        return s.ravel()[0]

    fns = {}
    for T in (t_short, t_long):
        fns[T] = jax.jit(lambda s, TT=T: chained(s, TT))
        np.asarray(fns[T](src_d))  # compile + warm
    deltas = []
    for _ in range(reps):
        timed = {}
        for T in (t_short, t_long):
            t0 = time.perf_counter()
            np.asarray(fns[T](src_d))
            timed[T] = time.perf_counter() - t0
        deltas.append((timed[t_long] - timed[t_short]) / (t_long - t_short))
    dt = float(np.median(deltas))
    if dt <= 0:  # tunnel noise swamped the differencing; retry signal
        raise RuntimeError(f"non-positive step delta {dt}")
    return batch / dt


def _best_over_batches(partial: bool, n_iter: int, batches) -> float:
    best = 0.0
    for batch in batches:
        ok = False
        for _attempt in range(2):  # tunnel hiccups happen; retry once
            try:
                best = max(
                    best, bench_protocol(batch, partial, n_iter)
                )
                ok = True
                break
            except Exception:
                traceback.print_exc(file=sys.stderr)
        if not ok:
            # a batch that failed twice (typically OOM) will not get
            # better at larger sizes — stop sweeping, keep what we have
            break
    return best


def accuracy_report(n_items: int = 96) -> dict:
    """Per-protocol rot/trans RMSE under the BENCHED fast profile and the
    exact-f32 path (pretrained LPDNet embedding, deterministic synthetic
    eval set from the reference-parity pipeline) — so the throughput claims
    carry their accuracy. End-task absolute RMSE on real ModelNet40 needs
    the real h5 + a trained head (docs/RUNBOOK_MODELNET40.md); this block
    proves the SPEED knobs don't move the metrics (delta columns)."""
    import jax
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.data import SyntheticDataset, Loader
    from vcrnet_tpu.train import Trainer
    from vcrnet_tpu.train.checkpoint import (
        load_t7_lpdnet, merge_pretrained_embedding,
    )

    t7 = "/root/reference/pretrained/lpd-pretrained.t7"
    protos = {
        "whole_iter1": dict(iter=1),
        "whole_iter3": dict(iter=3),
        "partial_iter3": dict(iter=3, partial=True, overlap=0.575),
    }
    out = {}
    for name, pkw in protos.items():
        row = {}
        for profile in ("fast", "exact"):
            kw = dict(
                num_points=1024, emb_dims=512, test_batch_size=24, **pkw
            )
            if profile == "fast":
                kw.update(
                    compute_dtype="bfloat16",
                    **_reuse_knob(), **_subsample_knob(),
                )
            cfg = Config(**kw)
            trainer = Trainer(cfg)
            ds = SyntheticDataset(
                cfg, "test", n_items=n_items, cloud_points=2048
            )
            loader = Loader(
                ds, cfg.test_batch_size, shuffle=False, drop_last=False
            )
            state = trainer.init_state(
                jax.random.PRNGKey(cfg.seed), next(iter(loader))
            )
            state = state.replace(
                params=merge_pretrained_embedding(
                    state.params, load_t7_lpdnet(t7)
                )
            )
            s = trainer.eval_epoch(state, loader)
            row[profile] = {
                "rot_RMSE_deg": round(float(s["rot_ab_RMSE"]), 4),
                "trans_RMSE": round(float(s["trans_ab_RMSE"]), 6),
            }
        row["delta"] = {
            "rot_RMSE_deg": round(
                abs(
                    row["fast"]["rot_RMSE_deg"]
                    - row["exact"]["rot_RMSE_deg"]
                ),
                4,
            ),
            "trans_RMSE": round(
                abs(row["fast"]["trans_RMSE"] - row["exact"]["trans_RMSE"]),
                6,
            ),
        }
        out[name] = row
    return out


def _probe_tpu_responsive(timeout_s: float = 240.0) -> None:
    """Fail fast (clear error, nonzero exit) when the tunnel TPU is hung.

    The tunnel backend can wedge so hard that even ``jax.devices()`` blocks
    forever (observed in-session); without this guard a bench run would
    hang silently instead of surfacing a failure. The probe runs in a
    SUBPROCESS so a hang cannot take the parent down with it. Outages are
    often transient (minutes-to-hours), so after the first two fast
    attempts the probe keeps retrying once a minute inside a bounded
    window (VCRNET_TPU_PROBE_WINDOW_S, default 45 min) before giving up —
    a round-end bench run should survive a tunnel flap, not fail on it.
    Set VCRNET_SKIP_TPU_PROBE=1 to bypass (tests monkeypatch this
    function)."""
    import os
    import subprocess
    import time

    if os.environ.get("VCRNET_SKIP_TPU_PROBE"):
        return

    window_s = float(os.environ.get("VCRNET_TPU_PROBE_WINDOW_S", "2700"))
    code = (
        "import numpy as np, jax\n"
        "x = jax.jit(lambda a: a @ a)(np.ones((128, 128), np.float32))\n"
        "assert float(np.asarray(x)[0, 0]) == 128.0\n"
        "print('tpu-probe-ok')\n"
    )
    t0 = time.monotonic()
    attempt = 0
    while True:
        attempt += 1
        try:
            r = subprocess.run(
                [sys.executable, "-c", code], timeout=timeout_s,
                capture_output=True, text=True,
            )
            if "tpu-probe-ok" in r.stdout:
                return
            sys.stderr.write(
                f"tpu probe attempt {attempt} failed "
                f"(rc={r.returncode}):\n{r.stderr[-2000:]}\n"
            )
        except subprocess.TimeoutExpired:
            sys.stderr.write(
                f"tpu probe attempt {attempt} timed out "
                f"after {timeout_s:.0f}s\n"
            )
        elapsed = time.monotonic() - t0
        if attempt >= 2 and elapsed >= window_s:
            raise RuntimeError(
                f"TPU unresponsive: a trivial jit+fetch failed "
                f"{attempt} times over {elapsed / 60:.0f} min "
                "— tunnel/backend outage, not a model regression"
            )
        if attempt >= 2:
            time.sleep(60.0)


def main():
    _probe_tpu_responsive()  # before EVERY mode — --accuracy is the
    # longest-running one and must not hang silently on a dead tunnel
    if "--accuracy" in sys.argv:
        print(json.dumps({"accuracy": accuracy_report()}))
        return
    configs = {}
    configs["whole_iter1"] = _best_over_batches(
        False, 1, (64, 128, 256, 512)
    )
    if configs["whole_iter1"] == 0.0:
        # the headline config failed outright — fail fast rather than
        # spending many more tunnel-TPU minutes on the other protocols
        raise RuntimeError("headline configuration (whole_iter1) failed")
    configs["whole_iter3"] = _best_over_batches(False, 3, (64, 128, 256))
    configs["partial_iter3"] = _best_over_batches(True, 3, (64, 128, 256))
    failed = sorted(k for k, v in configs.items() if v == 0.0)
    value = configs["whole_iter1"]
    result = {
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
    if failed:
        # make partial failures visible instead of reporting a silent 0.0
        result["failed_configs"] = failed
    print(json.dumps(result))


if __name__ == "__main__":
    main()
