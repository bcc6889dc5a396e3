#!/usr/bin/env python
"""Benchmark: every driver-named baseline config (BASELINE.json "configs"),
measured on device with CHAINED-SCAN differencing:

  whole_iter1    VCR-Net whole-whole eval, single forward (reference default)
  whole_iter3    VCR-Net whole-whole eval, --iter 3 refinement
  partial_iter3  VCR-Net part-part eval, --overlap 0.575 --iter 3
  vcrnet_train   VCR-Net TRAIN step (fwd + bwd + Adam, state kept live)
  lpd_pretrain   LPD-Net pre-train step (triplet loss, batch 16 — README.md:25)
  dcp_eval       DCP-style pipeline eval (DGCNN + transformer + SVD head)
  icp_eval       classical batched ICP eval (lax.while_loop, max_iter 50)

All VCR-Net numbers are the full model (LPDNet embedding + transformer
pointer + topK VCP + SVD solve, N=1024, emb_dims=512 — the reference's
default config), fast TPU profile (bf16 MXU matmuls, fused Pallas kernels,
flash attention; accuracy parity vs exact f32 validated in
tests/test_fastpath.py and benchmarks/parity_report.py).

TIME BUDGET (round-3 lesson: a bench that times out produces NOTHING).
The whole run operates under one wall-clock deadline
(VCRNET_BENCH_DEADLINE_S, default 1500 s):
  * each eval protocol runs ONE known-good batch size (64) by default;
    the 4-size sweep is behind ``--sweep``;
  * the TPU-responsiveness probe's retry window is clipped to fit the
    deadline;
  * a COMPLETE cumulative JSON result line is printed (flushed) after
    EVERY config finishes — if the driver kills the run mid-way, the last
    line on stdout is still a parseable partial result;
  * configs that would start with too little time left are marked
    ``{"skipped": "deadline"}`` instead of silently hanging;
  * per-step FLOPs come from the SAME AOT-compiled chained executables
    used for timing (cost-analysis differenced across the two scan
    lengths + the trace-time Pallas supplement) — no second lower+compile.

Each config carries an MFU estimate: analytic FLOPs divided by measured
step time and the chip's peak bf16 FLOP/s (device_kind table; override
with VCRNET_PEAK_BF16_FLOPS).

The final result also carries a compact ``accuracy`` block (fast profile
vs exact-f32 rot/trans RMSE per protocol, pretrained embedding,
deterministic synthetic eval set) when the deadline allows, so throughput
claims ship with their accuracy. ``python bench.py --accuracy`` runs the
fuller standalone report.

Prints cumulative JSON lines; the LAST line is the complete result.
Headline value = whole_iter1 pairs/s/chip (the reference's test default).
The driver north star is >=5,000 eval pairs/sec on a v5e-8 at reference
RMSE, i.e. 625 pairs/sec/chip; eval data parallelism has no cross-batch
coupling, so per-chip is the honest unit (multi-chip sharding is
validated separately by the driver's dryrun_multichip).

Timing note: on this tunnel-backed platform a host fetch costs ~30 ms RTT
and ``block_until_ready`` does not reliably wait, so per-call timing
overstates step time by the RTT; running T steps inside one jit (each
step's input perturbed by the previous step's output so nothing is elided)
and differencing two T values cancels it. Train harnesses MUST keep the
updated state live in the scan output — returning only losses[-1] lets XLA
dead-code-eliminate the backward+optimizer at T=1 (see CLAUDE.md).
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

NORTH_STAR = 625.0  # eval pairs/s/chip

# eval protocols count toward the north star; the others are reported with
# MFU only (the north star is an eval-throughput target)
_EVAL_CONFIGS = ("whole_iter1", "whole_iter3", "partial_iter3")

# wall-clock budget state (set in main); None = no deadline (library use)
_DEADLINE = None
_MIN_CONFIG_S = 150.0    # don't START a config with less than this left
_ACCURACY_MIN_S = 300.0  # don't start the accuracy block with less
# (the block also degrades per-protocol as the deadline nears)


def _remaining() -> float:
    if _DEADLINE is None:
        return float("inf")
    return _DEADLINE - time.monotonic()


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


def _peak_bf16_flops():
    """Per-chip peak bf16 FLOP/s for the MFU denominator, from device_kind.
    Returns None when unknown (MFU omitted rather than guessed)."""
    import os

    env = os.environ.get("VCRNET_PEAK_BF16_FLOPS", "").strip()
    if env:
        return float(env)
    try:
        import jax

        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return None
    if "v6" in kind:
        return 918e12
    if "v5e" in kind or "v5 lite" in kind or "v5litepod" in kind:
        return 197e12
    if "v5" in kind:  # v5p
        return 459e12
    if "v4" in kind:
        return 275e12
    return None


def _exe_flops(lowered, exe):
    """XLA-counted FLOPs of one compiled chained executable, or None."""
    for obj in (lowered, exe):
        try:
            ca = obj.cost_analysis()
        except Exception:
            continue
        if isinstance(ca, (list, tuple)):
            ca = ca[0] if ca else None
        if ca and float(ca.get("flops", 0.0)) > 0:
            return float(ca["flops"])
    return None


def _time_chained(
    make_chained, arg, t_short, t_long, reps: int = 5,
    measure_flops: bool = True,
):
    """AOT-compile the UNJITTED chained(T) function for two scan lengths,
    time both, and return ``(seconds_per_step, flops_per_step_or_None)``.

    ``make_chained(T)`` must return a plain function of ``arg`` whose
    output keeps all per-step work live (no DCE-able tails). FLOPs come
    from the SAME compiled executables used for timing — no second
    lower+compile. XLA cost analysis counts a scan/while body ONCE
    regardless of trip count (verified on this jax), so the chained
    executable's count IS per-step already; if the compiler instead
    unrolled the loop (counts scaling with T), the two-length difference
    recovers the per-step figure. The trace-time Pallas supplement is
    added on top (XLA counts custom calls as zero; each kernel wrapper
    reports its algorithmic FLOPs to ops/flop_meter.py once per call
    site — the scan body traces once, so the supplement is already
    per-step)."""
    import jax

    from vcrnet_tpu.ops import flop_meter

    exes, xla_flops = {}, {}
    supplement = 0.0
    for T in (t_short, t_long):
        with flop_meter.meter() as acc:
            lowered = jax.jit(make_chained(T)).lower(arg)
        supplement = acc[0]
        exes[T] = lowered.compile()
        if measure_flops:
            xla_flops[T] = _exe_flops(lowered, exes[T])
        jax.tree_util.tree_map(np.asarray, exes[T](arg))  # warm
    deltas = []
    for _ in range(reps):
        timed = {}
        for T in (t_short, t_long):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, exes[T](arg))
            timed[T] = time.perf_counter() - t0
        deltas.append((timed[t_long] - timed[t_short]) / (t_long - t_short))
    dt = float(np.median(deltas))
    if dt <= 0:  # tunnel noise swamped the differencing; retry signal
        raise RuntimeError(f"non-positive step delta {dt}")
    flops = None
    if measure_flops:
        xs, xl = xla_flops.get(t_short), xla_flops.get(t_long)
        if xs and xl:
            if xl > xs * 1.25:  # unrolled: counts scale with T
                flops = (xl - xs) / (t_long - t_short) + supplement
            else:  # scan body counted once → already per-step
                flops = xs + supplement
        elif supplement > 0:
            flops = supplement
    return dt, flops


def _result_row(batch: int, dt: float, flops_per_step) -> dict:
    row = {
        "pairs_per_sec_per_chip": round(batch / dt, 2),
        "batch": batch,
        "ms_per_step": round(dt * 1e3, 2),
    }
    peak = _peak_bf16_flops()
    if flops_per_step and peak:
        row["mfu"] = round(flops_per_step / dt / peak, 4)
        row["tflops_per_step"] = round(flops_per_step / 1e12, 4)
    return row


_FAILED_ROW = {"pairs_per_sec_per_chip": 0.0}


def _model_and_inputs(batch: int, partial: bool, n_iter: int):
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
) -> dict:
    """One VCR-Net EVAL protocol config: pairs/s/chip + MFU."""
    import jax
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

    def make_chained(T):
        def chained(s0):
            def body(s, _):
                out = fwd(variables, s, tgt_d)
                # data-dependent perturbation keeps steps sequential
                return s + 1e-9 * out[3][:, None, :], out[3].ravel()[0]

            s, _ = jax.lax.scan(body, s0, None, length=T)
            return s.ravel()[0]

        return chained

    dt, flops = _time_chained(make_chained, src_d, t_short, t_long, reps)
    return _result_row(batch, dt, flops)


def _synth_train_batch(batch: int, n: int):
    rng = np.random.RandomState(0)
    eye = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))
    zeros = np.zeros((batch, 3), np.float32)
    return {
        "src": rng.rand(batch, n, 3).astype(np.float32) - 0.5,
        "tgt": rng.rand(batch, n, 3).astype(np.float32) - 0.5,
        "R_ab": eye, "t_ab": zeros, "R_ba": eye, "t_ba": zeros,
        "euler_ab": zeros, "euler_ba": zeros,
        "valid": np.ones(batch, np.float32),
    }


def _bench_train_family(cfg, batch: int, reps: int = 5) -> dict:
    """Shared harness for the trainable configs (vcrnet train / lpd / dcp
    train steps): chained full train steps with the UPDATED STATE live in
    the output (see module docstring on the T=1 DCE artifact)."""
    import jax
    from vcrnet_tpu.train import Trainer

    trainer = Trainer(cfg)
    host = _synth_train_batch(batch, cfg.n_cropped)
    state = trainer.init_state(jax.random.PRNGKey(0), host)
    dev = trainer._to_device(host)

    def make_chained(T):
        def chained(s0):
            def body(s, _):
                s2, sums = trainer._train_step_impl(s, dev)
                return s2, sums["loss"]

            s, losses = jax.lax.scan(body, s0, None, length=T)
            leaf = jax.tree_util.tree_leaves(s.params)[0]
            return losses[-1], leaf.ravel()[0]

        return chained

    dt, flops = _time_chained(make_chained, state, 1, 5, reps)
    return _result_row(batch, dt, flops)


def bench_vcrnet_train(batch: int = 64) -> dict:
    from vcrnet_tpu.config import Config

    cfg = Config(
        num_points=1024, emb_dims=512, batch_size=batch,
        compute_dtype="bfloat16",
    )
    return _bench_train_family(cfg, batch)


def bench_lpd_pretrain(batch: int = 16) -> dict:
    """LPD-Net pre-train step at the reference recipe's batch 16
    (README.md:25-27)."""
    from vcrnet_tpu.config import Config

    cfg = Config(
        model="lpd", num_points=1024, emb_dims=512, batch_size=batch,
        compute_dtype="bfloat16",
    )
    row = _bench_train_family(cfg, batch)
    # the MFU here is ~50x below the other configs BY CONSTRUCTION, not
    # pathology: the reference recipe's B=16 with the triplet loss's
    # 32-step sequential FPS scan (lpdnet_model.py:195, a data dependency
    # no layout fixes) leaves the chip overhead-bound between the small
    # matmuls — say so in the artifact instead of leaving a 0.0066 row
    # unexplained
    row["mfu_note"] = (
        "overhead-bound by construction: reference-recipe B=16 + the "
        "triplet loss's sequential 32-step FPS scan"
    )
    return row


def bench_dcp_eval(batch: int = 64, reps: int = 5) -> dict:
    """DCP-style pipeline eval (DGCNN + transformer + SVD head)."""
    import jax
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import DCP

    cfg = Config(
        model="dcp", emb_nn="dgcnn", num_points=1024, emb_dims=512,
        compute_dtype="bfloat16",
    )
    model = DCP(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(batch, cfg.num_points, 3).astype(np.float32) - 0.5
    tgt = rng.rand(batch, cfg.num_points, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)

    def make_chained(T):
        def chained(s0):
            def body(s, _):
                out = model.apply(variables, s, tgt_d)
                t_ab = out[1]
                return s + 1e-9 * t_ab[:, None, :], t_ab.ravel()[0]

            s, _ = jax.lax.scan(body, s0, None, length=T)
            return s.ravel()[0]

        return chained

    dt, flops = _time_chained(make_chained, src_d, 2, 8, reps)
    return _result_row(batch, dt, flops)


def bench_icp_eval(batch: int = 32, reps: int = 5) -> dict:
    """Classical batched ICP eval (max_iterations=50, tolerance break).
    MFU is omitted here: the data-dependent while_loop makes a static
    FLOP count meaningless. Long chains (2 vs 20) keep the differencing
    above tunnel jitter (round-4 lesson: (1,3) chains reported a
    noise-floor 0.08 ms/step).

    The pairs carry the REFERENCE EVAL misalignment (per-item Euler zyx
    rotations U(0, pi/4) per axis — util/data.py:258-277 at the default
    --factor 4 — plus U(-0.5, 0.5) translations), and the row reports
    ``mean_iters``, the while_loop iterations actually executed (the
    tolerance break is a batch-mean predicate, icp_model.py:37-39). An
    early round benched a 0.2-rad single-axis pair that converged after
    ~1 iteration and reported a ms-scale "ICP step" — honest now."""
    import jax
    import jax.numpy as jnp
    from vcrnet_tpu.models.icp import icp_register

    from scipy.spatial.transform import Rotation

    n = 1024
    rng = np.random.RandomState(0)
    src = rng.rand(batch, n, 3).astype(np.float32) - 0.5
    angles = rng.uniform(0.0, np.pi / 4.0, size=(batch, 3))
    R = Rotation.from_euler("zyx", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-0.5, 0.5, size=(batch, 1, 3)).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R, src) + t
    src_d, tgt_d = jax.device_put(src), jax.device_put(jnp.asarray(tgt))

    # iteration count of one real solve on these pairs (same misalignment
    # the timed chain runs) — out of the jitted fn as one extra scalar.
    # The tolerance break is a batch-MEAN predicate (icp_model.py:37-39),
    # so the count is one scalar shared by the whole batch; "mean" over
    # items is degenerate-exact.
    n_iters = int(np.asarray(
        jax.jit(
            lambda s, d: icp_register(
                s, d, max_iterations=50, with_iters=True
            )[-1]
        )(src_d, tgt_d)
    ))

    def make_chained(T):
        def chained(s0):
            def body(s, _):
                out = icp_register(s, tgt_d, max_iterations=50)
                t_ab = out[3]
                return s + 1e-9 * t_ab[:, None, :], t_ab.ravel()[0]

            s, _ = jax.lax.scan(body, s0, None, length=T)
            return s.ravel()[0]

        return chained

    dt, _ = _time_chained(
        make_chained, src_d, 2, 20, reps, measure_flops=False
    )
    row = _result_row(batch, dt, None)
    row["mean_iters"] = n_iters
    row["max_iterations"] = 50
    return row


def _best_over_batches(partial: bool, n_iter: int, batches) -> dict:
    best = dict(_FAILED_ROW)
    for batch in batches:
        if (
            best["pairs_per_sec_per_chip"] > 0.0
            and _remaining() < _MIN_CONFIG_S
        ):
            break  # keep what we have rather than blow the deadline
        ok = False
        for _attempt in range(2):  # tunnel hiccups happen; retry once
            try:
                row = bench_protocol(batch, partial, n_iter)
                if (
                    row["pairs_per_sec_per_chip"]
                    > best["pairs_per_sec_per_chip"]
                ):
                    best = row
                ok = True
                break
            except Exception:
                traceback.print_exc(file=sys.stderr)
        if not ok:
            # a batch that failed twice (typically OOM) will not get
            # better at larger sizes — stop sweeping, keep what we have
            break
    return best


def _try_config(fn, *args) -> dict:
    for _attempt in range(2):
        try:
            return fn(*args)
        except Exception:
            traceback.print_exc(file=sys.stderr)
    return dict(_FAILED_ROW)


def accuracy_report(
    n_items: int = 96,
    *,
    checkpoint: str = None,
    num_points: int = 1024,
    emb_dims: int = 512,
    test_batch_size: int = 24,
    profiles: tuple = ("fast", "exact"),
    protocols: tuple = ("whole_iter1", "whole_iter3", "partial_iter3"),
) -> dict:
    """Per-protocol rot/trans RMSE under the BENCHED fast profile and the
    exact-f32 path (deterministic synthetic eval set from the
    reference-parity pipeline) — so the throughput claims carry their
    accuracy. Weights: the committed TRAINED checkpoint
    (checkpoints/pretrained/vcrnet_shapes_best.msgpack, the round-4
    30-epoch shapes run) when present, else the converted pretrained
    LPDNet embedding alone. The trained weights matter beyond optics: an
    untrained pointer leaves the partial protocol's hard top-k selections
    at near-ties, where bf16-vs-f32 flips amplify into degree-scale metric
    deltas that say nothing about the fast path (round-4 finding: 6.4 deg
    apparent delta with random pointer weights vs <=0.1 deg trained)."""
    import os

    import jax
    from flax import serialization
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.data import SyntheticDataset, Loader
    from vcrnet_tpu.train import Trainer
    from vcrnet_tpu.train.checkpoint import (
        load_t7_lpdnet, merge_params, merge_pretrained_embedding,
    )

    t7 = "/root/reference/pretrained/lpd-pretrained.t7"
    if checkpoint is not None and not os.path.exists(checkpoint):
        # an explicitly requested checkpoint must not silently degrade to
        # the embedding-only report (the same wrong-number-not-a-crash
        # class as the round-4 no-op merge)
        raise FileNotFoundError(f"accuracy_report checkpoint: {checkpoint}")
    trained = checkpoint or os.path.join(
        os.path.dirname(os.path.abspath(__file__)),
        "checkpoints", "pretrained", "vcrnet_shapes_best.msgpack",
    )
    trained_params = trained_bs = None
    if os.path.exists(trained):
        with open(trained, "rb") as f:
            raw = serialization.msgpack_restore(f.read())
        # the msgpack holds the FULL TrainState dict (params / batch_stats /
        # opt_state / step) — unwrap before merging, exactly as
        # train/checkpoint.py::load_checkpoint does. Passing the whole dict
        # into merge_params is a proven silent no-op (round-4 artifact ran
        # untrained weights); merge_params now raises on zero-leaf merges
        # so that failure mode is a crash, not a wrong number.
        trained_params = raw.get("params", raw)
        trained_bs = raw.get("batch_stats") if "params" in raw else None
    protos = {
        "whole_iter1": dict(iter=1),
        "whole_iter3": dict(iter=3),
        "partial_iter3": dict(iter=3, partial=True, overlap=0.575),
    }
    protos = {k: v for k, v in protos.items() if k in protocols}
    out = {
        "weights": (
            "trained_checkpoint" if trained_params is not None
            else "pretrained_embedding_only"
        ),
        "checkpoint": os.path.basename(trained) if trained_params is not None
        else None,
        "eval_set": (
            "synthetic_shapes" if trained_params is not None
            else "synthetic_uniform"
        ),
    }
    for name, pkw in protos.items():
        # each (protocol, profile) pair is one eval-epoch compile + run;
        # degrade per-protocol near the deadline instead of all-or-nothing
        if _remaining() < 2 * 90.0:
            out[name] = {"skipped": "deadline"}
            continue
        row = {}
        for profile in profiles:
            kw = dict(
                num_points=num_points, emb_dims=emb_dims,
                test_batch_size=test_batch_size, **pkw
            )
            if profile == "fast":
                kw.update(
                    compute_dtype="bfloat16",
                    **_reuse_knob(), **_subsample_knob(),
                )
            cfg = Config(**kw)
            trainer = Trainer(cfg)
            # eval on the distribution the committed checkpoint was trained
            # on (synthetic shapes, the round-4 30-epoch run) so absolute
            # RMSE is meaningful; uniform noise otherwise (delta-only mode)
            ds = SyntheticDataset(
                cfg, "test", n_items=n_items, cloud_points=2048,
                kind="shapes" if trained_params is not None else "uniform",
            )
            loader = Loader(
                ds, cfg.test_batch_size, shuffle=False, drop_last=False
            )
            state = trainer.init_state(
                jax.random.PRNGKey(cfg.seed), next(iter(loader))
            )
            if trained_params is not None:
                stats = {}
                state = state.replace(
                    params=merge_params(
                        serialization.to_state_dict(state.params),
                        trained_params,
                        stats=stats,  # raises on zero merged leaves
                    )
                )
                if trained_bs and state.batch_stats:
                    state = state.replace(
                        batch_stats=merge_params(
                            serialization.to_state_dict(state.batch_stats),
                            trained_bs, min_leaves=0,
                        )
                    )
                # merged-leaf count in the artifact: a reader can verify the
                # checkpoint actually landed without rerunning anything
                out["merged_leaves"] = stats["merged"]
                out["checkpoint_leaves"] = stats["converted_leaves"]
            else:
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
        if "fast" in row and "exact" in row:
            row["delta"] = {
                "rot_RMSE_deg": round(
                    abs(
                        row["fast"]["rot_RMSE_deg"]
                        - row["exact"]["rot_RMSE_deg"]
                    ),
                    4,
                ),
                "trans_RMSE": round(
                    abs(
                        row["fast"]["trans_RMSE"] - row["exact"]["trans_RMSE"]
                    ),
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
    window (VCRNET_TPU_PROBE_WINDOW_S, default 45 min, CLIPPED to leave
    room inside the bench deadline when one is active) before giving up —
    a round-end bench run should survive a tunnel flap, not fail on it.
    Set VCRNET_SKIP_TPU_PROBE=1 to bypass (tests monkeypatch this
    function)."""
    import os
    import subprocess
    import time

    if os.environ.get("VCRNET_SKIP_TPU_PROBE"):
        return

    window_s = float(os.environ.get("VCRNET_TPU_PROBE_WINDOW_S", "2700"))
    if _DEADLINE is not None:
        # leave most of the deadline for the actual measurements: if the
        # TPU only comes back with <10 min to spare there is no point
        window_s = min(window_s, max(60.0, _remaining() - 600.0))
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
    import os

    global _DEADLINE
    _DEADLINE = time.monotonic() + float(
        os.environ.get("VCRNET_BENCH_DEADLINE_S", "1500")
    )
    _probe_tpu_responsive()  # before EVERY mode — --accuracy is the
    # longest-running one and must not hang silently on a dead tunnel
    if "--accuracy" in sys.argv:
        print(json.dumps({"accuracy": accuracy_report()}))
        return
    batches = (64, 128, 256, 512) if "--sweep" in sys.argv else (64,)

    configs = {}
    accuracy = None

    def emit():
        """Print the full cumulative result (flushed): the driver takes
        the LAST parseable JSON line, so a killed run still reports
        everything measured so far."""
        failed = sorted(
            k for k, v in configs.items()
            if v.get("pairs_per_sec_per_chip") == 0.0
        )
        value = configs.get("whole_iter1", {}).get(
            "pairs_per_sec_per_chip", 0.0
        )
        result = {
            "metric": "modelnet40_vcrnet_eval_pairs_per_sec_per_chip",
            "value": round(value, 2),
            "unit": "pairs/s/chip",
            "vs_baseline": round(value / NORTH_STAR, 4),
            "configs": configs,
        }
        if failed:
            # make partial failures visible instead of a silent 0.0
            result["failed_configs"] = failed
        if accuracy is not None:
            result["accuracy"] = accuracy
        print(json.dumps(result), flush=True)

    plan = (
        ("whole_iter1", lambda: _best_over_batches(False, 1, batches)),
        ("whole_iter3", lambda: _best_over_batches(False, 3, batches)),
        ("partial_iter3", lambda: _best_over_batches(True, 3, batches)),
        ("vcrnet_train", lambda: _try_config(bench_vcrnet_train)),
        ("lpd_pretrain", lambda: _try_config(bench_lpd_pretrain)),
        ("dcp_eval", lambda: _try_config(bench_dcp_eval)),
        ("icp_eval", lambda: _try_config(bench_icp_eval)),
    )
    for name, run in plan:
        if name != "whole_iter1" and _remaining() < _MIN_CONFIG_S:
            configs[name] = {"skipped": "deadline"}
            emit()
            continue
        configs[name] = run()
        if name in _EVAL_CONFIGS and "pairs_per_sec_per_chip" in configs[name]:
            configs[name]["vs_baseline"] = round(
                configs[name]["pairs_per_sec_per_chip"] / NORTH_STAR, 4
            )
        if (
            name == "whole_iter1"
            and configs[name]["pairs_per_sec_per_chip"] == 0.0
        ):
            # the headline config failed outright — fail fast rather than
            # spending many more tunnel-TPU minutes on the other protocols
            emit()
            raise RuntimeError("headline configuration (whole_iter1) failed")
        emit()

    # compact accuracy block so throughput claims carry their accuracy
    # (VERDICT r3 #2); the fuller standalone report is --accuracy.
    # 96 items (the full standalone-report sample, less top-k-flip noise
    # in the deltas) when the deadline has headroom, else the compact 48.
    if _remaining() > _ACCURACY_MIN_S:
        try:
            accuracy = accuracy_report(
                n_items=96 if _remaining() > 2 * _ACCURACY_MIN_S else 48
            )
        except Exception:
            traceback.print_exc(file=sys.stderr)
            accuracy = {"skipped": "error"}
    else:
        accuracy = {"skipped": "deadline"}
    emit()


if __name__ == "__main__":
    main()
