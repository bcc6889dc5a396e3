"""A/B the round-2 candidate knobs on the real TPU in one run:

  1. whole_iter3 / partial_iter3 step time for feature-graph reuse
     off / refresh=1 / refresh=2 (Config.reuse_feature_knn),
  2. train-step time with/without int8 training gathers
     (Config.int8_train_gathers).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/reuse_ab.py [B]
Prints one line per variant; uses the chained-scan protocol from bench.py
(tunnel fetch latency cancels).
"""

import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")
import bench  # noqa: E402  (reuses bench_protocol's timing discipline)


def eval_variant(name, batch, partial, reuse_env, sub_env=""):
    import os

    if reuse_env:
        os.environ["VCRNET_REUSE_FEATURE_KNN"] = reuse_env
    else:
        os.environ.pop("VCRNET_REUSE_FEATURE_KNN", None)
    if sub_env:
        os.environ["VCRNET_REFINE_SUBSAMPLE"] = sub_env
    else:
        os.environ.pop("VCRNET_REFINE_SUBSAMPLE", None)
    row = bench.bench_protocol(batch, partial, 3)
    pps = row["pairs_per_sec_per_chip"]
    print(
        f"{name:28s} B={batch:<4d} {batch / pps * 1000:7.1f} ms/step  "
        f"{pps:7.1f} pairs/s/chip ({pps / bench.NORTH_STAR:.3f}x)",
        flush=True,
    )


def train_variant(name, batch, int8, remat=False):
    import time

    from vcrnet_tpu.config import Config
    from vcrnet_tpu.train import Trainer

    cfg = Config(
        num_points=1024, emb_dims=512, batch_size=batch,
        compute_dtype="bfloat16", int8_train_gathers=int8, remat=remat,
    )
    trainer = Trainer(cfg)
    rng = np.random.RandomState(0)
    n = cfg.n_cropped
    eye = np.tile(np.eye(3, dtype=np.float32), (batch, 1, 1))
    zeros = np.zeros((batch, 3), np.float32)
    batch_data = {
        "src": rng.rand(batch, n, 3).astype(np.float32) - 0.5,
        "tgt": rng.rand(batch, n, 3).astype(np.float32) - 0.5,
        "R_ab": eye, "t_ab": zeros, "R_ba": eye, "t_ba": zeros,
        "euler_ab": zeros, "euler_ba": zeros,
        "valid": np.ones(batch, np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch_data)
    dev = trainer._to_device(batch_data)

    def chained(state, iters):
        def body(s, _):
            s2, sums = trainer._train_step_impl(s, dev)
            return s2, sums["loss"]

        s, losses = jax.lax.scan(body, state, None, length=iters)
        leaf = jax.tree_util.tree_leaves(s.params)[0]
        return losses[-1], leaf.ravel()[0]  # keep the step's state live

    fs = {}
    for T in (1, 5):
        fs[T] = jax.jit(lambda s, TT=T: chained(s, TT))
        jax.tree_util.tree_map(np.asarray, fs[T](state))
    ds = []
    for _ in range(5):
        out = {}
        for T in (1, 5):
            t0 = time.perf_counter()
            jax.tree_util.tree_map(np.asarray, fs[T](state))
            out[T] = time.perf_counter() - t0
        ds.append((out[5] - out[1]) / 4)
    dt = float(np.median(ds))
    print(
        f"{name:28s} B={batch:<4d} {dt * 1000:7.1f} ms/step  "
        f"{batch / dt:7.1f} pairs/s/chip",
        flush=True,
    )


def _chained_op_ms(fn, x0, t_short=4, t_long=16, reps=5):
    """Chained-scan device time of one op (ms): feed each step's output
    back as input so nothing is elided; difference two chain lengths so
    the tunnel fetch cancels."""
    import time

    import jax.numpy as jnp

    def chained(x, n_steps):
        def body(c, _):
            o = fn(c)
            return c + 1e-9 * o[..., :1], o.ravel()[0]

        c, _ = jax.lax.scan(body, x, None, length=n_steps)
        return c.ravel()[0]

    fs = {}
    for T in (t_short, t_long):
        fs[T] = jax.jit(lambda v, TT=T: chained(v, TT))
        np.asarray(fs[T](x0))
    ds = []
    for _ in range(reps):
        out = {}
        for T in (t_short, t_long):
            t0 = time.perf_counter()
            np.asarray(fs[T](x0))
            out[T] = time.perf_counter() - t0
        ds.append((out[t_long] - out[t_short]) / (t_long - t_short))
    return float(np.median(ds)) * 1000


def kernel_variants(B=64, N=1024, F=128, k=20):
    """Deferred-vs-interleaved gather A/B on the fused forward kernels at
    protocol shapes (eval mode: packed select + int8 gathers)."""
    import jax.numpy as jnp

    from vcrnet_tpu.ops.pallas_edgeconv import (
        _fused_edge_conv_fwd_impl, _fused_gather_max_impl,
    )

    rng = np.random.RandomState(0)
    # model shapes: DG kNN runs on the 64-dim conv2 features with 128-dim
    # edge values; the SN gather-max runs on xyz (3-dim) with 256-dim values
    x64 = jnp.asarray(rng.rand(B, N, 64).astype(np.float32), jnp.bfloat16)
    x3 = jnp.asarray(rng.rand(B, N, 3).astype(np.float32), jnp.bfloat16)
    a = jnp.asarray(rng.randn(B, N, F).astype(np.float32), jnp.bfloat16)
    h = jnp.asarray(rng.randn(B, N, F).astype(np.float32), jnp.bfloat16)
    w2 = jnp.asarray(rng.randn(F, F).astype(np.float32) * 0.1, jnp.bfloat16)
    b2 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1, jnp.bfloat16)
    a2 = jnp.asarray(
        rng.randn(B, N, 2 * F).astype(np.float32), jnp.bfloat16
    )
    for int8 in (True, False):
        tag = "int8" if int8 else "bf16"
        for deferred in (False, True):
            name = f"edge_conv {tag} deferred={deferred}"
            ms = _chained_op_ms(
                lambda v, d=deferred, i8=int8: _fused_edge_conv_fwd_impl(
                    v, a, h, w2, b2, k, 0.0, 128, False, True, i8,
                    deferred_gather=d,
                )[1],
                x64,
            )
            print(f"{name:36s} {ms:7.2f} ms", flush=True)
        for deferred in (False, True):
            name = f"gather_max {tag} deferred={deferred}"
            ms = _chained_op_ms(
                lambda v, d=deferred, i8=int8: _fused_gather_max_impl(
                    v, a2, k, 128, False, True, i8, deferred_gather=d
                )[0],
                x3,
            )
            print(f"{name:36s} {ms:7.2f} ms", flush=True)


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = sys.argv[2] if len(sys.argv) > 2 else "all"
    if only in ("all", "kernels"):
        kernel_variants(B)
    if only in ("all", "eval"):
        for partial, tag in ((False, "whole_iter3"), (True, "partial_iter3")):
            eval_variant(f"{tag} reuse=off", B, partial, "")
            eval_variant(f"{tag} reuse refresh=1", B, partial, "1")
            eval_variant(f"{tag} reuse refresh=2", B, partial, "2")
    if only in ("all", "train"):
        train_variant("train int8_gathers=off", B, False)
        train_variant("train int8_gathers=on", B, True)
    if only == "sub":
        # refine_subsample ladder — NOT in "all": the offline accuracy
        # probe failed it (density shift breaks the embedding; see
        # docs/KERNELS.md "Subsampled refinement iterations"). Kept for
        # explicit re-measurement if the embedding is ever re-trained at
        # reduced density.
        for sub in ("", "256", "384", "512"):
            eval_variant(
                f"whole_iter3 sub={sub or 'off'}", B, False, "", sub
            )
    if only == "trainb":
        # batch-size sweep: pairs/s/chip may keep rising past B=64 if the
        # step has fixed-cost components (eval B=96/128 was neutral, but
        # training has a different fixed/variable split)
        for b in (64, 96, 128):
            try:
                train_variant("train B-sweep", b, False)
            except Exception as e:
                # only an HBM-capacity failure justifies the remat arm;
                # anything else (tunnel outage, code bug) must surface
                msg = str(e)
                if not any(
                    s in msg for s in ("RESOURCE_EXHAUSTED", "Out of memory")
                ):
                    raise
                print(f"train B={b} OOM ({msg[:200]}); remat arm:", flush=True)
                train_variant("train B-sweep remat", b, False, remat=True)


if __name__ == "__main__":
    main()
