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


def eval_variant(name, batch, partial, reuse_env):
    import os

    if reuse_env:
        os.environ["VCRNET_REUSE_FEATURE_KNN"] = reuse_env
    else:
        os.environ.pop("VCRNET_REUSE_FEATURE_KNN", None)
    pps = bench.bench_protocol(batch, partial, 3)
    print(
        f"{name:28s} B={batch:<4d} {batch / pps * 1000:7.1f} ms/step  "
        f"{pps:7.1f} pairs/s/chip ({pps / bench.NORTH_STAR:.3f}x)",
        flush=True,
    )


def train_variant(name, batch, int8):
    import time

    from vcrnet_tpu.config import Config
    from vcrnet_tpu.train import Trainer

    cfg = Config(
        num_points=1024, emb_dims=512, batch_size=batch,
        compute_dtype="bfloat16", int8_train_gathers=int8,
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


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    only = sys.argv[2] if len(sys.argv) > 2 else "all"
    if only in ("all", "eval"):
        for partial, tag in ((False, "whole_iter3"), (True, "partial_iter3")):
            eval_variant(f"{tag} reuse=off", B, partial, "")
            eval_variant(f"{tag} reuse refresh=1", B, partial, "1")
            eval_variant(f"{tag} reuse refresh=2", B, partial, "2")
    if only in ("all", "train"):
        train_variant("train int8_gathers=off", B, False)
        train_variant("train int8_gathers=on", B, True)


if __name__ == "__main__":
    main()
