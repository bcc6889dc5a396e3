"""TRUE device time of the full train step (fwd + bwd + Adam), measured by
chaining steps inside one jit (lax.scan) so the tunnel's ~30 ms host-fetch
latency cancels out — the honest number data-parallel scaling multiplies.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/train_step_device.py [B]
(set VCRNET_INT8_TRAIN_GATHERS=1 to A/B Config.int8_train_gathers)
"""

import os
import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vcrnet_tpu.config import Config
from vcrnet_tpu.train import Trainer


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    def env_flag(name, default):
        raw = os.environ.get(name)
        if raw is None:
            return default
        return raw.strip().lower() not in ("", "0", "false", "off", "no")

    int8 = env_flag("VCRNET_INT8_TRAIN_GATHERS", False)
    streaming = env_flag("VCRNET_STREAMING_VCP_TRAIN", True)
    cfg = Config(
        num_points=1024, emb_dims=512, batch_size=B,
        compute_dtype="bfloat16", int8_train_gathers=int8,
        streaming_vcp_train=streaming,
    )
    print(f"int8_train_gathers={int8} streaming_vcp_train={streaming}")
    trainer = Trainer(cfg)
    rng = np.random.RandomState(0)
    n = cfg.n_cropped
    eye = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    zeros = np.zeros((B, 3), np.float32)
    batch = {
        "src": rng.rand(B, n, 3).astype(np.float32) - 0.5,
        "tgt": rng.rand(B, n, 3).astype(np.float32) - 0.5,
        "R_ab": eye, "t_ab": zeros, "R_ba": eye, "t_ba": zeros,
        "euler_ab": zeros, "euler_ba": zeros,
        "valid": np.ones(B, np.float32),
    }
    state = trainer.init_state(jax.random.PRNGKey(0), batch)
    dev = trainer._to_device(batch)

    def chained(state, iters):
        def body(s, _):
            s2, sums = trainer._train_step_impl(s, dev)
            return s2, sums["loss"]

        s, losses = jax.lax.scan(body, state, None, length=iters)
        # Keep the UPDATED STATE live in the output: returning only
        # losses[-1] lets XLA dead-code-eliminate the backward+optimizer
        # at T=1 (loss needs only the forward), which inflates the
        # chained slope (T5-T1)/4 by ~17 ms. Folding a param leaf into
        # the result forces every iteration to do the full step.
        leaf = jax.tree_util.tree_leaves(s.params)[0]
        return losses[-1], leaf.ravel()[0]

    fs = {}
    for T in (1, 5):
        fs[T] = jax.jit(lambda s, TT=T: chained(s, TT))
        jax.tree_util.tree_map(np.asarray, fs[T](state))  # compile
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
        f"device train step (B={B}): {dt*1000:.1f} ms -> "
        f"{B/dt:.1f} pairs/s/chip"
    )


if __name__ == "__main__":
    main()
