"""Device trace of the full VCRNet train step (fwd+bwd+Adam+metric sums)
— per-op attribution for the train-throughput roofline question
(VERDICT r3 #4). Reuses iter3_trace's xprof summarizer.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/train_trace.py [B]
then python benchmarks/train_trace.py --summarize
"""

import sys

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os
import sys as _sys

_sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

TRACE_DIR = "/tmp/train_trace"


def main():
    if "--summarize" in sys.argv:
        import benchmarks.iter3_trace as it

        it.TRACE_DIR = TRACE_DIR
        it.summarize()
        return
    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    B = int(args[0]) if args else 64

    from vcrnet_tpu.config import Config
    from vcrnet_tpu.train import Trainer

    cfg = Config(
        num_points=1024, emb_dims=512, batch_size=B,
        compute_dtype="bfloat16",
    )
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
    state, sums = trainer._train_step(state, dev)  # compile
    np.asarray(sums["loss"])
    print("compiled; tracing", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for _ in range(4):
            state, sums = trainer._train_step(state, dev)
        np.asarray(sums["loss"])
    print("trace written to", TRACE_DIR, flush=True)


if __name__ == "__main__":
    main()
