"""Training-step throughput (secondary benchmark): full VCR-Net train step
(forward + point loss + grads + Adam) on synthetic ModelNet40-shaped data.

NOTE: this harness fetches the loss every step, so on the tunnel-backed
TPU each iteration pays the ~30 ms host round-trip on top of device time.
For the TRUE device step time (what data-parallel scaling multiplies) use
benchmarks/train_step_device.py, which chains steps inside one jit.

Usage: python benchmarks/train_throughput.py [batch]
"""

import sys
import time

import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")

from vcrnet_tpu.config import Config
from vcrnet_tpu.train import Trainer


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 32
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

    t0 = time.perf_counter()
    state, sums = trainer._train_step(state, dev)
    float(sums["loss"])
    print(f"compile+first step: {time.perf_counter()-t0:.1f}s", flush=True)

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        state, sums = trainer._train_step(state, dev)
        float(sums["loss"])  # forces completion (tunnel-safe)
    dt = time.perf_counter() - t0
    print(
        f"train step: {dt/iters*1000:.1f} ms -> {B*iters/dt:.1f} pairs/s"
    )


if __name__ == "__main__":
    main()
