"""Fused-kNN kernel internals: cost of the k-step argmax loop vs the score
matmul, across k and tile_q.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/knn_micro.py [B] [N] [C]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chain_time

from vcrnet_tpu.ops.pallas_knn import _fused_knn_impl




def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    C = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    rng = np.random.RandomState(0)
    x = jax.device_put(
        rng.rand(B, N, C).astype(np.float32).astype(jnp.bfloat16)
    )

    for k in (1, 5, 10, 20):
        for tq in (128, 256):
            if N % tq:
                continue

            def f(xx, kk=k, t=tq):
                idx = _fused_knn_impl(xx, kk, t, False)
                return xx + 1e-9 * idx[:, :, :1].astype(xx.dtype)

            dt = chain_time(f, x)
            print(f"k={k:2d} tile_q={tq:3d}: {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
