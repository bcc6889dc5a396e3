"""Measure pure device step time of the flagship forward by chaining
iterations inside one jit (a lax.scan with a data dependency), so the
tunnel's per-dispatch host latency (~30 ms here) cancels out.

Usage: python benchmarks/device_step_time.py [batch] [T1] [T2]
"""

import sys
import time

import numpy as np

# persistent XLA/Mosaic compilation cache: the fused Pallas kernels take
# minutes to compile cold; warm runs load from cache
import jax as _jax
_jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
import jax
import jax.numpy as jnp

from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    T1 = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    T2 = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    mode = sys.argv[4] if len(sys.argv) > 4 else "exact"
    N = 1024
    cfg = Config(
        num_points=N, emb_dims=512,
        compute_dtype="float32" if mode == "exact" else "bfloat16",
        # approx_knn left False: the 'auto' kNN picks the exact fused
        # Pallas kernel on TPU, which beats approx_max_k
        approx_knn=(mode == "approx"),
        partial=(mode == "partial"),
        overlap=0.575,
        iter=3 if mode == "partial" else 1,
    )
    print(f"mode={mode}", flush=True)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    n_in = cfg.n_cropped  # partial mode crops the model input
    src = jax.device_put(rng.rand(B, n_in, 3).astype(np.float32) - 0.5)
    tgt = jax.device_put(rng.rand(B, n_in, 3).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    def chained(v, s, t, iters):
        def body(carry, _):
            s, t = carry
            out = model.apply(v, s, t)
            s2 = s + 1e-9 * out[3][:, None, :]
            return (s2, t), out[2][0, 0, 0]

        (_, _), rs = jax.lax.scan(body, (s, t), None, length=iters)
        return rs[-1]

    times = {}
    for T in (T1, T2):
        f = jax.jit(lambda v, s, t, TT=T: chained(v, s, t, TT))
        t0 = time.perf_counter()
        np.asarray(f(variables, src, tgt))
        print(f"T={T}: compile+first run {time.perf_counter()-t0:.1f} s",
              flush=True)
        t0 = time.perf_counter()
        np.asarray(f(variables, src, tgt))
        dt = time.perf_counter() - t0
        times[T] = dt
        print(f"T={T}: total {dt*1000:.1f} ms", flush=True)
    step = (times[T2] - times[T1]) / (T2 - T1)
    print(f"pure device step: {step*1000:.2f} ms -> {B/step:.1f} pairs/s")


if __name__ == "__main__":
    main()
