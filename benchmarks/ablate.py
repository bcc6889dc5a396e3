"""Component ablation on real TPU using chained-scan timing (cancels the
tunnel's per-dispatch latency). Usage: python benchmarks/ablate.py [mode]"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from vcrnet_tpu.config import Config
from vcrnet_tpu.models.embeddings import LPDNet
from vcrnet_tpu.models.transformer import TransformerPointer
from vcrnet_tpu.models import heads
from vcrnet_tpu.models.vcrnet import _precision, _dtype
from vcrnet_tpu import geometry, ops


def chain_time(fn, x0, T1=2, T2=10):
    """fn: x -> x (same shape); times (T2-T1) chained device steps."""

    def chained(x, iters):
        def body(c, _):
            return fn(c), c.ravel()[0]

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.ravel()[0]

    out = {}
    for T in (T1, T2):
        f = jax.jit(lambda x, TT=T: chained(x, TT))
        np.asarray(f(x0))  # compile
        t0 = time.perf_counter()
        np.asarray(f(x0))
        out[T] = time.perf_counter() - t0
    return (out[T2] - out[T1]) / (T2 - T1)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "fast"
    B, N, E = 64, 1024, 512
    cfg = Config(
        num_points=N, emb_dims=E,
        compute_dtype="bfloat16" if mode == "fast" else "float32",
        approx_knn=(mode == "fast"),
    )
    precision, dtype = _precision(cfg), _dtype(cfg)
    rng = np.random.RandomState(0)
    pts = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    emb0 = jax.device_put(rng.rand(B, N, E).astype(np.float32))

    lpd = LPDNet(emb_dims=E, precision=precision, dtype=dtype,
                 approx_knn=cfg.approx_knn)
    v_lpd = lpd.init(jax.random.PRNGKey(0), pts[:1])

    def emb_step(x):
        e = lpd.apply(v_lpd, x)
        return x + 1e-9 * e[:, :, :3].astype(x.dtype)

    dt = chain_time(emb_step, pts)
    print(f"{mode} LPDNet 1 cloud: {dt*1000:7.2f} ms", flush=True)

    ptr = TransformerPointer(emb_dims=E, precision=precision, dtype=dtype)
    v_ptr = ptr.init(jax.random.PRNGKey(0), emb0[:1], emb0[:1])

    def ptr_step(e):
        a, b = ptr.apply(v_ptr, e, e)
        return e + 1e-9 * (a + b).astype(e.dtype)

    dt = chain_time(ptr_step, emb0)
    print(f"{mode} pointer (both dirs): {dt*1000:7.2f} ms", flush=True)

    def vcp_step(e):
        s, c = heads.vcp_top_k_whole(e[:, :, :3], e[:, :, :3], e[:, :, :3],
                                     e[:, :, :3], precision=precision)
        return e + 1e-9 * c.mean()

    def vcp_full_step(e):
        s, c = heads.vcp_top_k_whole(e, e, e[:, :, :3], e[:, :, :3],
                                     precision=precision)
        R, t = geometry.procrustes(s[:, :, :3] * 0 + e[:, :3, :3].mean(1, keepdims=True) + s[:, :, :3], c)
        return e + 1e-9 * R[:, 0, 0][:, None, None]

    dt = chain_time(vcp_full_step, emb0)
    print(f"{mode} VCP whole (E=512) + procrustes: {dt*1000:7.2f} ms", flush=True)

    def knn_step(x):
        idx = ops.knn(x, 20, precision=precision, approx=cfg.approx_knn)
        return x + 1e-9 * idx[:, :, :3].astype(x.dtype)

    dt = chain_time(knn_step, pts)
    print(f"{mode} knn xyz: {dt*1000:7.2f} ms", flush=True)

    emb64 = jax.device_put(rng.rand(B, N, 64).astype(np.float32))
    dt = chain_time(
        lambda x: x + 1e-9 * ops.knn(
            x, 20, precision=precision, approx=cfg.approx_knn
        ).astype(x.dtype).mean(axis=2, keepdims=True),
        emb64,
    )
    print(f"{mode} knn C=64: {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
