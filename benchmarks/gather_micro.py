"""Micro-benchmark of neighbor-gather strategies on TPU.

(a) take_along_axis -> [B,N,k,C] materialized
(b) gather + immediate max over k (does XLA fuse?)
(c) one-hot matmul gather (MXU instead of gather unit)
(d) full graph_feature (concat neighbor+center)
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def chain_time(fn, x0, T1=2, T2=10):
    def chained(x, iters):
        def body(c, _):
            return fn(c), c.ravel()[0]

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.ravel()[0]

    out = {}
    for T in (T1, T2):
        f = jax.jit(lambda x, TT=T: chained(x, TT))
        np.asarray(f(x0))
        t0 = time.perf_counter()
        np.asarray(f(x0))
        out[T] = time.perf_counter() - t0
    return (out[T2] - out[T1]) / (T2 - T1)


def main():
    B, N, k, C = 64, 1024, 20, 128
    rng = np.random.RandomState(0)
    feats = jax.device_put(rng.rand(B, N, C).astype(np.float32))
    idx = jax.device_put(rng.randint(0, N, size=(B, N, k)).astype(np.int32))

    def gather_a(x):
        flat = idx.reshape(B, N * k)
        out = jnp.take_along_axis(x, flat[:, :, None], axis=1)
        out = out.reshape(B, N, k, C)
        return x + 1e-9 * out[:, :, 0, :]

    print(f"(a) take_along_axis [B,N,k,C]: {chain_time(gather_a, feats)*1000:7.2f} ms", flush=True)

    def gather_b(x):
        flat = idx.reshape(B, N * k)
        out = jnp.take_along_axis(x, flat[:, :, None], axis=1)
        out = out.reshape(B, N, k, C).max(axis=2)
        return x + 1e-9 * out

    print(f"(b) gather + max over k:      {chain_time(gather_b, feats)*1000:7.2f} ms", flush=True)

    def gather_c(x):
        onehot = jax.nn.one_hot(idx.reshape(B, N * k), N, dtype=jnp.bfloat16)
        out = jnp.einsum(
            "bgn,bnc->bgc", onehot, x.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).reshape(B, N, k, C)
        return x + 1e-9 * out[:, :, 0, :]

    print(f"(c) one-hot matmul gather:    {chain_time(gather_c, feats)*1000:7.2f} ms", flush=True)

    def gather_d(x):
        from vcrnet_tpu.ops import graph_feature

        out = graph_feature(x, idx=idx)
        return x + 1e-9 * out[:, :, 0, :C]

    print(f"(d) graph_feature concat:     {chain_time(gather_d, feats)*1000:7.2f} ms", flush=True)

    # (e) gather with bf16 data
    feats16 = feats.astype(jnp.bfloat16)

    def gather_e(x):
        flat = idx.reshape(B, N * k)
        out = jnp.take_along_axis(x, flat[:, :, None], axis=1)
        out = out.reshape(B, N, k, C)
        return x + out[:, :, 0, :] * jnp.bfloat16(1e-9)

    print(f"(e) take_along_axis bf16:     {chain_time(gather_e, feats16)*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
