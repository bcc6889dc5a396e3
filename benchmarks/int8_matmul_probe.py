"""Is int8 MXU worth it for the pointer's projection/FF matmuls at
protocol shapes ([B*N, 512] x [512, 512] and the FF pair), counting the
dynamic per-row activation quantization overhead?

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/int8_matmul_probe.py
"""

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chain_time


def quant_rows(x):
    # per-row symmetric int8: scale = absmax/127
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32) / 127.0
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def main():
    M, K, NF = 64 * 1024, 512, 512
    rng = np.random.RandomState(0)
    x = jax.device_put(rng.randn(M, K).astype(np.float32).astype(jnp.bfloat16))
    w = jax.device_put(rng.randn(K, NF).astype(np.float32).astype(jnp.bfloat16))
    wq, ws = jax.jit(lambda w: quant_rows(w.T))(w)  # per-out-channel
    wq = jax.device_put(np.asarray(wq).T)  # [K, NF] int8
    ws = jax.device_put(np.asarray(ws).reshape(1, NF))
    w1 = jax.device_put(rng.randn(K, 2 * NF).astype(np.float32).astype(jnp.bfloat16))
    w1q, w1s = jax.jit(lambda w: quant_rows(w.T))(w1)
    w1q = jax.device_put(np.asarray(w1q).T)
    w1s = jax.device_put(np.asarray(w1s).reshape(1, 2 * NF))
    w2 = jax.device_put(
        (rng.randn(2 * NF, NF) / 32).astype(np.float32).astype(jnp.bfloat16)
    )
    w2q, w2s = jax.jit(lambda w: quant_rows(w.T))(w2)
    w2q = jax.device_put(np.asarray(w2q).T)
    w2s = jax.device_put(np.asarray(w2s).reshape(1, NF))

    def bf16_mm(c):
        return c @ w

    def int8_mm(c):
        q, s = quant_rows(c)
        acc = jax.lax.dot_general(
            q, wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc.astype(jnp.float32) * s * ws).astype(jnp.bfloat16)

    def bf16_ff(c):
        h = jax.nn.relu(c @ w1)
        return h @ w2

    def int8_ff(c):
        q, s = quant_rows(c)
        acc = jax.lax.dot_general(
            q, w1q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        h = jax.nn.relu((acc.astype(jnp.float32) * s * w1s)).astype(jnp.bfloat16)
        q2, s2 = quant_rows(h)
        acc2 = jax.lax.dot_general(
            q2, w2q, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (acc2.astype(jnp.float32) * s2 * w2s).astype(jnp.bfloat16)

    for name, fn in [
        ("bf16 512x512 proj", bf16_mm),
        ("int8 512x512 proj (quant incl)", int8_mm),
        ("bf16 FF 512->1024->512", bf16_ff),
        ("int8 FF 512->1024->512", int8_ff),
    ]:
        t = chain_time(fn, x)
        print(f"{name:34s} {t*1000:7.3f} ms", flush=True)

    # numerics
    ybf = np.asarray(jax.jit(lambda x: x @ w)(x), np.float32)
    yq = np.asarray(jax.jit(int8_mm)(x), np.float32)
    rel = np.abs(yq - ybf).mean() / np.abs(ybf).mean()
    print(f"int8 proj mean rel err vs bf16: {rel:.4f}")


if __name__ == "__main__":
    main()
