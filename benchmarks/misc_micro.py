"""Misc TPU micro-experiments: top_k costs at VCP shapes, remask variants.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/misc_micro.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import os, sys as _sys
_sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from benchmarks.timing import chain_time




def t(name, fn, x0):
    dt = chain_time(fn, x0)
    print(f"{name:34s} {dt*1000:8.2f} ms", flush=True)


def main():
    B, N, K1, K2 = 64, 768, 494, 196
    rng = np.random.RandomState(0)
    cm = jax.device_put(rng.rand(B, N).astype(np.float32))
    p = jax.device_put(rng.rand(B, K1, K1).astype(np.float32))
    conf = jax.device_put(rng.rand(B, K1).astype(np.float32))

    # 1. the three top_k calls in vcp_top_k_partial, separately
    def topk_colmass(x):
        _, i = jax.lax.top_k(x, K1)
        return x + 1e-9 * i[:, :1].astype(x.dtype)

    t("top_k([64,768], 494)", topk_colmass, cm)

    def topk_p1(x):
        v, i = jax.lax.top_k(x, 1)
        return x + 1e-9 * v

    t("top_k([64,494,494], 1)", topk_p1, p)

    def argmax_p(x):
        i = jnp.argmax(x, axis=-1)
        v = jnp.max(x, axis=-1)
        return x + 1e-9 * (v + i.astype(x.dtype))[..., None]

    t("argmax+max [64,494,494]", argmax_p, p)

    def topk_conf(x):
        _, i = jax.lax.top_k(x, K2)
        return x + 1e-9 * i[:, :1].astype(x.dtype)

    t("top_k([64,494], 196)", topk_conf, conf)

    def softmax_p(x):
        return x * 0.9999 + 1e-9 * jax.nn.softmax(x, axis=-1)

    t("softmax [64,494,494]", softmax_p, p)

    # 2. remask variants at [B,H,N,N] attention shapes
    H, Dh = 4, 128
    q = jax.device_put(
        rng.rand(B, H, N, Dh).astype(np.float32).astype(jnp.bfloat16)
    )
    keep_k = 588
    from vcrnet_tpu.models.transformer import _remask_topk_keys

    def remask_f32(qq):
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", qq, qq, preferred_element_type=jnp.float32
        ) * (Dh ** -0.5)
        pa = jax.nn.softmax(scores, axis=-1)
        p2 = _remask_topk_keys(scores, pa, keep_k)
        o = jnp.einsum("bhnm,bhmd->bhnd", p2.astype(qq.dtype), qq,
                       preferred_element_type=jnp.float32)
        return qq + (1e-9 * o).astype(qq.dtype)

    t("remask f32 scores (current)", remask_f32, q)

    def remask_bf16(qq):
        scores = (jnp.einsum(
            "bhnd,bhmd->bhnm", qq, qq, preferred_element_type=jnp.float32
        ) * (Dh ** -0.5)).astype(jnp.bfloat16)
        s32 = scores.astype(jnp.float32)
        pa = jax.nn.softmax(s32, axis=-1)
        p2 = _remask_topk_keys(s32, pa, keep_k)
        o = jnp.einsum("bhnm,bhmd->bhnd", p2.astype(qq.dtype), qq,
                       preferred_element_type=jnp.float32)
        return qq + (1e-9 * o).astype(qq.dtype)

    t("remask bf16 score storage", remask_bf16, q)

    # 3. remask via gather kept keys + flash (colmass from XLA softmax)
    from vcrnet_tpu.models.transformer import _flash

    def remask_gather(qq):
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", qq, qq, preferred_element_type=jnp.float32
        ) * (Dh ** -0.5)
        pa = jax.nn.softmax(scores, axis=-1)
        colm = pa.sum(axis=(1, 2))  # [B, N]
        _, keep = jax.lax.top_k(colm, keep_k)
        take = lambda arr: jnp.take_along_axis(
            arr, keep[:, None, :, None], axis=2
        )
        o = _flash(qq, take(qq), take(qq), Dh ** -0.5)
        return qq + (1e-9 * o).astype(qq.dtype)

    t("remask xla-colmass + flash", remask_gather, q)


if __name__ == "__main__":
    main()
