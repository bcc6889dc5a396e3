"""Decompose the pointer's TRAIN fwd+bwd cost at protocol shapes
(B=64, H=4, N=1024, d_k=128, d_model=512) to locate backward slack.

All gradient outputs are kept LIVE via full sums — keeping only one leaf
element lets XLA DCE most of the backward (the train_ablate.py trap).

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/pointer_train_micro.py [B] [N]
"""

import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vcrnet_tpu.models.transformer import (
    TransformerPointer, MultiHeadAttention, FeedForward, TorchLayerNorm,
)


def chain_time(fn, x0, T1=2, T2=8, reps=3):
    def chained(x, iters):
        def body(c, _):
            return fn(c), c.ravel()[0]

        c, _ = jax.lax.scan(body, x, None, length=iters)
        return c.ravel()[0]

    fs = {}
    for T in (T1, T2):
        fs[T] = jax.jit(lambda x, TT=T: chained(x, TT))
        np.asarray(fs[T](x0))
    ds = []
    for _ in range(reps):
        out = {}
        for T in (T1, T2):
            t0 = time.perf_counter()
            np.asarray(fs[T](x0))
            out[T] = time.perf_counter() - t0
        ds.append((out[T2] - out[T1]) / (T2 - T1))
    return float(np.median(ds))


def live(tree):
    return sum(
        jnp.sum(l.astype(jnp.float32)) for l in jax.tree_util.tree_leaves(tree)
    )


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 1024
    E, H, F = 512, 4, 1024
    dk = E // H
    rng = np.random.RandomState(0)
    bf = jnp.bfloat16

    def t(name, fn, x0):
        dt = chain_time(fn, x0)
        print(f"{name:38s} {dt * 1000:8.2f} ms", flush=True)

    # ---- flash attention at pointer shapes ------------------------------
    from vcrnet_tpu.ops.pallas_attention import flash_mha

    q0 = jnp.asarray(rng.randn(B, H, N, dk), bf)

    def fl_fwd(q):
        o = flash_mha(q, q, q, 1.0 / (dk**0.5))
        return q + 1e-9 * o

    t("flash fwd (1 attn)", fl_fwd, q0)

    def fl_fwdbwd(q):
        def loss(qq):
            return jnp.sum(
                flash_mha(qq, qq, qq, 1.0 / (dk**0.5)).astype(jnp.float32)
            )

        l, g = jax.value_and_grad(loss)(q)
        return q + (1e-9 * l).astype(q.dtype) + 1e-9 * g

    t("flash fwd+bwd (1 attn)", fl_fwdbwd, q0)

    # ---- MHA sublayer (4 projections + flash + out) ---------------------
    mha = MultiHeadAttention(H, E, dtype=bf, flash=True)
    x0 = jnp.asarray(rng.randn(B, N, E), bf)
    vm = mha.init(jax.random.PRNGKey(0), x0[:1], x0[:1], x0[:1])
    mp = vm["params"]

    def mha_fwdbwd(x):
        def loss(p):
            return jnp.sum(
                mha.apply(
                    {"params": p}, x, x, x, train=True
                ).astype(jnp.float32)
            )

        l, g = jax.value_and_grad(loss)(mp)
        return x + (1e-9 * l).astype(x.dtype) + (1e-9 * live(g)).astype(x.dtype)

    t("MHA sublayer fwd+bwd (param grads)", mha_fwdbwd, x0)

    def mha_fwdbwd_x(x):
        def loss(xx):
            return jnp.sum(
                mha.apply(
                    {"params": mp}, xx, xx, xx, train=True
                ).astype(jnp.float32)
            )

        l, g = jax.value_and_grad(loss)(x)
        return x + (1e-9 * l).astype(x.dtype) + 1e-9 * g

    t("MHA sublayer fwd+bwd (input grads)", mha_fwdbwd_x, x0)

    # ---- FF sublayer ----------------------------------------------------
    ff = FeedForward(F, E, dtype=bf)
    vf = ff.init(jax.random.PRNGKey(0), x0[:1])
    fp = vf["params"]

    def ff_fwdbwd(x):
        def loss(p):
            return jnp.sum(
                ff.apply({"params": p}, x, train=True).astype(jnp.float32)
            )

        l, g = jax.value_and_grad(loss)(fp)
        return x + (1e-9 * l).astype(x.dtype) + (1e-9 * live(g)).astype(x.dtype)

    t("FF sublayer fwd+bwd (param grads)", ff_fwdbwd, x0)

    # ---- LayerNorm ------------------------------------------------------
    ln = TorchLayerNorm()
    vl = ln.init(jax.random.PRNGKey(0), x0[:1])
    lp = vl["params"]

    def ln_fwdbwd(x):
        def loss(xx):
            return jnp.sum(
                ln.apply({"params": lp}, xx).astype(jnp.float32)
            )

        l, g = jax.value_and_grad(loss)(x)
        return x + (1e-9 * l).astype(x.dtype) + 1e-9 * g

    t("LayerNorm fwd+bwd (input grads)", ln_fwdbwd, x0)

    # ---- full pointer train=True ---------------------------------------
    ptr = TransformerPointer(emb_dims=E, n_heads=H, ff_dims=F, dtype=bf,
                             flash=True)
    vp = ptr.init(jax.random.PRNGKey(0), x0[:1], x0[:1])
    pp = vp["params"]

    def ptr_fwd(x):
        a, b = ptr.apply({"params": pp}, x, x, train=True)
        return x + 1e-9 * (a + b)

    t("pointer fwd (train=True)", ptr_fwd, x0)

    def ptr_fwdbwd(x):
        def loss(p):
            a, b = ptr.apply({"params": p}, x, x, train=True)
            return jnp.sum((a + b).astype(jnp.float32))

        l, g = jax.value_and_grad(loss)(pp)
        return x + (1e-9 * l).astype(x.dtype) + (1e-9 * live(g)).astype(x.dtype)

    t("pointer fwd+bwd (full param grads)", ptr_fwdbwd, x0)


if __name__ == "__main__":
    main()
