"""Training-path ablation: fwd+bwd (grads wrt params) per component, on the
real TPU with chained-scan timing (cancels tunnel latency).

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/train_ablate.py
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from vcrnet_tpu.config import Config
from vcrnet_tpu.models.embeddings import LPDNet
from vcrnet_tpu.models.transformer import TransformerPointer
from vcrnet_tpu.models import heads
from vcrnet_tpu.models.vcrnet import _precision, _dtype
from vcrnet_tpu import geometry


def chain_time(fn, x0, T1=2, T2=8):
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
    B, N, E = 64, 1024, 512
    cfg = Config(num_points=N, emb_dims=E, compute_dtype="bfloat16")
    precision, dtype = _precision(cfg), _dtype(cfg)
    rng = np.random.RandomState(0)
    # embedding runs at 2B (stacked src+tgt) in the train step
    pts2 = jax.device_put(rng.rand(2 * B, N, 3).astype(np.float32) - 0.5)
    emb0 = jax.device_put(rng.rand(B, N, E).astype(np.float32))

    lpd = LPDNet(emb_dims=E, precision=precision, dtype=dtype)
    v = lpd.init(jax.random.PRNGKey(0), pts2[:1])
    params = v["params"]

    def emb_fwd(x):
        e = lpd.apply({"params": params}, x, True)
        return x + 1e-9 * e[:, :, :3].astype(x.dtype)

    print(f"emb fwd-only (train=True, 2B={2*B}): "
          f"{chain_time(emb_fwd, pts2)*1000:7.2f} ms", flush=True)

    def _grad_live(g):
        # full-sum every grad leaf: keeping only leaves()[0][0] lets XLA
        # DCE the other params' dW matmuls (and for params near the loss,
        # most of the backward), wildly underreporting fwd+bwd time
        return sum(
            jnp.sum(l.astype(jnp.float32))
            for l in jax.tree_util.tree_leaves(g)
        )

    def emb_fwdbwd(x):
        loss, g = jax.value_and_grad(
            lambda p: lpd.apply({"params": p}, x, True).astype(
                jnp.float32).mean()
        )(params)
        return x + 1e-9 * loss + 1e-12 * _grad_live(g)

    print(f"emb fwd+bwd (train=True, 2B={2*B}): "
          f"{chain_time(emb_fwdbwd, pts2)*1000:7.2f} ms", flush=True)

    def emb_fwd_eval(x):
        e = lpd.apply({"params": params}, x, False)
        return x + 1e-9 * e[:, :, :3].astype(x.dtype)

    print(f"emb fwd-only (train=False fused, 2B={2*B}): "
          f"{chain_time(emb_fwd_eval, pts2)*1000:7.2f} ms", flush=True)

    ptr = TransformerPointer(emb_dims=E, precision=precision, dtype=dtype,
                             flash=True)
    vp = ptr.init(jax.random.PRNGKey(0), emb0[:1], emb0[:1])
    pparams = vp["params"]

    def ptr_fwdbwd(e):
        def loss_fn(p):
            a, b = ptr.apply({"params": p}, e, e)
            return (a + b).astype(jnp.float32).mean()

        loss, g = jax.value_and_grad(loss_fn)(pparams)
        return e + 1e-9 * loss + 1e-12 * _grad_live(g)

    print(f"pointer fwd+bwd (B={B}): "
          f"{chain_time(ptr_fwdbwd, emb0)*1000:7.2f} ms", flush=True)

    def vcp_svd_fwdbwd(e):
        def loss_fn(ein):
            s, c = heads.vcp_top_k_whole(
                ein, ein, ein[:, :, :3], ein[:, :, :3],
                precision=precision,
            )
            R, t = geometry.procrustes(s, c)
            return R.astype(jnp.float32).mean() + t.astype(jnp.float32).mean()

        loss, g = jax.value_and_grad(loss_fn)(e)
        return e + 1e-9 * loss + 1e-12 * g

    print(f"vcp whole + svd fwd+bwd (B={B}): "
          f"{chain_time(vcp_svd_fwdbwd, emb0)*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
