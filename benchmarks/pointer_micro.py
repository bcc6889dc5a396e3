"""Pointer/decoder + glue micro-profile at protocol shapes.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/pointer_micro.py [B] [N]
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

from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet
from vcrnet_tpu.models.vcrnet import _precision
from vcrnet_tpu import geometry




def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    cfg = Config(
        num_points=1024, emb_dims=512, compute_dtype="bfloat16",
        partial=True, overlap=0.575, iter=3,
    )
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    tgt = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    emb = jax.device_put(
        rng.rand(B, N, 512).astype(np.float32).astype(jnp.bfloat16)
    )
    mem = jax.device_put(
        rng.rand(B, N, 512).astype(np.float32).astype(jnp.bfloat16)
    )

    def t(name, fn, x0):
        dt = chain_time(fn, x0)
        print(f"{name:30s} {dt*1000:8.2f} ms", flush=True)

    # one decode (self-attn + remasked src-attn + FF)
    def decode(e):
        d = model.apply(
            variables, e, mem,
            method=lambda m, a, b: m.pointer._decode(a, b),
        )
        return e + 1e-9 * d.astype(e.dtype)

    t("decode (remask src-attn)", decode, emb)

    def encode(e):
        d = model.apply(
            variables, e, method=lambda m, a: m.pointer._encode(a)
        )
        return e + 1e-9 * d.astype(e.dtype)

    t("encode (flash self-attn)", encode, emb)

    # cached-memory pointer: 1 encode + 2 decodes
    def pointer_cached(e):
        sd, td = model.apply(
            variables, e, e,
            method=lambda m, a, b: m.pointer(a, b, tgt_memory=mem),
        )
        return e + 1e-9 * (sd + td).astype(e.dtype)

    t("pointer cached (1e+2d)", pointer_cached, emb)

    # embed with cached spatial idx
    from vcrnet_tpu.ops import knn
    idx = jax.jit(lambda s: knn(s, k=20))(src)
    idx = jax.device_put(np.asarray(idx))

    def embed_cached(s):
        e = model.apply(
            variables, s, method=VCRNet.embed, spatial_idx=idx
        )
        return s + 1e-9 * e[:, :, :3].astype(s.dtype)

    t("embed (cached spatial idx)", embed_cached, src)

    def embed_plain(s):
        e = model.apply(variables, s, method=VCRNet.embed)
        return s + 1e-9 * e[:, :, :3].astype(s.dtype)

    t("embed (full)", embed_plain, src)

    # gather_max_from_idx alone
    from vcrnet_tpu.ops.pallas_edgeconv import gather_max_from_idx
    vals = jax.device_put(
        rng.rand(B, N, 256).astype(np.float32).astype(jnp.bfloat16)
    )

    def gmfi(v):
        o = gather_max_from_idx(idx, v)
        return v + 1e-9 * o

    t("gather_max_from_idx F=256", gmfi, vals)

    # procrustes at K2
    pts = jax.device_put(rng.rand(B, cfg.pair_k, 3).astype(np.float32))

    def svd(p):
        R, tt = geometry.procrustes(p, p[:, ::-1, :] * 1.0001)
        return p + 1e-9 * tt[:, None, :]

    t("procrustes svd", svd, pts)

    # compose/transform glue
    R = jax.device_put(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))

    def glue(s):
        s2 = geometry.transform_points(s, R, s.mean(axis=1))
        return s2 * 0.999

    t("transform_points", glue, src)


if __name__ == "__main__":
    main()
