"""Per-component profile of the WHOLE-protocol refinement iteration at
reference shapes (B, N=1024): embed (fresh vs cached spatial idx), encoder,
pointer with cached target memory, streaming VCP, SVD, plus the composed
iter1/iter3 registration steps — so whole_iter3 regressions can be
attributed to a stage.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/whole_iter_profile.py [B]
"""

import sys

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
from vcrnet_tpu.models.vcrnet import VCRNet as _V, vcrnet_iter
from vcrnet_tpu import geometry


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = Config(num_points=1024, emb_dims=512, compute_dtype="bfloat16")
    N = cfg.num_points
    print(f"B={B}, N={N}, D={cfg.emb_dims}", flush=True)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    tgt = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    emb0 = jax.jit(lambda s: model.apply(variables, s, method=VCRNet.embed))(src)
    emb = jax.device_put(np.asarray(emb0, np.float32))

    def t(name, fn, x0, **kw):
        dt = chain_time(fn, x0, **kw)
        print(f"{name:34s} {dt*1000:8.2f} ms", flush=True)
        return dt

    # 1. embedding: fresh (computes spatial kNN) vs cached spatial idx
    def embed(s):
        e = model.apply(variables, s, method=VCRNet.embed)
        return s + 1e-9 * e[:, :, :3].astype(s.dtype)

    t("embed 1 cloud (fresh kNN)", embed, src)

    _, sown = model.apply(
        variables, src, method=VCRNet.embed, mutable=["intermediates"]
    )
    from vcrnet_tpu.models.vcrnet import _find_sown
    sp_idx = _find_sown(sown.get("intermediates", {}), "spatial_idx")
    sp_idx = jax.device_put(np.asarray(sp_idx))

    def embed_cached(s):
        e = model.apply(
            variables, s, method=VCRNet.embed, spatial_idx=sp_idx
        )
        return s + 1e-9 * e[:, :, :3].astype(s.dtype)

    t("embed 1 cloud (cached sp-kNN)", embed_cached, src)

    # 2. target-encoder pass (cached across iterations)
    def enc(e):
        m = model.apply(variables, e, method=VCRNet.encode_target)
        return e + 1e-9 * m.astype(e.dtype)

    t("encoder pass", enc, emb)

    mem0 = jax.jit(
        lambda e: model.apply(variables, e, method=VCRNet.encode_target)
    )(emb)
    mem = jax.device_put(np.asarray(mem0, np.float32))

    def pointer_cached(e):
        sd, td = model.apply(
            variables, e, e,
            method=lambda m, a, b: m.pointer(a, b, tgt_memory=mem),
        )
        return e + 1e-9 * (sd + td).astype(e.dtype)

    t("pointer cached (1e+2d)", pointer_cached, emb)

    # 3. whole VCP (streaming) + SVD
    def vcp_svd(e):
        src_k, corr = model.apply(
            variables, e, e, src, tgt,
            method=lambda m, a, b, s, tt: m._vcp(a, b, s, tt),
        )
        R, tr = geometry.procrustes(src_k, corr)
        return e + (1e-9 * tr.mean()).astype(e.dtype)

    t("whole VCP + SVD", vcp_svd, emb)

    # 4. composed register_embedded (pointer+vcp+svd, cached memory)
    def reg(e):
        out = model.apply(
            variables, src, tgt, e, e,
            method=VCRNet.register_embedded, tgt_memory=mem,
        )
        return e + (1e-9 * out[3].mean()).astype(e.dtype)

    t("register_embedded (cached)", reg, emb)

    # 5. full iter1 / iter3 protocol steps
    apply_fn = lambda v, a, b: model.apply(v, a, b)

    def full_iter(n_iter):
        def step(s):
            out = vcrnet_iter(apply_fn, variables, s, tgt, n_iter, model=model)
            return s + 1e-9 * out[3][:, None, :].astype(s.dtype)
        return step

    d1 = t("FULL iter=1", full_iter(1), src, T2=6)
    d3 = t("FULL iter=3", full_iter(3), src, T2=6)
    print(f"per-extra-iteration cost: {(d3 - d1) / 2 * 1000:.2f} ms", flush=True)


if __name__ == "__main__":
    main()
