"""Per-component profile of one refinement iteration at the partial-protocol
shapes (B, n_cropped): embed, encoder, decoder x2, VCP stages, SVD.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/iter_component_profile.py [B]
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
from vcrnet_tpu.ops import neg_pairwise_sqdist




def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = Config(
        num_points=1024, emb_dims=512, compute_dtype="bfloat16",
        partial=True, overlap=0.575, iter=3,
    )
    n = cfg.n_cropped
    D = cfg.emb_dims
    print(f"B={B}, n={n}, D={D}", flush=True)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = jax.device_put(rng.rand(B, n, 3).astype(np.float32) - 0.5)
    tgt = jax.device_put(rng.rand(B, n, 3).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    emb0 = jax.jit(lambda s: model.apply(variables, s, method=VCRNet.embed))(src)
    emb = jax.device_put(np.asarray(emb0, np.float32))

    def t(name, fn, x0, **kw):
        dt = chain_time(fn, x0, **kw)
        print(f"{name:28s} {dt*1000:8.2f} ms", flush=True)
        return dt

    # 1. embedding (one cloud)
    def embed(s):
        e = model.apply(variables, s, method=VCRNet.embed)
        return s + 1e-9 * e[:, :, :3].astype(s.dtype)

    t("embed 1 cloud", embed, src)

    # 2. encoder pass
    def enc(e):
        m = model.apply(variables, e, method=VCRNet.encode_target)
        return e + 1e-9 * m.astype(e.dtype)

    t("encoder", enc, emb)

    # 3. full pointer (2 enc + 2 dec) and with cached memory (1 enc + 2 dec)
    def pointer_full(e):
        sd, td = model.apply(
            variables, e, e, method=lambda m, a, b: m.pointer(a, b)
        )
        return e + 1e-9 * (sd + td).astype(e.dtype)

    t("pointer full (2e+2d)", pointer_full, emb)

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

    # 4. vcp partial: stage 1 (selectCom masses) vs full head
    prec = _precision(cfg)

    def stage1(e):
        s = neg_pairwise_sqdist(e, e, precision=prec)
        col_mass = jax.nn.softmax(s, axis=2).sum(axis=1)
        row_mass = jax.nn.softmax(s, axis=1).sum(axis=2)
        return e + 1e-9 * (col_mass + row_mass)[:, :, None].astype(e.dtype)

    t("vcp stage1 (masses)", stage1, emb)

    def sqdist_only(e):
        s = neg_pairwise_sqdist(e, e, precision=prec)
        return e + 1e-9 * s[:, :, :D].astype(e.dtype)

    t("neg_pairwise_sqdist", sqdist_only, emb)

    from vcrnet_tpu.models import heads

    def vcp(e):
        s, c = heads.vcp_top_k_partial(
            e, e, src, tgt, cfg.overlap2, precision=prec
        )
        return e + (1e-9 * c.mean()).astype(e.dtype)

    t("vcp partial full", vcp, emb)

    # 5. svd
    k2 = int(int(n * 0.84 * cfg.overlap2) * 0.52 * cfg.overlap2)
    pts = jax.device_put(rng.rand(B, k2, 3).astype(np.float32))

    def svd(p):
        R, tt = geometry.procrustes(p, p[:, ::-1, :])
        return p + 1e-9 * tt[:, None, :]

    t("procrustes svd", svd, pts)


if __name__ == "__main__":
    main()
