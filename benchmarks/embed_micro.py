"""Micro-profile of LPDNet's internals at protocol shapes: fused_edge_conv,
fused_knn_gather_max, fused_knn, and the dense layers.

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/embed_micro.py [B] [N]
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




def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 768
    k = 20
    rng = np.random.RandomState(0)
    xyz = jax.device_put(rng.rand(B, N, 3).astype(np.float32) - 0.5)
    x64 = jax.device_put(
        rng.rand(B, N, 64).astype(np.float32).astype(jnp.bfloat16)
    )
    a128 = jax.device_put(
        rng.rand(B, N, 128).astype(np.float32).astype(jnp.bfloat16)
    )
    a256 = jax.device_put(
        rng.rand(B, N, 256).astype(np.float32).astype(jnp.bfloat16)
    )
    k2 = jax.device_put(
        rng.rand(128, 128).astype(np.float32).astype(jnp.bfloat16)
    )
    b2 = jax.device_put(np.zeros(128, np.float32).astype(jnp.bfloat16))

    from vcrnet_tpu.ops.pallas_edgeconv import (
        fused_edge_conv, fused_knn_gather_max,
    )
    from vcrnet_tpu.ops.pallas_knn import fused_knn

    def t(name, fn, x0):
        dt = chain_time(fn, x0)
        print(f"{name:28s} {dt*1000:8.2f} ms", flush=True)

    def edge(x):
        x1, x2 = fused_edge_conv(x, a128, a128, k2, b2, k=k,
                                 negative_slope=0.0)
        return x + 1e-9 * (x1[:, :, :64] + x2[:, :, :64]).astype(x.dtype)

    t("fused_edge_conv (DG block)", edge, x64)

    def edge_i8(x):
        x1, x2 = fused_edge_conv(x, a128, a128, k2, b2, k=k,
                                 negative_slope=0.0, int8_gather=True)
        return x + 1e-9 * (x1[:, :, :64] + x2[:, :, :64]).astype(x.dtype)

    t("fused_edge_conv int8 (eval)", edge_i8, x64)

    def gmax(x):
        o = fused_knn_gather_max(x, a256, k=k)
        return x + 1e-9 * o[:, :, :3].astype(x.dtype)

    t("fused_knn_gather_max (SN)", gmax, xyz)

    def gmax_i8(x):
        o = fused_knn_gather_max(x, a256, k=k, int8_gather=True)
        return x + 1e-9 * o[:, :, :3].astype(x.dtype)

    t("fused_knn_gather_max int8", gmax_i8, xyz)

    def knn_only(x):
        idx = fused_knn(x, k)
        return x + 1e-9 * idx[:, :, :3].astype(x.dtype)

    t("fused_knn xyz", knn_only, xyz)

    def knn_feat(x):
        idx = fused_knn(x, k)
        return x + 1e-9 * idx[:, :, :3].sum(-1, keepdims=True).astype(x.dtype)

    t("fused_knn 64d", knn_feat, x64)

    def dense_chain(x):
        y = x @ k2[:64] @ k2 @ k2 @ k2
        return x + 1e-9 * y[:, :, :64].astype(x.dtype)

    t("4x dense 128", dense_chain, x64)


if __name__ == "__main__":
    main()
