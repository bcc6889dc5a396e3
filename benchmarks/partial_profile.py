"""Partial-protocol (--overlap 0.575 --iter 3) component profile on TPU.

Measures, with chained-scan timing (tunnel-latency free):
  1. full iter=3 eval step (cached target embedding) -> pairs/s
  2. single partial forward
  3. remasked src-attention: fused-XLA re-softmax vs streaming
     colmass+gather+flash, at the protocol's shapes
  4. vcp_top_k_partial alone

Usage: PYTHONPATH=/root/.axon_site:/root/repo python benchmarks/partial_profile.py [B]
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
from vcrnet_tpu.models.vcrnet import vcrnet_iter, _precision
from vcrnet_tpu.models import heads




def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    cfg = Config(
        num_points=1024, emb_dims=512, compute_dtype="bfloat16",
        partial=True, overlap=0.575, iter=3,
    )
    n = cfg.n_cropped
    print(f"B={B}, n_cropped={n}, overlap2={cfg.overlap2:.4f}", flush=True)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = jax.device_put(rng.rand(B, n, 3).astype(np.float32) - 0.5)
    tgt = jax.device_put(rng.rand(B, n, 3).astype(np.float32) - 0.5)
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    # 1. full iter=3 protocol step (cached target embedding)
    def protocol(s):
        out = vcrnet_iter(
            lambda v, a, b: model.apply(v, a, b),
            variables, s, tgt, 3, model=model,
        )
        return s + 1e-9 * out[3][:, None, :]

    dt = chain_time(protocol, src, T1=1, T2=4)
    print(f"iter=3 protocol step: {dt*1000:7.2f} ms -> "
          f"{B/dt:7.1f} pairs/s", flush=True)

    # 2. single partial forward
    def single(s):
        out = model.apply(variables, s, tgt)
        return s + 1e-9 * out[3][:, None, :]

    dt = chain_time(single, src)
    print(f"single partial fwd:   {dt*1000:7.2f} ms", flush=True)

    # 3. remasked attention paths at protocol shapes
    H, Dh = 4, 128
    q = jax.device_put(
        rng.rand(B, H, n, Dh).astype(np.float32).astype(jnp.bfloat16)
    )
    keep_k = int(n * cfg.overlap2)

    from vcrnet_tpu.models.transformer import _remask_topk_keys, _flash

    def xla_remask(qq):
        scores = jnp.einsum(
            "bhnd,bhmd->bhnm", qq, qq, preferred_element_type=jnp.float32
        ) / np.sqrt(Dh)
        p = jax.nn.softmax(scores, axis=-1)
        p2 = _remask_topk_keys(scores, p, keep_k)
        o = jnp.einsum("bhnm,bhmd->bhnd", p2.astype(qq.dtype), qq,
                       preferred_element_type=jnp.float32)
        return qq + (1e-9 * o).astype(qq.dtype)

    dt = chain_time(xla_remask, q)
    print(f"remask XLA path:      {dt*1000:7.2f} ms", flush=True)

    from vcrnet_tpu.ops.pallas_colmass import softmax_colmass

    def stream_remask(qq):
        cm = softmax_colmass(
            qq.reshape(B * H, n, Dh), qq.reshape(B * H, n, Dh),
            1.0 / np.sqrt(Dh),
        )
        col_mass = cm.reshape(B, H, n).sum(axis=1)
        _, keep_idx = jax.lax.top_k(col_mass, keep_k)
        take = lambda arr: jnp.take_along_axis(
            arr, keep_idx[:, None, :, None], axis=2
        )
        o = _flash(qq, take(qq), take(qq), 1.0 / np.sqrt(Dh))
        return qq + (1e-9 * o).astype(qq.dtype)

    dt = chain_time(stream_remask, q)
    print(f"remask streaming:     {dt*1000:7.2f} ms", flush=True)

    # 4. vcp partial head alone
    emb = jax.device_put(
        rng.rand(B, n, 512).astype(np.float32).astype(jnp.bfloat16)
    )

    def vcp(e):
        s, c = heads.vcp_top_k_partial(
            e, e, e[:, :, :3].astype(jnp.float32),
            e[:, :, :3].astype(jnp.float32),
            cfg.overlap2, precision=_precision(cfg),
        )
        return e + (1e-9 * c.mean()).astype(e.dtype)

    dt = chain_time(vcp, emb)
    print(f"vcp partial head:     {dt*1000:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
