"""Streaming soft-correspondence Pallas kernel (flash-attention pattern).

The whole-whole VCP head (reference getCopairALL, vcrnet_model.py:334-347)
is attention with negative-squared-distance scores:

    corr_i = sum_j softmax_j(-||e_i - f_j||^2) * tgt_j

The XLA path materialises the [B, Ns, Nt] probability matrix in HBM — fine
at N=1024 (268 MB @ B=64) but O(N^2) memory: N=8192 would need 17 GB. This
kernel streams key/value tiles through VMEM with an online softmax
(m/l/acc accumulators), so memory is O(N) and arbitrary cloud sizes fit.

Score identity: softmax_j(-||q-k_j||^2) == softmax_j(2 q.k_j - ||k_j||^2)
(the ||q||^2 term is constant per row and cancels in softmax).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128


def _vcp_kernel(
    q_ref, k_ref, vhi_ref, vlo_ref, norms_ref, out_ref, m_ref, l_ref,
    acc_ref, *, n_k_tiles: int,
):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_ref[:] = jnp.full_like(m_ref[:], -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref[:])
        acc_ref[:] = jnp.zeros_like(acc_ref[:])

    q = q_ref[0]    # [TQ, E]
    k = k_ref[0]    # [TK, E]
    vhi = vhi_ref[0]  # [TK, LANES] bf16 high half of the padded xyz
    vlo = vlo_ref[0]  # [TK, LANES] bf16 residual (v - vhi)

    s = 2.0 * jnp.dot(
        q, k.T, preferred_element_type=jnp.float32
    ) - norms_ref[0, 0][None, :]  # [TQ, TK]

    m_prev = m_ref[:, :1]  # [TQ, 1]
    l_prev = l_ref[:, :1]
    m_cur = s.max(axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    alpha = jnp.exp(m_prev - m_new)  # [TQ, 1]
    p = jnp.exp(s - m_new)  # [TQ, TK] f32
    l_new = alpha * l_prev + p.sum(axis=1, keepdims=True)

    # p @ v on the MXU at the bf16 rate (an f32 x f32 dot here ran ~8x
    # slower and cost ~0.5 ms/call at protocol shapes): both operands are
    # split hi+lo in bf16 and the (lo x lo) term dropped — 3 bf16 passes,
    # combined error ~2^-18 relative, far below the bf16 score noise.
    phi = p.astype(jnp.bfloat16)
    plo = (p - phi.astype(jnp.float32)).astype(jnp.bfloat16)
    f32 = jnp.float32
    acc = (
        acc_ref[:] * alpha
        + jnp.dot(phi, vhi, preferred_element_type=f32)
        + jnp.dot(phi, vlo, preferred_element_type=f32)
        + jnp.dot(plo, vhi, preferred_element_type=f32)
    )
    acc_ref[:] = acc
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == n_k_tiles - 1)
    def _():
        out_ref[0] = (acc_ref[:] / l_ref[:, :1]).astype(out_ref.dtype)


def streaming_soft_correspondence(
    src_emb: jax.Array,
    tgt_emb: jax.Array,
    tgt: jax.Array,
    tile_q: int = 128,
    tile_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """src_emb [B, Ns, E], tgt_emb [B, Nt, E], tgt [B, Nt, 3]
    -> soft correspondences [B, Ns, 3] without materialising [B, Ns, Nt]."""
    B, Ns, E = src_emb.shape
    Nt = tgt_emb.shape[1]
    tile_q = next(t for t in (tile_q, 128, 64, 32, 16, 8) if Ns % t == 0)
    tile_k = next(
        t for t in (tile_k, 512, 256, 128, 64, 32, 16, 8) if Nt % t == 0
    )
    n_k_tiles = Nt // tile_k

    # pad xyz values to lane width so the accumulator tiles cleanly; split
    # hi+lo in bf16 so the kernel's p @ v pass runs at the bf16 MXU rate
    v = jnp.pad(tgt.astype(jnp.float32), ((0, 0), (0, 0), (0, _LANES - 3)))
    v_hi = v.astype(jnp.bfloat16)
    v_lo = (v - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    norms = jnp.sum(
        tgt_emb.astype(jnp.float32) ** 2, axis=-1
    )[:, None, :]  # [B, 1, Nt]

    kernel = functools.partial(_vcp_kernel, n_k_tiles=n_k_tiles)
    vspec = pl.BlockSpec((1, tile_k, _LANES), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        grid=(B, Ns // tile_q, n_k_tiles),
        in_specs=[
            pl.BlockSpec((1, tile_q, E), lambda b, i, j: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_k, E), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM),
            vspec,
            vspec,
            pl.BlockSpec((1, 1, tile_k), lambda b, i, j: (b, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, _LANES), lambda b, i, j: (b, i, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B, Ns, _LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((tile_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((tile_q, _LANES), jnp.float32),  # l
            pltpu.VMEM((tile_q, _LANES), jnp.float32),  # acc
        ],
        interpret=interpret,
    )(src_emb, tgt_emb, v_hi, v_lo, norms)
    return out[:, :, :3]
