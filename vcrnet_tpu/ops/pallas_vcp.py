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
    q_ref, k_ref, vhi_ref, vlo_ref, norms_ref, *refs,
    n_k_tiles: int, save_lse: bool = False,
):
    if save_lse:
        out_ref, lse_ref, m_ref, l_ref, acc_ref = refs
    else:
        out_ref, m_ref, l_ref, acc_ref = refs
        lse_ref = None
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
        if save_lse:
            # logsumexp of the scores per query row — the backward's
            # residual for the flash-style p recompute. Emitted as a
            # [TQ, 1] column (not lane-broadcast): the full-width variant
            # wrote a [B, Ns, 128] f32 array to HBM (~32 MB at protocol
            # shapes) with only lane 0 meaningful.
            lse_ref[0] = (
                m_ref[:, :1] + jnp.log(l_ref[:, :1])
            ).astype(lse_ref.dtype)


def _run_streaming(
    src_emb, tgt_emb, tgt, tile_q, tile_k, interpret, save_lse: bool
):
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

    kernel = functools.partial(
        _vcp_kernel, n_k_tiles=n_k_tiles, save_lse=save_lse
    )
    vspec = pl.BlockSpec((1, tile_k, _LANES), lambda b, i, j: (b, j, 0),
                         memory_space=pltpu.VMEM)
    o_spec = pl.BlockSpec(
        (1, tile_q, _LANES), lambda b, i, j: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    o_shape = jax.ShapeDtypeStruct((B, Ns, _LANES), jnp.float32)
    lse_spec = pl.BlockSpec(
        (1, tile_q, 1), lambda b, i, j: (b, i, 0),
        memory_space=pltpu.VMEM,
    )
    lse_shape = jax.ShapeDtypeStruct((B, Ns, 1), jnp.float32)
    outs = pl.pallas_call(
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
        out_specs=[o_spec, lse_spec] if save_lse else o_spec,
        out_shape=[o_shape, lse_shape] if save_lse else o_shape,
        scratch_shapes=[
            pltpu.VMEM((tile_q, _LANES), jnp.float32),  # m
            pltpu.VMEM((tile_q, _LANES), jnp.float32),  # l
            pltpu.VMEM((tile_q, _LANES), jnp.float32),  # acc
        ],
        interpret=interpret,
    )(src_emb, tgt_emb, v_hi, v_lo, norms)
    if save_lse:
        out, lse = outs
        return out[:, :, :3], lse
    return outs[:, :, :3]


def streaming_soft_correspondence(
    src_emb: jax.Array,
    tgt_emb: jax.Array,
    tgt: jax.Array,
    tile_q: int = 128,
    tile_k: int = 1024,
    interpret: bool = False,
) -> jax.Array:
    """src_emb [B, Ns, E], tgt_emb [B, Nt, E], tgt [B, Nt, 3]
    -> soft correspondences [B, Ns, 3] without materialising [B, Ns, Nt].
    Forward only (no VJP) — the eval refinement path. For training use
    :func:`soft_correspondence_vjp`."""
    return _run_streaming(
        src_emb, tgt_emb, tgt, tile_q, tile_k, interpret, save_lse=False
    )


def _vcp_bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, norms_ref,
    dq_ref, dk_ref, dv_ref, cs_ref,
    *, n_q_tiles: int,
):
    """One-pass streaming-VCP backward, one program per (batch, q-tile)
    with the FULL key set resident (the same structure as the fused flash
    backward, ops/pallas_attention.py::_bwd_kernel). Scores are recomputed
    flash-style from the saved logsumexp; dk/dv accumulate across the
    sequential q-tile grid; the −2·k·colsum(ds) term of dk (the gradient
    of the −‖k_j‖² score bias) is applied once at the last q step from the
    accumulated column sums."""
    f32 = jnp.float32
    q = q_ref[0]          # [TQ, E] bf16/f32
    k = k_ref[0]          # [NK, E]
    v = v_ref[0]          # [NK, LANES] (xyz zero-padded)
    o = o_ref[0].astype(f32)      # [TQ, LANES]
    do = do_ref[0].astype(f32)    # [TQ, LANES]
    lse_col = lse_ref[0]  # [TQ, 1] f32

    s = 2.0 * jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    ) - norms_ref[0, 0][None, :]  # [TQ, NK]
    p = jnp.exp(s - lse_col)

    # delta_i = sum_j p_ij dp_ij = do_i . o_i (padding lanes are zero)
    delta = jnp.sum(do * o, axis=1, keepdims=True)  # [TQ, 1]
    do_c = do.astype(v.dtype)
    dp = jax.lax.dot_general(
        do_c, v, (((1,), (1,)), ((), ())),
        preferred_element_type=f32,
    )
    ds = (p * (dp - delta)).astype(q.dtype)  # [TQ, NK]
    p_c = p.astype(q.dtype)

    dq = 2.0 * jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),  # ds @ k -> [TQ, E]
        preferred_element_type=f32,
    )
    dk = 2.0 * jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),  # ds^T @ q -> [NK, E]
        preferred_element_type=f32,
    )
    dv = jax.lax.dot_general(
        p_c, do_c, (((0,), (0,)), ((), ())),  # p^T @ do -> [NK, LANES]
        preferred_element_type=f32,
    )
    cs = jnp.sum(ds.astype(f32), axis=0)[None, :]  # [1, NK] colsum

    dq_ref[0] = dq
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = dk
        dv_ref[0] = dv
        cs_ref[:] = cs

    @pl.when(qi != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk
        dv_ref[0] = dv_ref[0] + dv
        cs_ref[:] = cs_ref[:] + cs

    @pl.when(qi == n_q_tiles - 1)
    def _():
        # d(-||k_j||^2)/dk_j = -2 k_j, weighted by the total ds mass of
        # key j across every query row
        dk_ref[0] = dk_ref[0] - 2.0 * cs_ref[:].T * k.astype(f32)


def _vcp_bwd(src_emb, tgt_emb, v_pad, corr_pad, dcorr_pad, lse,
             interpret: bool = False):
    B, Ns, E = src_emb.shape
    Nt = tgt_emb.shape[1]
    tile_q = next(
        t for t in (256, 128, 64, 32, 16, 8)
        if Ns % t == 0 and t * Nt * 4 <= 1024 * 1024
    )
    n_q_tiles = Ns // tile_q
    norms = jnp.sum(
        tgt_emb.astype(jnp.float32) ** 2, axis=-1
    )[:, None, :]  # [B, 1, Nt]
    kernel = functools.partial(_vcp_bwd_kernel, n_q_tiles=n_q_tiles)
    q_spec = pl.BlockSpec((1, tile_q, E), lambda b, i: (b, i, 0),
                          memory_space=pltpu.VMEM)
    k_spec = pl.BlockSpec((1, Nt, E), lambda b, i: (b, 0, 0),
                          memory_space=pltpu.VMEM)
    vpad_spec = pl.BlockSpec((1, Nt, _LANES), lambda b, i: (b, 0, 0),
                             memory_space=pltpu.VMEM)
    opad_spec = pl.BlockSpec((1, tile_q, _LANES), lambda b, i: (b, i, 0),
                             memory_space=pltpu.VMEM)
    dq, dk, dv = pl.pallas_call(
        kernel,
        grid=(B, n_q_tiles),
        in_specs=[
            q_spec, k_spec, vpad_spec, opad_spec, opad_spec,
            pl.BlockSpec((1, tile_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),  # lse
            pl.BlockSpec((1, 1, Nt), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),  # key norms
        ],
        out_specs=[q_spec, k_spec, vpad_spec],
        out_shape=[
            jax.ShapeDtypeStruct((B, Ns, E), jnp.float32),
            jax.ShapeDtypeStruct((B, Nt, E), jnp.float32),
            jax.ShapeDtypeStruct((B, Nt, _LANES), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((1, Nt), jnp.float32)],  # ds colsums
        interpret=interpret,
    )(src_emb, tgt_emb, v_pad, corr_pad, dcorr_pad, lse, norms)
    return dq, dk, dv


def streaming_vjp_supported(ns: int, nt: int, e: int) -> bool:
    """Backward VMEM gate: full key set + f32 dk/dv accumulators resident.
    k [Nt,E]bf16 + dk [Nt,E]f32 + v/dv [Nt,128] + score tiles ~1 MB x3."""
    if ns % 8 or nt % 8:
        return False
    resident = nt * e * (2 + 4) + nt * _LANES * (2 + 4) + 4 * 1024 * 1024
    return resident <= 13 * 1024 * 1024


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def soft_correspondence_vjp(src_emb, tgt_emb, tgt, interpret=False):
    """Differentiable streaming soft correspondence (training path):
    the same O(N)-memory forward as :func:`streaming_soft_correspondence`
    plus a one-pass Pallas backward — neither direction materialises the
    [B, Ns, Nt] probability matrix in HBM (the XLA train path writes and
    re-reads it twice: ~270 MB per direction at B=64, N=1024)."""
    return _run_streaming(
        src_emb, tgt_emb, tgt, 128, 1024, interpret, save_lse=False
    )


def _sc_fwd(src_emb, tgt_emb, tgt, interpret):
    corr, lse = _run_streaming(
        src_emb, tgt_emb, tgt, 128, 1024, interpret, save_lse=True
    )
    return corr, (src_emb, tgt_emb, tgt, corr, lse)


def _sc_bwd(interpret, res, dcorr):
    src_emb, tgt_emb, tgt, corr, lse = res
    pad = lambda a: jnp.pad(
        a.astype(jnp.float32), ((0, 0), (0, 0), (0, _LANES - a.shape[-1]))
    )
    # v stays f32: the dp/dv contractions are only _LANES wide (vs the
    # E-wide dq/dk matmuls), so f32 costs ~nothing here, and dp feeds the
    # cancellation-sensitive ds = p (dp - delta)
    v_pad = pad(tgt)
    dq, dk, dv = _vcp_bwd(
        src_emb, tgt_emb, v_pad, pad(corr), pad(dcorr), lse,
        interpret=interpret,
    )
    return (
        dq.astype(src_emb.dtype),
        dk.astype(tgt_emb.dtype),
        dv[:, :, :3].astype(tgt.dtype),
    )


soft_correspondence_vjp.defvjp(_sc_fwd, _sc_bwd)
