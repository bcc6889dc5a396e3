"""Flash attention with a ONE-PASS fused Pallas backward.

The pointer's training cost is dominated by its 6 attention backwards
(reference workload model/transformer.py:188-224; STATUS.md perf log). The
stock pallas flash backward runs TWO kernels (dkv then dq), each re-doing
the p = softmax recompute and re-streaming q/k/v from HBM. At this
framework's shapes (N <= ~1024, D = 128) everything fits in VMEM one-shot,
so this module implements the whole VJP as ONE kernel per (batch*head,
q-tile): a single s = qk^T recompute serves all five backward matmuls
(dp = do v^T, dq = ds k, dk = ds^T q, dv = p^T do) with dk/dv accumulated
across the sequential q-tile grid.

Forward = the stock one-shot-block flash kernel (already tuned 3.5x over
library defaults here), saving its (l, m) residuals as logsumexp.
Numerics match the XLA attention backward to bf16 tolerance (tests).

Padding: sequence lengths are padded to lane multiples; padded KEYS are
excluded via an in-kernel static ``nk_valid`` column mask (exactly the
segment-id masking the forward uses), padded QUERY rows carry zero do and
thus contribute nothing to dk/dv; their dq rows are sliced off.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.experimental.pallas.ops.tpu import flash_attention as fa

from vcrnet_tpu.ops import flop_meter


def _block_sizes(nq: int, nk: int) -> "fa.BlockSizes":
    bq = next(t for t in (1024, 512, 256, 128) if nq % t == 0)
    bk = next(t for t in (1024, 512, 256, 128) if nk % t == 0)
    return fa.BlockSizes(
        block_q=bq, block_k_major=bk, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bk,
        block_k_dkv=bk, block_q_dkv=bq,
        block_k_major_dq=bk, block_k_dq=bk, block_q_dq=bq,
    )


def _seg_ids(B: int, nq: int, nk: int, nk_valid: int):
    if nk_valid >= nk:
        return None
    kv = jnp.concatenate(
        [
            jnp.zeros((B, nk_valid), jnp.int32),
            jnp.ones((B, nk - nk_valid), jnp.int32),
        ],
        axis=1,
    )
    return fa.SegmentIds(q=jnp.zeros((B, nq), jnp.int32), kv=kv)


def _fwd_library(q, k, v, sm_scale: float, nk_valid: int, save: bool):
    B, H, nq, d = q.shape
    nk = k.shape[2]
    bs = _block_sizes(nq, nk)
    seg = _seg_ids(B, nq, nk, nk_valid)
    if not save:
        o = fa.flash_attention(
            q, k, v, segment_ids=seg, sm_scale=sm_scale, block_sizes=bs
        )
        return o, None
    o, l, m = fa._flash_attention_impl(
        q, k, v, None, seg, True, False, sm_scale,
        bs.block_b, bs.block_q, bs.block_k_major, bs.block_k, False,
    )
    lse = m + jnp.log(l)  # [B, H, nq] f32
    return o, lse


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
    dq_ref, dk_ref, dv_ref,
    *, sm_scale: float, nk_valid: int,
):
    q = q_ref[0]          # [TQ, D] bf16/f32
    k = k_ref[0]          # [NK, D]
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)
    lse_col = lse_ref[0]  # [TQ, 1] f32

    nk = k.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),  # q @ k^T -> [TQ, NK]
        preferred_element_type=jnp.float32,
    ) * sm_scale
    p = jnp.exp(s - lse_col)
    if nk_valid < nk:
        col = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = jnp.where(col < nk_valid, p, 0.0)

    delta = jnp.sum(do * o, axis=1, keepdims=True)  # [TQ, 1]
    do_c = do.astype(v.dtype)
    dp = jax.lax.dot_general(
        do_c, v, (((1,), (1,)), ((), ())),  # do @ v^T -> [TQ, NK]
        preferred_element_type=jnp.float32,
    )
    ds = (p * (dp - delta) * sm_scale).astype(q.dtype)
    p_c = p.astype(q.dtype)

    dq = jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())),  # ds @ k -> [TQ, D]
        preferred_element_type=jnp.float32,
    )
    dk = jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())),  # ds^T @ q -> [NK, D]
        preferred_element_type=jnp.float32,
    )
    dv = jax.lax.dot_general(
        p_c, do_c, (((0,), (0,)), ((), ())),  # p^T @ do -> [NK, D]
        preferred_element_type=jnp.float32,
    )

    dq_ref[0] = dq
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        dk_ref[0] = dk
        dv_ref[0] = dv

    @pl.when(qi != 0)
    def _():
        dk_ref[0] = dk_ref[0] + dk
        dv_ref[0] = dv_ref[0] + dv


def _bwd_fused(
    q, k, v, o, lse, do, sm_scale: float, nk_valid: int,
    interpret: bool = False,
):
    B, H, nq, d = q.shape
    nk = k.shape[2]
    bh = B * H
    r3 = lambda x: x.reshape(bh, x.shape[2], x.shape[3])
    q3, k3, v3, o3, do3 = map(r3, (q, k, v, o, do))
    lse2 = lse.reshape(bh, nq, 1)

    # one-shot q tile when the f32 score tensor fits comfortably in VMEM.
    # nq is padded to a 128 multiple (flash_mha), so every rung divides it;
    # the small rungs extend the envelope to nk = 64k keys
    tile_q = next(
        (
            t for t in (1024, 512, 256, 128, 64, 32, 16, 8)
            if nq % t == 0 and t * nk <= 512 * 1024
        ),
        None,
    )
    if tile_q is None:
        raise ValueError(
            f"fused flash backward: no q tile fits a [tile_q, {nk}] f32 "
            "score block in VMEM (nk > 64k keys); shard the key axis "
            "(parallel/sp_flagship.py) or use the f32-exact attention path"
        )
    kernel = functools.partial(
        _bwd_kernel, sm_scale=sm_scale, nk_valid=nk_valid
    )
    tile_spec = pl.BlockSpec(
        (1, tile_q, d), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    full_spec = pl.BlockSpec(
        (1, nk, d), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    dq3, dk3, dv3 = pl.pallas_call(
        kernel,
        grid=(bh, nq // tile_q),
        in_specs=[
            tile_spec,                      # q
            full_spec,                      # k
            full_spec,                      # v
            tile_spec,                      # o
            tile_spec,                      # do
            pl.BlockSpec((1, tile_q, 1), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),  # lse
        ],
        out_specs=[
            tile_spec,                      # dq
            full_spec,                      # dk (accumulated over q tiles)
            full_spec,                      # dv (accumulated over q tiles)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, nk, d), jnp.float32),
        ],
        interpret=interpret,
    )(q3, k3, v3, o3, do3, lse2)
    shape4 = lambda x, n: x.reshape(B, H, n, d)
    return (
        shape4(dq3, nq).astype(q.dtype),
        shape4(dk3, nk).astype(k.dtype),
        shape4(dv3, nk).astype(v.dtype),
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn_vjp(q, k, v, sm_scale, nk_valid):
    o, _ = _fwd_library(q, k, v, sm_scale, nk_valid, save=False)
    return o


def _attn_fwd(q, k, v, sm_scale, nk_valid):
    o, lse = _fwd_library(q, k, v, sm_scale, nk_valid, save=True)
    return o, (q, k, v, o, lse)


def _attn_bwd(sm_scale, nk_valid, res, do):
    q, k, v, o, lse = res
    B, H, nq, d = q.shape
    # score recompute + dV/dP/dQ/dK matmuls: 5 score-shaped passes
    flop_meter.add(flop_meter.attention(B, H, nq, k.shape[2], d, passes=5.0))
    return _bwd_fused(q, k, v, o, lse, do, sm_scale, nk_valid)


_attn_vjp.defvjp(_attn_fwd, _attn_bwd)


def flash_mha(q, k, v, sm_scale: float):
    """Flash attention [B, H, Nq, D] x [B, H, Nk, D] -> [B, H, Nq, D] with
    the fused one-pass backward. Handles non-lane-multiple sequence lengths
    by padding (padded keys masked, padded query rows sliced off)."""
    B, H, nq, d = q.shape
    nk = k.shape[2]
    flop_meter.add(flop_meter.attention(B, H, nq, nk, d))
    pad_q = (-nq) % 128
    pad_k = (-nk) % 128
    if pad_q:
        q = jnp.pad(q, ((0, 0), (0, 0), (0, pad_q), (0, 0)))
    if pad_k:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, pad_k), (0, 0)))
    out = _attn_vjp(q, k, v, sm_scale, nk)
    return out[:, :, :nq, :] if pad_q else out
