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
library defaults here), with NO softmax residuals saved: the backward's
score recompute already holds the full [TQ, NK] f32 block in VMEM, so it
derives its own (m, l) row statistics there. Saving them from the forward
instead (the library's save_residuals path) writes two lane-broadcast
f32 [B, H, N, 128] arrays to HBM (~268 MB per call at B=64 H=4 N=1024)
that XLA then re-reads just to slice lane 0 — measured ~5 ms/step of the
train step across the 6 attention calls (train_trace, round 5).
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


def _fwd_library(q, k, v, sm_scale: float, nk_valid: int):
    B, H, nq, d = q.shape
    nk = k.shape[2]
    bs = _block_sizes(nq, nk)
    seg = _seg_ids(B, nq, nk, nk_valid)
    return fa.flash_attention(
        q, k, v, segment_ids=seg, sm_scale=sm_scale, block_sizes=bs
    )


def _bwd_kernel(
    q_ref, k_ref, v_ref, o_ref, do_ref,
    dq_ref, dk_ref, dv_ref,
    dk_acc, dv_acc,
    *, sm_scale: float, nk_valid: int,
):
    q = q_ref[0]          # [TQ, D] bf16/f32
    k = k_ref[0]          # [NK, D]
    v = v_ref[0]
    o = o_ref[0].astype(jnp.float32)
    do = do_ref[0].astype(jnp.float32)

    nk = k.shape[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),  # q @ k^T -> [TQ, NK]
        preferred_element_type=jnp.float32,
    ) * sm_scale
    # the forward saves NO softmax residuals: recompute the row stats from
    # the in-VMEM f32 score block (one max + one sum-exp on the VPU, free
    # next to the five matmuls). Padded keys are masked BEFORE the max so
    # (m, l) — and hence p — see only valid columns, exactly like the
    # forward's segment-id masking; exp(-1e30 - m) underflows to 0.
    if nk_valid < nk:
        col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(col < nk_valid, s, -1e30)
    m = jnp.max(s, axis=1, keepdims=True)       # [TQ, 1]
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)       # [TQ, 1]
    p = e / l

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

    # outputs are emitted in the PARAMETER dtype directly (bf16 in the bf16
    # profile): casting outside the kernel materialised each f32
    # [B·H, N, D] gradient to HBM plus a separate convert pass (~0.3 ms
    # per convert at protocol shapes, ~18 converts per train step).
    # dk/dv still accumulate across the sequential q-tile grid in f32
    # VMEM scratch; only the final write rounds.
    dq_ref[0] = dq.astype(dq_ref.dtype)
    qi = pl.program_id(1)

    @pl.when(qi == 0)
    def _():
        dk_acc[...] = dk
        dv_acc[...] = dv

    @pl.when(qi != 0)
    def _():
        dk_acc[...] += dk
        dv_acc[...] += dv

    @pl.when(qi == pl.num_programs(1) - 1)
    def _():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _bwd_fused(
    q, k, v, o, do, sm_scale: float, nk_valid: int,
    interpret: bool = False,
):
    B, H, nq, d = q.shape
    nk = k.shape[2]
    bh = B * H
    r3 = lambda x: x.reshape(bh, x.shape[2], x.shape[3])
    q3, k3, v3, o3, do3 = map(r3, (q, k, v, o, do))

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
        ],
        out_specs=[
            tile_spec,                      # dq
            full_spec,                      # dk (accumulated over q tiles)
            full_spec,                      # dv (accumulated over q tiles)
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), k.dtype),
            jax.ShapeDtypeStruct((bh, nk, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((nk, d), jnp.float32),  # dk accumulator
            pltpu.VMEM((nk, d), jnp.float32),  # dv accumulator
        ],
        interpret=interpret,
    )(q3, k3, v3, o3, do3)
    shape4 = lambda x, n: x.reshape(B, H, n, d)
    return shape4(dq3, nq), shape4(dk3, nk), shape4(dv3, nk)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _attn_vjp(q, k, v, sm_scale, nk_valid):
    return _fwd_library(q, k, v, sm_scale, nk_valid)


def _attn_fwd(q, k, v, sm_scale, nk_valid):
    o = _fwd_library(q, k, v, sm_scale, nk_valid)
    return o, (q, k, v, o)


def _attn_bwd(sm_scale, nk_valid, res, do):
    q, k, v, o = res
    B, H, nq, d = q.shape
    # score recompute + dV/dP/dQ/dK matmuls: 5 score-shaped passes
    flop_meter.add(flop_meter.attention(B, H, nq, k.shape[2], d, passes=5.0))
    return _bwd_fused(q, k, v, o, do, sm_scale, nk_valid)


_attn_vjp.defvjp(_attn_fwd, _attn_bwd)


def _fwd_packed_kernel(q_ref, k_ref, v_ref, out_ref, *, sm_scale: float):
    q = q_ref[0]  # [TQ, dk]
    k = k_ref[0]  # [NK, dk]
    v = v_ref[0]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),  # q @ k^T -> [TQ, NK]
        preferred_element_type=jnp.float32,
    ) * sm_scale
    m = jnp.max(s, axis=1, keepdims=True)
    e = jnp.exp(s - m)
    l = jnp.sum(e, axis=1, keepdims=True)
    o = jax.lax.dot_general(
        e.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = (o / l).astype(out_ref.dtype)


def flash_packed_supported(nq: int, nk: int, d_model: int,
                           n_heads: int) -> bool:
    dk = d_model // n_heads
    if d_model % n_heads or dk % 128 or nq % 128 or nk % 128:
        return False
    # one-shot: k/v for one head + the f32 score/exp tiles must fit VMEM
    return _packed_tile_q(nq, nk) is not None


def _packed_tile_q(nq: int, nk: int):
    """Largest q tile whose f32 score/exp blocks fit VMEM. One-shot (1024)
    A/B'd best at the protocol shapes; VCRNET_FLASH_TILE_Q caps the ladder
    for re-A/B (smaller tiles = more programs = more cross-program
    MXU/VPU pipelining, at the cost of re-reading k/v per tile)."""
    import os

    cap = int(os.environ.get("VCRNET_FLASH_TILE_Q", "0") or 0)
    ladder = (1024, 512, 256, 128)
    if cap:
        ladder = tuple(t for t in ladder if t <= cap) or (128,)
    return next(
        (
            t for t in ladder
            if nq % t == 0 and t * nk * 8 <= 8 * 1024 * 1024
        ),
        None,
    )


def _flash_packed_impl(q, k, v, sm_scale: float, n_heads: int,
                       interpret: bool = False):
    B, nq, d_model = q.shape
    nk = k.shape[1]
    dk = d_model // n_heads
    tile_q = _packed_tile_q(nq, nk)
    kernel = functools.partial(_fwd_packed_kernel, sm_scale=sm_scale)
    # heads are COLUMN BLOCKS of the packed [B, N, H*dk] activations; the
    # t axis is innermost so each head's k/v block stays resident across
    # its q tiles
    q_spec = pl.BlockSpec(
        (1, tile_q, dk), lambda b, h, t: (b, t, h), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, nk, dk), lambda b, h, t: (b, 0, h), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, n_heads, nq // tile_q),
        in_specs=[q_spec, kv_spec, kv_spec],
        out_specs=q_spec,
        out_shape=jax.ShapeDtypeStruct((B, nq, d_model), q.dtype),
        interpret=interpret,
    )(q, k, v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def flash_mha_packed(q, k, v, sm_scale: float, n_heads: int):
    """Flash attention over PACKED head layout: q [B, Nq, H*dk],
    k/v [B, Nk, H*dk] -> [B, Nq, H*dk], heads as column blocks.

    Why this exists: the [B,N,H*dk] -> [B,H,N,dk] head-split around
    ``flash_mha`` is free on the INPUT side (XLA lowers it to a bitcast
    of the projection output) but the post-attention transpose back
    MATERIALISES as a layout copy — the optimized pointer HLO carries 4x
    ``copy(bf16[64,1024,4,128])`` plus layout-conversion copies around
    the custom calls (Pallas calls cannot absorb XLA transposes). This
    kernel reads each head as a column block of the packed activation
    and writes the packed layout directly, so projections feed straight
    in and the out-projection consumes the result with no copy.

    Gate with flash_packed_supported(). Differentiation falls back to
    the transposed library path (identical math to ``flash_mha``; the
    primal packed kernel and the library forward agree to bf16
    rounding), reusing the one-pass fused backward."""
    flop_meter.add(
        flop_meter.attention(
            q.shape[0], n_heads, q.shape[1], k.shape[1],
            q.shape[2] // n_heads,
        )
    )
    return _flash_packed_impl(q, k, v, sm_scale, n_heads)


def _packed_split(x, n_heads: int):
    B, n, d_model = x.shape
    dk = d_model // n_heads
    return x.reshape(B, n, n_heads, dk).transpose(0, 2, 1, 3)


def _packed_merge(x4):
    B, H, n, dk = x4.shape
    return x4.transpose(0, 2, 1, 3).reshape(B, n, H * dk)


def _flash_packed_fwd(q, k, v, sm_scale: float, n_heads: int):
    q4, k4, v4 = (_packed_split(x, n_heads) for x in (q, k, v))
    nk = k4.shape[2]
    o4 = _fwd_library(q4, k4, v4, sm_scale, nk)
    return _packed_merge(o4), (q4, k4, v4, o4)


def _flash_packed_bwd(sm_scale, n_heads, res, do):
    q4, k4, v4, o4 = res
    B, H, nq, d = q4.shape
    flop_meter.add(flop_meter.attention(B, H, nq, k4.shape[2], d, passes=5.0))
    do4 = _packed_split(do, n_heads)
    dq4, dk4, dv4 = _bwd_fused(q4, k4, v4, o4, do4, sm_scale, k4.shape[2])
    return _packed_merge(dq4), _packed_merge(dk4), _packed_merge(dv4)


flash_mha_packed.defvjp(_flash_packed_fwd, _flash_packed_bwd)


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
