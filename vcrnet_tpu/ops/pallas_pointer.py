"""Fused transformer-pointer sublayer kernels — a MEASURED NEGATIVE
RESULT, kept env-gated (VCRNET_FUSED_POINTER=1) and interpret-tested so
the experiment is reproducible and available for other shapes.

A/B at the flagship shapes (B=64, N=1024, d=512, same session,
benchmarks/whole_iter_profile.py): cached pointer pass 12.9 ms with the
flash+XLA formulation vs 17.2 ms with these kernels (fused 33% SLOWER);
whole-protocol iter=1/iter=3 flat-to-worse. Why XLA wins here: it runs
each projection as ONE [B·N, d]x[d, d] matmul at near-peak MXU and
pipelines the four of them, while this kernel's per-batch-item grid
(B × q-tiles = 256 small programs) serializes [1024,512]x[512,128]
matmuls that can't saturate the MXU — the HBM traffic saved (~8 round
trips of the activation per MHA) is worth less than the MXU utilization
lost. The win hypothesis only holds when activations DON'T fit XLA's
fusion patterns (e.g. much larger d_model or tiny batch); re-A/B before
enabling.

Each refinement iteration runs one encoder pass and two decoder passes
(reference model/transformer.py:241-272, applied in both directions per
vcrnet_model.py:503-505). These kernels run a whole sublayer as Pallas
programs with nothing but the input activation and final output touching
HBM:

  fused_mha: q/k/v projections + per-head softmax(q k^T / sqrt(d)) v +
             out projection; the score tensor never leaves VMEM.
  fused_ff:  w2(relu(w1(y))) with the [TQ, d_ff] hidden kept in VMEM.

VMEM discipline (the first cut of this kernel OOM'd Mosaic's 16 MB scoped
limit at 20.7 MB): the grid is (B, Nq/TQ) with the QUERY tiled, k/v are
projected ONCE per batch item (at q-tile 0) into persistent scratch and
reused across the q tiles, per-head weight column slices feed the MXU
directly (no full-width q/k/v buffers), and outputs are bf16 (matching
the unfused path, whose nn.Dense emits bf16 on this profile). Peak
resident ≈ ykv block + k/v scratch + weights + one f32 score/exp tile
≈ 10 MB at N=1024, d=512.

Softmax follows the flash recipe (row max, exp, UNNORMALISED e @ v, then
one [TQ, d_head] rescale by 1/l) so only ~4 full-width VPU passes touch
the score tensor.

Both kernels are EVAL-ONLY: no custom VJP — training keeps the XLA/flash
formulation (with the one-pass fused backward in pallas_attention.py).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 score + exp tiles live simultaneously; keep them to ~1 MB each
_SCORE_BUDGET = 1024 * 1024


def _pick_tile_q(nq: int, nk: int) -> int:
    """Largest q tile (lane-aligned ladder) whose f32 score block stays
    within _SCORE_BUDGET."""
    for t in (256, 128):
        if nq % t == 0 and t * nk * 4 <= _SCORE_BUDGET:
            return t
    return 128


def fused_mha_supported(nq: int, nk: int, d: int, n_heads: int) -> bool:
    """Shapes the kernel handles: lane-aligned sequence/model dims, small
    enough that k/v scratch + weights + score tile fit VMEM."""
    if os.environ.get("VCRNET_FUSED_POINTER", "0") != "1":
        return False  # measured SLOWER than flash+XLA; see module docstring
    if nq % 128 or nk % 128 or d % 128 or d % n_heads:
        return False
    if (d // n_heads) % 128:
        return False  # per-head slices must stay lane-aligned
    tq = _pick_tile_q(nq, nk)
    blocks = 2 * (tq * d * 2) * 2  # yq in + out, bf16, double-buffered
    ykv = 2 * nk * d * 2  # full-width kv activation, double-buffered
    w = 2 * 4 * d * d * 2  # assume Mosaic double-buffers the weights too
    scr = 2 * nk * d * 2 + tq * d * 2  # k/v scratch + o tile
    score = 2 * tq * nk * 4 + tq * nk * 2  # s + e (f32) + e cast (bf16)
    return blocks + ykv + w + scr + score <= 13 * 1024 * 1024


def fused_ff_supported(n: int, d: int, f: int) -> bool:
    if os.environ.get("VCRNET_FUSED_POINTER", "0") != "1":
        return False  # measured SLOWER than flash+XLA; see module docstring
    if n % 128 or d % 128 or f % 128:
        return False
    tq = 256 if n % 256 == 0 else 128
    blocks = 2 * (tq * d * 2) * 2  # y in + out
    w = 2 * 2 * d * f * 2
    hid = tq * f * (4 + 2)  # f32 pre-relu + bf16 hidden
    return blocks + w + hid <= 13 * 1024 * 1024


def _mha_kernel(
    yq_ref, ykv_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    out_ref, k_scr, v_scr, o_scr,
    *, n_heads: int, sm_scale: float,
):
    f32 = jnp.float32
    yq = yq_ref[0]    # [TQ, D] bf16
    d = yq.shape[1]
    dk = d // n_heads
    qt = pl.program_id(1)

    @pl.when(qt == 0)
    def _project_kv():
        ykv = ykv_ref[0]  # [Nk, D] bf16
        for h in range(n_heads):
            hs = slice(h * dk, (h + 1) * dk)
            # per-head column slices keep the f32 temp at [Nk, dk]
            k_scr[:, hs] = (
                jnp.dot(ykv, wk_ref[:, hs], preferred_element_type=f32)
                + bk_ref[:, hs]
            ).astype(k_scr.dtype)
            v_scr[:, hs] = (
                jnp.dot(ykv, wv_ref[:, hs], preferred_element_type=f32)
                + bv_ref[:, hs]
            ).astype(v_scr.dtype)

    for h in range(n_heads):
        hs = slice(h * dk, (h + 1) * dk)
        qh = (
            jnp.dot(yq, wq_ref[:, hs], preferred_element_type=f32)
            + bq_ref[:, hs]
        ).astype(yq.dtype)
        s = jax.lax.dot_general(
            qh, k_scr[:, hs], (((1,), (1,)), ((), ())),  # [TQ, Nk]
            preferred_element_type=f32,
        ) * sm_scale
        m = jnp.max(s, axis=1, keepdims=True)
        e = jnp.exp(s - m)
        l = jnp.sum(e, axis=1, keepdims=True)
        o = jax.lax.dot_general(
            e.astype(v_scr.dtype), v_scr[:, hs], (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
        )
        o_scr[:, hs] = (o / l).astype(o_scr.dtype)

    out_ref[0] = (
        jnp.dot(o_scr[:], wo_ref[:], preferred_element_type=f32) + bo_ref[:]
    ).astype(out_ref.dtype)


def fused_mha(
    yq, ykv, wq, bq, wk, bk, wv, bv, wo, bo,
    n_heads: int, interpret: bool = False,
):
    """One-kernel MHA sublayer (pre-residual): projections + attention +
    out projection. yq [B, Nq, D], ykv [B, Nk, D] (pass yq for self-attn).
    Weights [D, D] / biases [D] in any float dtype (cast to bf16 inside).
    Returns [B, Nq, D] in bf16 — the same dtype the unfused path's
    nn.Dense(dtype=bf16) out-projection emits. Eval-only (no VJP)."""
    B, nq, d = yq.shape
    nk = ykv.shape[1]
    dk = d // n_heads
    cast = lambda a: a.astype(jnp.bfloat16)
    row = lambda a: a.reshape(1, -1).astype(jnp.bfloat16)
    tile_q = _pick_tile_q(nq, nk)
    kernel = functools.partial(
        _mha_kernel, n_heads=n_heads, sm_scale=1.0 / (dk ** 0.5)
    )
    w_spec = pl.BlockSpec((d, d), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, d), lambda b, t: (0, 0), memory_space=pltpu.VMEM)
    tile_spec = pl.BlockSpec(
        (1, tile_q, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    kv_spec = pl.BlockSpec(
        (1, nk, d), lambda b, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        kernel,
        grid=(B, nq // tile_q),
        in_specs=[
            tile_spec, kv_spec,
            w_spec, b_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((B, nq, d), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM((nk, d), jnp.bfloat16),  # k, persists across q tiles
            pltpu.VMEM((nk, d), jnp.bfloat16),  # v
            pltpu.VMEM((tile_q, d), jnp.bfloat16),  # attention out tile
        ],
        interpret=interpret,
    )(
        cast(yq), cast(ykv),
        cast(wq), row(bq), cast(wk), row(bk),
        cast(wv), row(bv), cast(wo), row(bo),
    )


def _ff_kernel(y_ref, w1_ref, b1_ref, w2_ref, b2_ref, out_ref):
    f32 = jnp.float32
    y = y_ref[0]
    h = jnp.maximum(
        jnp.dot(y, w1_ref[:], preferred_element_type=f32) + b1_ref[:], 0.0
    ).astype(y.dtype)
    out_ref[0] = (
        jnp.dot(h, w2_ref[:], preferred_element_type=f32) + b2_ref[:]
    ).astype(out_ref.dtype)


def fused_ff(y, w1, b1, w2, b2, interpret: bool = False):
    """One-kernel position-wise FF: w2(relu(w1(y))), hidden kept in VMEM.
    y [B, N, D], w1 [D, F], w2 [F, D]. Returns bf16 (see fused_mha).
    Eval-only (no VJP)."""
    B, n, d = y.shape
    f = w1.shape[1]
    cast = lambda a: a.astype(jnp.bfloat16)
    row = lambda a: a.reshape(1, -1).astype(jnp.bfloat16)
    tile = 256 if n % 256 == 0 else 128
    tile_spec = pl.BlockSpec(
        (1, tile, d), lambda b, t: (b, t, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda b, t: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _ff_kernel,
        grid=(B, n // tile),
        in_specs=[
            tile_spec, const((d, f)), const((1, f)),
            const((f, d)), const((1, d)),
        ],
        out_specs=tile_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, d), jnp.bfloat16),
        interpret=interpret,
    )(cast(y), cast(w1), row(b1), cast(w2), row(b2))
