"""Fused transformer-pointer sublayer kernels (eval fast path).

The pointer is ~46% of the whole --iter 3 eval protocol's device time
(benchmarks/whole_iter_profile.py): each refinement iteration runs one
encoder pass and two decoder passes (reference model/transformer.py:241-272,
applied in both directions per vcrnet_model.py:503-505). The XLA
formulation of one attention sublayer materialises the q/k/v projections,
two head-layout transposes, and the attention output in HBM — ~8 round
trips of the [B*N, d_model] activation per MHA — plus a separate flash
kernel launch. At this framework's shapes (N <= ~1024, d_model 512) the
ENTIRE sublayer fits in VMEM, so these kernels run it as ONE Pallas
program per batch item:

  fused_mha: q/k/v projections + per-head softmax(q k^T / sqrt(d)) v +
             out projection; the activations are read once and the
             [Nq, Nk] score tensor never leaves VMEM.
  fused_ff:  w2(relu(w1(y))) with the [N, d_ff] hidden kept in VMEM.

k/v/q are computed PER HEAD from the VMEM-resident activations (a column
slice of the weight matrix feeds the MXU directly), so no full-width
[N, d_model] q/k/v buffers exist — peak VMEM is the score tile plus the
activations and weights (~12 MB at N=1024, d=512, within the ~16 MB
budget the edge-conv kernels established).

Softmax follows the flash recipe (row max, exp, UNNORMALISED e @ v, then
one [TQ, d_head] rescale by 1/l) so only ~4 full-width VPU passes touch
the score tensor.

Both kernels are EVAL-ONLY: no custom VJP — training keeps the XLA/flash
formulation (with the one-pass fused backward in pallas_attention.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# f32 score + exp tiles must leave VMEM room for activations + weights
_SCORE_BUDGET = 1024 * 1024


def _pick_tile_q(nq: int, nk: int) -> int:
    """Largest q tile (lane-aligned ladder) whose f32 score block stays
    within _SCORE_BUDGET (score + exp live simultaneously)."""
    for t in (1024, 512, 256, 128):
        if nq % t == 0 and t * nk * 4 <= _SCORE_BUDGET:
            return t
    return 128


def fused_mha_supported(nq: int, nk: int, d: int, n_heads: int) -> bool:
    """Shapes the kernel handles: lane-aligned sequence/model dims, small
    enough that activations + weights + score tile fit VMEM."""
    if nq % 128 or nk % 128 or d % 128 or d % n_heads:
        return False
    if (d // n_heads) % 128:
        return False  # per-head slices must stay lane-aligned
    act = (nq + nk) * d * 2 * 2  # in activations, double-buffered bf16
    w = 4 * d * d * 2
    scr = (nq * d) * 2 + nq * d * 2 * 2  # o_scr + double-buffered out
    score = 2 * _SCORE_BUDGET
    head = 2 * nk * (d // n_heads) * 2
    return act + w + scr + score + head <= 13 * 1024 * 1024


def fused_ff_supported(n: int, d: int, f: int) -> bool:
    if n % 128 or d % 128 or f % 128:
        return False
    act = n * d * 2 * 2 * 2  # in + out, double-buffered bf16
    w = 2 * d * f * 2
    hid = n * f * (4 + 2)  # f32 pre-relu + bf16 hidden
    return act + w + hid <= 13 * 1024 * 1024


def _mha_kernel(
    yq_ref, ykv_ref,
    wq_ref, bq_ref, wk_ref, bk_ref, wv_ref, bv_ref, wo_ref, bo_ref,
    out_ref, o_scr,
    *, n_heads: int, tile_q: int, sm_scale: float,
):
    f32 = jnp.float32
    yq = yq_ref[0]    # [Nq, D] bf16
    ykv = ykv_ref[0]  # [Nk, D] bf16
    nq = yq.shape[0]
    d = yq.shape[1]
    dk = d // n_heads

    for h in range(n_heads):
        hs = slice(h * dk, (h + 1) * dk)
        # per-head projections: column-sliced weights keep peak VMEM at
        # one [Nk, dk] pair instead of three full [N, D] buffers
        kh = (
            jnp.dot(ykv, wk_ref[:, hs], preferred_element_type=f32)
            + bk_ref[:, hs]
        ).astype(yq.dtype)
        vh = (
            jnp.dot(ykv, wv_ref[:, hs], preferred_element_type=f32)
            + bv_ref[:, hs]
        ).astype(yq.dtype)
        for qt in range(nq // tile_q):
            qh = (
                jnp.dot(
                    yq[qt * tile_q:(qt + 1) * tile_q],
                    wq_ref[:, hs],
                    preferred_element_type=f32,
                )
                + bq_ref[:, hs]
            ).astype(yq.dtype)
            s = jax.lax.dot_general(
                qh, kh, (((1,), (1,)), ((), ())),  # q @ k^T -> [TQ, Nk]
                preferred_element_type=f32,
            ) * sm_scale
            m = jnp.max(s, axis=1, keepdims=True)
            e = jnp.exp(s - m)
            l = jnp.sum(e, axis=1, keepdims=True)
            o = jax.lax.dot_general(
                e.astype(vh.dtype), vh, (((1,), (0,)), ((), ())),
                preferred_element_type=f32,
            )
            o_scr[qt * tile_q:(qt + 1) * tile_q, hs] = (
                o / l
            ).astype(o_scr.dtype)

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
    Returns [B, Nq, D] in yq.dtype. Eval-only (no VJP)."""
    B, nq, d = yq.shape
    nk = ykv.shape[1]
    dk = d // n_heads
    cast = lambda a: a.astype(jnp.bfloat16)
    row = lambda a: a.reshape(1, -1).astype(jnp.bfloat16)
    tile_q = _pick_tile_q(nq, nk)
    kernel = functools.partial(
        _mha_kernel, n_heads=n_heads, tile_q=tile_q,
        sm_scale=1.0 / (dk ** 0.5),
    )
    act_spec = lambda n: pl.BlockSpec(
        (1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec((d, d), lambda b: (0, 0), memory_space=pltpu.VMEM)
    b_spec = pl.BlockSpec((1, d), lambda b: (0, 0), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(B,),
        in_specs=[
            act_spec(nq), act_spec(nk),
            w_spec, b_spec, w_spec, b_spec, w_spec, b_spec, w_spec, b_spec,
        ],
        out_specs=act_spec(nq),
        out_shape=jax.ShapeDtypeStruct((B, nq, d), yq.dtype),
        scratch_shapes=[pltpu.VMEM((nq, d), jnp.bfloat16)],
        interpret=interpret,
    )(
        cast(yq), cast(ykv),
        cast(wq), row(bq), cast(wk), row(bk),
        cast(wv), row(bv), cast(wo), row(bo),
    ).astype(yq.dtype)


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
    y [B, N, D], w1 [D, F], w2 [F, D]. Eval-only (no VJP)."""
    B, n, d = y.shape
    f = w1.shape[1]
    cast = lambda a: a.astype(jnp.bfloat16)
    row = lambda a: a.reshape(1, -1).astype(jnp.bfloat16)
    act_spec = pl.BlockSpec(
        (1, n, d), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    const = lambda shape: pl.BlockSpec(
        shape, lambda b: (0,) * len(shape), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        _ff_kernel,
        grid=(B,),
        in_specs=[
            act_spec, const((d, f)), const((1, f)),
            const((f, d)), const((1, d)),
        ],
        out_specs=act_spec,
        out_shape=jax.ShapeDtypeStruct((B, n, d), y.dtype),
        interpret=interpret,
    )(cast(y), cast(w1), row(b1), cast(w2), row(b2)).astype(y.dtype)
