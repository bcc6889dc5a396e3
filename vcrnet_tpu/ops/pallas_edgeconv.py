"""Fused kNN + edge-conv Pallas kernels (eval fast path).

Two kernels that extend the fused-kNN loop (see pallas_knn.py) with in-VMEM
neighbor combination, so neither the [B, N, N] scores, the [B, N, k] index
tensor, nor any [B, N, k, F] gathered edge tensor ever reaches HBM:

  fused_edge_conv      — the LPDNet DG block (reference lpdnet_model.py:122-126):
                         z_ij = leaky(a[j] + h[i]); x1 = max_j z_ij;
                         x2 = max_j leaky(z_ij @ W2 + b2)
  fused_knn_gather_max — the LPDNet SN block reduction
                         (lpdnet_model.py:129-132, decomposed form):
                         out[i] = max_{j in knn(i)} values[j]

The per-iteration neighbor "gather" is a one-hot matmul against the
VMEM-resident value table — MXU work, no dynamic addressing. Forward-only:
the training path uses the differentiable XLA formulation in
models/embeddings.py (identical math).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q):
    q = x_q_ref[0]
    keys = x_k_ref[0]
    n = keys.shape[0]
    scores = 2.0 * jnp.dot(
        q, keys.T, preferred_element_type=jnp.float32
    ) - norms_ref[0, 0][None, :]
    row0 = pl.program_id(1) * tile_q
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 1)
    scores = jnp.where(col_ids == row_ids, jnp.float32(-jnp.inf), scores)
    return scores, col_ids


def _edge_conv_kernel(
    x_q_ref, x_k_ref, norms_ref, a_ref, h_ref, w2_ref, b2_ref,
    x1_ref, x2_ref, *, k: int, tile_q: int, slope: float,
):
    scores, col_ids = _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q)
    a_full = a_ref[0]  # [N, F]
    h = h_ref[0]  # [TQ, F]
    w2 = w2_ref[:]  # [F, F]
    b2 = b2_ref[0]  # [F]

    f = a_full.shape[-1]
    neg_inf = jnp.float32(-jnp.inf)
    h32 = h.astype(jnp.float32)
    b32 = b2.astype(jnp.float32)

    def leaky(v):
        return jnp.where(v >= 0, v, v * slope)

    # fori_loop, not a python unroll: keeps the Mosaic program (and its
    # compile time) independent of k
    def body(_, carry):
        scores, x1, x2 = carry
        amax = jnp.argmax(scores, axis=1).astype(jnp.int32)  # [TQ]
        sel = col_ids == amax[:, None]
        scores = jnp.where(sel, neg_inf, scores)
        onehot = sel.astype(a_full.dtype)
        g = jnp.dot(onehot, a_full, preferred_element_type=jnp.float32)
        z = leaky(g + h32)
        x1 = jnp.maximum(x1, z)
        y = leaky(
            jnp.dot(
                z.astype(w2.dtype), w2, preferred_element_type=jnp.float32
            )
            + b32
        )
        x2 = jnp.maximum(x2, y)
        return scores, x1, x2

    init = (
        scores,
        jnp.full((tile_q, f), neg_inf, jnp.float32),
        jnp.full((tile_q, f), neg_inf, jnp.float32),
    )
    _, x1, x2 = jax.lax.fori_loop(0, k, body, init)

    x1_ref[0] = x1.astype(x1_ref.dtype)
    x2_ref[0] = x2.astype(x2_ref.dtype)


def _gather_max_kernel(
    x_q_ref, x_k_ref, norms_ref, v_ref, out_ref, *, k: int, tile_q: int
):
    scores, col_ids = _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q)
    values = v_ref[0]  # [N, F]
    f = values.shape[-1]
    neg_inf = jnp.float32(-jnp.inf)

    def body(_, carry):
        scores, gmax = carry
        amax = jnp.argmax(scores, axis=1).astype(jnp.int32)
        sel = col_ids == amax[:, None]
        scores = jnp.where(sel, neg_inf, scores)
        onehot = sel.astype(values.dtype)
        g = jnp.dot(onehot, values, preferred_element_type=jnp.float32)
        gmax = jnp.maximum(gmax, g)
        return scores, gmax

    init = (scores, jnp.full((tile_q, f), neg_inf, jnp.float32))
    _, gmax = jax.lax.fori_loop(0, k, body, init)

    out_ref[0] = gmax.astype(out_ref.dtype)


def _norms(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)[:, None, :]  # [B, 1, N]


def _pick_tile(n, tile_q):
    if n % tile_q == 0:
        return tile_q
    # >= 8: Mosaic requires the sublane dim divisible by 8
    return next(t for t in (128, 64, 32, 16, 8) if n % t == 0)


def fused_edge_conv(
    x, a, h, w2, b2, k: int = 20, negative_slope: float = 0.0,
    tile_q: int = 128, interpret: bool = False,
):
    """x [B,N,C] (distance space), a/h [B,N,F], w2 [F,F], b2 [F]
    -> (x1, x2) each [B, N, F] in a's dtype."""
    B, N, C = x.shape
    F = a.shape[-1]
    tile_q = _pick_tile(N, tile_q)
    kernel = functools.partial(
        _edge_conv_kernel, k=k, tile_q=tile_q, slope=negative_slope
    )
    out_sds = jax.ShapeDtypeStruct((B, N, F), a.dtype)
    b2_2d = b2.reshape(1, F)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_sds, out_sds],
        interpret=interpret,
    )(x, x, _norms(x), a, h, w2, b2_2d)


def fused_knn_gather_max(
    x, values, k: int = 20, tile_q: int = 128, interpret: bool = False
):
    """x [B,N,C] (distance space), values [B,N,F]
    -> [B, N, F]: per point, channel-wise max of values over its k nearest
    neighbors in x-space (self excluded)."""
    B, N, C = x.shape
    F = values.shape[-1]
    tile_q = _pick_tile(N, tile_q)
    kernel = functools.partial(_gather_max_kernel, k=k, tile_q=tile_q)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, F), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, F), values.dtype),
        interpret=interpret,
    )(x, x, _norms(x), values)
