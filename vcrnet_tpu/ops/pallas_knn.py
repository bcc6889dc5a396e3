"""Fused kNN Pallas kernel: distance matmul + top-k selection in VMEM.

The XLA path materialises the [B, N, N] float32 score matrix in HBM
(268 MB at B=64, N=1024) and runs a full sort (or approx_max_k) over it.
This kernel tiles queries over the grid, computes each tile's scores against
the whole key set on the MXU directly in VMEM, and extracts the k nearest
rows by k-step iterative argmax on the VPU — the score matrix never leaves
the chip.

Ranking trick: per query row, argsort(-dist) == argsort(2 q.k - ||k||^2)
(the ||q||^2 term is constant per row), so only one norm vector is needed.

Semantics match ops.graph.knn (reference util/util.py:143-160): k nearest,
self excluded. Self-exclusion is done by masking the diagonal score to -inf
(the reference instead takes top-(k+1) and drops the first — identical
output whenever the cloud has no duplicate points).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcrnet_tpu.ops import flop_meter


def _knn_kernel(
    x_q_ref, x_k_ref, norms_ref, out_ref, *, k: int, tile_q: int,
    packed_select: bool,
):
    from vcrnet_tpu.ops.pallas_edgeconv import _select_knn_idx

    q = x_q_ref[0]  # [TQ, C]
    keys = x_k_ref[0]  # [N, C]
    n = keys.shape[0]

    # scores: 2 q.k^T - ||k||^2  (monotone in -distance per row)
    scores = 2.0 * jnp.dot(
        q, keys.T, preferred_element_type=jnp.float32
    ) - norms_ref[0, 0][None, :]

    # mask self: global query row == key column
    row0 = pl.program_id(1) * tile_q
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 1)
    scores = jnp.where(col_ids == row_ids, jnp.float32(-jnp.inf), scores)
    # shared k-step selection loop (threshold-scan or masking pop-max —
    # see pallas_edgeconv._select_knn_idx)
    out_ref[0] = _select_knn_idx(scores, col_ids, k, tile_q, packed_select)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3, 4))
def fused_knn(
    x: jax.Array, k: int = 20, tile_q: int = 256, interpret: bool = False,
    packed_select: bool = True,
) -> jax.Array:
    """x: [B, N, C] -> [B, N, k] int32 nearest-neighbor indices (no self).

    Requires N % tile_q == 0 (all supported configs: N in {768, 1024, ...}).
    Differentiation: neighbor indices carry no gradient (identical to the
    reference's torch.topk indices), so the VJP is zero — declared via
    custom_vjp because raw pallas_call has no autodiff rule.
    ``packed_select`` trades the exact-f32 argmax chain for a single packed
    int32 max per step (see pallas_edgeconv._pack_scores).
    """
    return _fused_knn_impl(x, k, tile_q, interpret, packed_select)


def _fused_knn_fwd(x, k, tile_q, interpret, packed_select):
    # residual: a zero array carrying x's shape/dtype (free after XLA DCE)
    return (
        _fused_knn_impl(x, k, tile_q, interpret, packed_select),
        jnp.zeros_like(x),
    )


def _fused_knn_bwd(k, tile_q, interpret, packed_select, res, _ct):
    return (res,)


fused_knn.defvjp(_fused_knn_fwd, _fused_knn_bwd)


def _fused_knn_impl(
    x: jax.Array, k: int, tile_q: int, interpret: bool,
    packed_select: bool = True,
) -> jax.Array:
    B, N, C = x.shape
    flop_meter.add(flop_meter.pairwise_dist(B, N, N, C))
    if N % tile_q != 0:
        # largest divisor tile >= 8 (Mosaic sublane constraint)
        tile_q = next(t for t in (256, 128, 64, 32, 16, 8) if N % t == 0)
    # VMEM guard: the f32 scores + packed int32 tiles are the residents.
    # Default tile 256 after the round-5 A/B at B=64 N=1024 (3.19 ->
    # 2.25 ms; tile 512 regressed to 3.96) — shrink at large N so
    # [TQ, N] x2 stays ~4 MB.
    while tile_q > 128 and tile_q * N * 8 > (4 << 20) and N % (tile_q // 2) == 0:
        tile_q //= 2

    # [B, 1, N]: the singleton keeps the block shape tile-legal on TPU
    norms = jnp.sum(
        x.astype(jnp.float32) * x.astype(jnp.float32), axis=-1
    )[:, None, :]

    kernel = functools.partial(
        _knn_kernel, k=k, tile_q=tile_q, packed_select=packed_select
    )
    grid = (B, N // tile_q)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, tile_q, C), lambda b, i: (b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, N, C), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, 1, N), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, tile_q, k), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, k), jnp.int32),
        interpret=interpret,
    )(x, x, norms)
