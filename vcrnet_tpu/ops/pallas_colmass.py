"""Two-pass streaming softmax column-mass kernels.

The partial-overlap machinery needs COLUMN MASSES of row-softmaxed score
matrices — sum over queries of softmax_row(S)[q, k] — in two places:
the attention re-mask (reference transformer.py:40) and selectCom's
overlap scoring (vcrnet_model.py:221-245). The XLA path materialises the
full [.., Nq, Nk] probability tensor in HBM just to reduce it.

These kernels never materialise it:
  pass 1 (row_softmax_stats): flash-style online (max, sum-exp) per query
          row -> m, l  [G, Nq, 1]
  pass 2 (softmax_colmass):   re-compute score tiles and accumulate
          sum_q exp(s - m_q) / l_q per key -> [G, 1, Nk]

Scores are q @ k^T * scale (attention convention). G is a merged
batch*heads axis.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcrnet_tpu.ops import flop_meter


def _stats_kernel(q_ref, k_ref, m_out, l_out, m_scr, l_scr,
                  *, scale: float, n_k_tiles: int):
    j = pl.program_id(2)

    @pl.when(j == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr[:], -jnp.inf)
        l_scr[:] = jnp.zeros_like(l_scr[:])

    s = scale * jnp.dot(
        q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32
    )  # [TQ, TK]
    m_prev = m_scr[:, :1]
    m_new = jnp.maximum(m_prev, s.max(axis=1, keepdims=True))
    alpha = jnp.exp(m_prev - m_new)
    l_new = alpha * l_scr[:, :1] + jnp.exp(s - m_new).sum(
        axis=1, keepdims=True
    )
    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(j == n_k_tiles - 1)
    def _():
        m_out[0] = m_scr[:, :1]
        l_out[0] = l_scr[:, :1]


def _colmass_kernel(q_ref, k_ref, m_ref, l_ref, out_ref, acc,
                    *, scale: float, n_q_tiles: int):
    i = pl.program_id(2)  # query tile (innermost)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc[:])

    s = scale * jnp.dot(
        q_ref[0], k_ref[0].T, preferred_element_type=jnp.float32
    )  # [TQ, TK]
    m = m_ref[0]  # [TQ, 1]
    l = l_ref[0]
    e = jnp.exp(s - m) / l  # row-softmax probabilities for this tile pair
    acc[0:1, :] = acc[0:1, :] + e.sum(axis=0, keepdims=True)

    @pl.when(i == n_q_tiles - 1)
    def _():
        out_ref[0] = acc[0:1, :]


def _tile(n, pref):
    return next(t for t in (pref, 512, 256, 128, 64, 32, 16, 8) if n % t == 0)


def softmax_colmass(
    q: jax.Array, k: jax.Array, scale: float,
    tile_q: int = 256, tile_k: int = 512, interpret: bool = False,
) -> jax.Array:
    """q [G, Nq, D], k [G, Nk, D] -> column masses [G, Nk] of
    softmax_rows(q @ k^T * scale), without materialising [G, Nq, Nk]."""
    G, Nq, D = q.shape
    Nk = k.shape[1]
    # two score passes (stats, then colmass), no value matmul
    flop_meter.add(flop_meter.attention(G, 1, Nq, Nk, D, passes=2.0))
    tq, tk = _tile(Nq, tile_q), _tile(Nk, tile_k)

    m, l = pl.pallas_call(
        functools.partial(
            _stats_kernel, scale=scale, n_k_tiles=Nk // tk
        ),
        grid=(G, Nq // tq, Nk // tk),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D), lambda g, i, j: (g, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tq, 1), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda g, i, j: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((G, Nq, 1), jnp.float32),
            jax.ShapeDtypeStruct((G, Nq, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((tq, 128), jnp.float32),
            pltpu.VMEM((tq, 128), jnp.float32),
        ],
        interpret=interpret,
    )(q, k)

    out = pl.pallas_call(
        functools.partial(
            _colmass_kernel, scale=scale, n_q_tiles=Nq // tq
        ),
        grid=(G, Nk // tk, Nq // tq),
        in_specs=[
            pl.BlockSpec((1, tq, D), lambda g, j, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tk, D), lambda g, j, i: (g, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda g, j, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tq, 1), lambda g, j, i: (g, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, 1, tk), lambda g, j, i: (g, 0, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((G, 1, Nk), jnp.float32),
        scratch_shapes=[pltpu.VMEM((8, tk), jnp.float32)],
        interpret=interpret,
    )(q, k, m, l)
    return out[:, 0, :]
