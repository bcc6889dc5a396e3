"""Virtual-correspondence heads: topK (whole + partial), dist, att.

Reference model/vcrnet_model.py:162-460. The partial-overlap topK head is the
hard static-shape case: the reference materialises variable-length overlap
subsets via ``np.setdiff1d`` on the host (vcrnet_model.py:228, 249 — a GPU
sync per step). Here every selection is a fixed-size ``top_k`` + gather: all
K values derive from static config (N, overlap2), and the "remainder" sets
the reference computes are never consumed downstream, so they are simply not
built.

All heads map (src_emb, tgt_emb, src, tgt) -> (srcK, src_corrK): a set of
source points and their soft virtual correspondences in the target cloud,
which feed the Procrustes solve.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcrnet_tpu.ops import neg_pairwise_sqdist


def vcp_top_k_whole(src_emb, tgt_emb, src, tgt, precision=None):
    """Whole-whole soft correspondence (reference getCopairALL,
    vcrnet_model.py:334-347): softmax over the negated embedding distance,
    virtual point = attention-weighted sum of all target points."""
    scores = jax.nn.softmax(
        neg_pairwise_sqdist(src_emb, tgt_emb, precision=precision), axis=2
    )  # [B, Ns, Nt]
    src_corr = jnp.einsum("bnm,bmc->bnc", scores, tgt, precision=precision)
    return src, src_corr


def vcp_top_k_partial(
    src_emb, tgt_emb, src, tgt, overlap2: float, precision=None
):
    """Partial-partial correspondence selection.

    Two stages, matching reference selectCom + getCopair
    (vcrnet_model.py:190-332) with static shapes:

    1. selectCom: score matrix of the full clouds; keep the
       ``K1 = int(N * 0.84 * overlap2)`` target points with the largest
       column mass of the row-softmax, and the K1 source points with the
       largest row mass of the column-softmax — the likely-overlap subsets.
    2. getCopair: rescore the subsets; each source point's best target
       (tgtK=1) is its virtual correspondence; keep the
       ``K2 = int(K1 * 0.52 * overlap2)`` source points with the highest
       best-match confidence.
    """
    B, Ns, _ = src.shape
    Nt = tgt.shape[1]
    k1_src = int(Ns * 0.84 * overlap2)
    k1_tgt = int(Nt * 0.84 * overlap2)

    scores = neg_pairwise_sqdist(src_emb, tgt_emb, precision=precision)  # [B,Ns,Nt]

    # --- stage 1: overlap-candidate selection (selectCom) ---
    col_mass = jax.nn.softmax(scores, axis=2).sum(axis=1)  # [B, Nt]
    _, tgt_idx = jax.lax.top_k(col_mass, k1_tgt)
    row_mass = jax.nn.softmax(scores, axis=1).sum(axis=2)  # [B, Ns]
    _, src_idx = jax.lax.top_k(row_mass, k1_src)

    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, :, None], axis=1)

    def take_emb(arr, idx):
        # wide (emb_dims) row selections: on the bf16 path express the
        # gather as a one-hot MXU matmul — exact (each output row sums
        # exactly one input row) and ~3x faster than XLA's gather at these
        # shapes; float32 inputs keep the plain gather for bitwise parity
        if arr.dtype == jnp.bfloat16:
            onehot = jax.nn.one_hot(idx, arr.shape[1], dtype=arr.dtype)
            return jnp.einsum(
                "bkn,bnc->bkc", onehot, arr,
                preferred_element_type=arr.dtype,
            )
        return take(arr, idx)

    src_sel = take(src, src_idx)  # [B, K1, 3]
    src_emb_sel = take_emb(src_emb, src_idx)
    tgt_sel = take(tgt, tgt_idx)
    tgt_emb_sel = take_emb(tgt_emb, tgt_idx)

    # --- stage 2: confident-pair selection (getCopair, tgtK=1) ---
    k2 = int(k1_src * 0.52 * overlap2)
    p = jax.nn.softmax(
        neg_pairwise_sqdist(src_emb_sel, tgt_emb_sel, precision=precision), axis=2
    )  # [B, K1, K1]
    # tgtK=1 best match: max+argmax, NOT lax.top_k(p, 1) — on TPU top_k
    # lowers to a full variadic sort (~4.7 ms at [64,494,494] vs ~0 for the
    # fused max/argmax reductions); ties resolve to the first index in both
    conf = p.max(axis=-1)  # [B, K1]
    best_idx = jnp.argmax(p, axis=-1)  # [B, K1]
    _, keep = jax.lax.top_k(conf, k2)  # [B, K2]

    src_k = take(src_sel, keep)  # [B, K2, 3]
    # correspondence = the single best target point (tgtK=1 means the
    # normalised weight is exactly 1 — reference vcrnet_model.py:320-325)
    corr_idx = jnp.take_along_axis(best_idx, keep, axis=1)  # [B, K2]
    src_corr_k = take(tgt_sel, corr_idx)
    return src_k, src_corr_k


def vcp_by_dis(src_emb, tgt_emb, src, tgt, precision=None):
    """Scaled-dot softmax correspondence (reference VcpByDis,
    vcrnet_model.py:402-421)."""
    d_k = src_emb.shape[-1]
    scores = (
        jnp.einsum("bnc,bmc->bnm", src_emb, tgt_emb, precision=precision)
        / jnp.sqrt(jnp.asarray(d_k, src_emb.dtype))
    )
    scores = jax.nn.softmax(scores, axis=2)
    src_corr = jnp.einsum("bnm,bmc->bnc", scores, tgt, precision=precision)
    return src, src_corr


class VcpAtt(nn.Module):
    """Learned-projection distance attention (reference VcpAtt,
    vcrnet_model.py:424-460). The two embedding projections are
    identity-initialised (reference util/initPara.py:57-65); the reference
    also creates (and identity-inits) two 3d linears it never uses in
    forward — those are intentionally NOT created here.
    """

    emb_dims: int = 512
    precision: Any = None

    @nn.compact
    def __call__(self, src_emb, tgt_emb, src, tgt):
        eye = lambda key, shape, dtype=jnp.float32: jnp.eye(*shape, dtype=dtype)
        q = nn.Dense(
            self.emb_dims,
            name="linear_emb_q",
            kernel_init=eye,
            bias_init=nn.initializers.zeros,
        )(src_emb)
        k = nn.Dense(
            self.emb_dims,
            name="linear_emb_k",
            kernel_init=eye,
            bias_init=nn.initializers.zeros,
        )(tgt_emb)
        scores = jax.nn.softmax(
            neg_pairwise_sqdist(q, k, precision=self.precision), axis=2
        )
        src_corr = jnp.einsum("bnm,bmc->bnc", scores, tgt, precision=self.precision)
        return src, src_corr
