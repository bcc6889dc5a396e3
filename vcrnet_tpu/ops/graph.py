"""Graph primitives: pairwise distances, kNN/kFN selection, neighbor gather.

TPU-first reformulation of reference util/util.py:143-213. The distance
matrix is one big [B, N, N] matmul (MXU work); top-k runs on the VPU via
``jax.lax.top_k``. Everything is channels-last [B, N, C] and fully batched —
the gather uses ``take_along_axis`` (one XLA gather op) instead of the
reference's flatten-index trick.

An optional reduced-precision path (``precision`` arg) lets the inner matmul
run in bfloat16 on the MXU while the norms stay float32 — at N=1024 and
feature dims <= 512 the argsort ordering is unaffected for well-separated
neighbors, and it nearly doubles throughput. Default is float32 ("highest")
for exact reference parity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def pairwise_sqdist(
    x: jax.Array, y: jax.Array | None = None, precision=None
) -> jax.Array:
    """Squared euclidean distances between row-point sets.

    x: [B, N, C], y: [B, M, C] (defaults to x) -> [B, N, M] in float32.
    Uses the ||x||^2 - 2 x.y + ||y||^2 expansion (one MXU matmul), like
    reference util/util.py:153-158 but channels-last. The inner product runs
    at the requested matmul ``precision`` (DEFAULT = single-pass bf16 on the
    MXU) with a float32 accumulator; norms stay float32 on the VPU, so the
    returned scores are always float32 regardless of precision.
    """
    if y is None:
        y = x
    inner = jnp.einsum(
        "bnc,bmc->bnm", x, y, precision=precision,
        preferred_element_type=jnp.float32,
    )
    xf = x.astype(jnp.float32)
    yf = y.astype(jnp.float32)
    xx = jnp.sum(xf * xf, axis=-1)[:, :, None]
    yy = jnp.sum(yf * yf, axis=-1)[:, None, :]
    return xx - 2.0 * inner + yy


def neg_pairwise_sqdist(
    x: jax.Array, y: jax.Array | None = None, precision=None
) -> jax.Array:
    """-pairwise_sqdist; the "score" convention used throughout the
    reference's correspondence heads (model/vcrnet_model.py:211-216 etc.)."""
    return -pairwise_sqdist(x, y, precision=precision)


def knn(
    x: jax.Array,
    k: int,
    precision=None,
    approx: bool = False,
    recall_target: float = 0.95,
    method: str | None = None,
) -> jax.Array:
    """Indices of the k nearest neighbors, excluding self.

    x: [B, N, C] -> idx [B, N, k]. Matches reference util/util.py:143-160:
    top-(k+1) of the negated distance, drop the first column (self).

    Selection methods (measured at B=64, N=1024 on v5e):
      'pallas'  fused distance-matmul + k-step argmax in VMEM, EXACT,
                ~2.8 ms (the [B,N,N] scores never touch HBM) — default on TPU
      'approx'  jax.lax.approx_max_k over the materialised scores, ~5 ms
      'exact'   full-sort lax.top_k over the materialised scores, ~19 ms —
                default off-TPU (Pallas needs interpret mode there)
    """
    if method is None:
        method = "approx" if approx else "auto"
    n, c = x.shape[1], x.shape[2]
    if method == "auto":
        pallas_ok = (
            jax.default_backend() == "tpu" and n % 8 == 0 and n <= 8192
            and c <= 512
        )
        method = "pallas" if pallas_ok else "exact"

    if method == "pallas":
        from vcrnet_tpu.ops.pallas_knn import fused_knn

        return fused_knn(x, k)
    scores = neg_pairwise_sqdist(x, precision=precision)
    if method == "approx":
        diag = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) == (
            jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        )
        scores = jnp.where(diag[None], -jnp.inf, scores)
        _, idx = jax.lax.approx_max_k(scores, k, recall_target=recall_target)
        return idx
    _, idx = jax.lax.top_k(scores, k + 1)
    return idx[..., 1:]


def kfn(x: jax.Array, k: int, precision=None) -> jax.Array:
    """Indices of the k FARTHEST neighbors (used by the LPD triplet loss to
    mine hard negatives, reference model/lpdnet_model.py:163-171)."""
    d = pairwise_sqdist(x, precision=precision)
    _, idx = jax.lax.top_k(d, k)
    return idx


def gather_neighbors(
    feats: jax.Array, idx: jax.Array, method: str = "gather"
) -> jax.Array:
    """Gather per-point neighbor features.

    feats: [B, N, C], idx: [B, N, k] -> [B, N, k, C].

    method='onehot' expresses the gather as a one-hot matmul on the MXU —
    ~3.5x faster than XLA's gather on TPU for these shapes (measured:
    4.7 ms vs 16.3 ms at B=64, N=1024, k=20, C=128). The matmul runs in the
    feats dtype; for bf16 activations it is an EXACT gather (each output row
    sums exactly one input row). Use 'gather' for float32 exactness.
    """
    B, N, C = feats.shape
    _, n_q, k = idx.shape  # query rows may differ from N (sharded callers)
    flat = idx.reshape(B, n_q * k)
    if method == "onehot":
        onehot = jax.nn.one_hot(flat, N, dtype=feats.dtype)
        out = jnp.einsum(
            "bgn,bnc->bgc", onehot, feats,
            preferred_element_type=feats.dtype,
        )
    else:
        out = jnp.take_along_axis(feats, flat[:, :, None], axis=1)
    return out.reshape(B, n_q, k, C)


def gather_max_neighbors(
    feats: jax.Array, idx: jax.Array, method: str = "gather"
) -> jax.Array:
    """max over each point's k neighbors: [B, N, C] x [B, N, k] -> [B, N, C].

    The fused form of gather -> max(axis=2); used by the decomposed
    edge-conv (see models/embeddings.py)."""
    return gather_neighbors(feats, idx, method=method).max(axis=2)


def graph_feature(
    feats: jax.Array,
    idx: jax.Array | None = None,
    k: int = 20,
    precision=None,
    approx: bool = False,
) -> jax.Array:
    """Edge-conv input tensor: concat(neighbor_feat, center_feat).

    feats: [B, N, C] -> [B, N, k, 2C]. Reference util/util.py:176-199
    (note the reference concatenates (neighbor, center), NOT the DGCNN-paper
    (neighbor - center, center) — we reproduce the code, not the paper).
    """
    if idx is None:
        idx = knn(feats, k=k, precision=precision, approx=approx)
    neigh = gather_neighbors(feats, idx)  # [B, N, k, C]
    center = jnp.broadcast_to(feats[:, :, None, :], neigh.shape)
    return jnp.concatenate([neigh, center], axis=-1)
