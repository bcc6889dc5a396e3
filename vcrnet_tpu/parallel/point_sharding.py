"""Point-axis (sequence-parallel) sharded primitives.

The reference holds every [B, N, N] matrix on one device (SURVEY.md §5:
nothing shards the point axis). These shard_map primitives split the POINT
axis of a cloud over the mesh so clouds far beyond one chip's HBM register
correctly: each device owns N/D points, keys/values are all-gathered over
ICI (xyz and embeddings are small relative to the O(N^2) score work, which
stays local to each device's query shard).

Not used by the default N=1024 pipeline (sharding overhead would exceed the
work); they exist so the same model scales to dense KITTI-sized clouds.
Tested against the single-device ops on the 8-device CPU mesh.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from vcrnet_tpu.ops import graph as _g


def _points_spec(batch_axis: str | None = None):
    # [B, N, C] with the POINT axis sharded over the 'data' mesh axis;
    # on a 2-D dp x sp mesh (mesh.make_mesh_2d) the batch axis additionally
    # shards over ``batch_axis``
    return P(batch_axis, "data", None)


def sharded_knn(
    x: jax.Array, k: int, mesh: Mesh, batch_axis: str | None = None
) -> jax.Array:
    """kNN over a point-sharded cloud: x [B, N, C] sharded on axis 1 ->
    GLOBAL neighbor indices [B, N, k], sharded the same way.

    Each device computes its query shard's scores against the all-gathered
    key set; the O(N^2/D) score block never leaves the device.
    """
    @partial(
        shard_map, mesh=mesh,
        in_specs=(_points_spec(batch_axis),),
        out_specs=_points_spec(batch_axis),
    )
    def f(x_local):
        keys = jax.lax.all_gather(x_local, "data", axis=1, tiled=True)
        scores = _g.neg_pairwise_sqdist(x_local, keys)  # [B, N/D, N]
        # mask self: local row r is global row (shard_idx * N/D + r)
        shard = jax.lax.axis_index("data")
        n_local = x_local.shape[1]
        row_g = (
            jax.lax.broadcasted_iota(jnp.int32, scores.shape[1:], 0)
            + shard * n_local
        )
        col_g = jax.lax.broadcasted_iota(jnp.int32, scores.shape[1:], 1)
        scores = jnp.where((row_g == col_g)[None], -jnp.inf, scores)
        _, idx = jax.lax.top_k(scores, k)
        return idx

    return f(x)


def sharded_gather_neighbors(
    feats: jax.Array, idx: jax.Array, mesh: Mesh,
    batch_axis: str | None = None,
) -> jax.Array:
    """Gather neighbor features across shards: feats [B, N, C] and GLOBAL
    idx [B, N, k], both point-sharded -> [B, N, k, C] sharded on axis 1."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(_points_spec(batch_axis), _points_spec(batch_axis)),
        out_specs=P(batch_axis, "data", None, None),
    )
    def f(feats_local, idx_local):
        full = jax.lax.all_gather(feats_local, "data", axis=1, tiled=True)
        return _g.gather_neighbors(full, idx_local)

    return f(feats, idx)


def sharded_soft_correspondence(
    src_emb: jax.Array, tgt_emb: jax.Array, tgt: jax.Array, mesh: Mesh,
    batch_axis: str | None = None,
) -> jax.Array:
    """Whole-whole VCP over point-sharded clouds: the softmax over ALL
    target points runs per local query shard against the all-gathered
    targets -> correspondences [B, Ns, 3], sharded like src."""

    @partial(
        shard_map, mesh=mesh,
        in_specs=(
            _points_spec(batch_axis), _points_spec(batch_axis),
            _points_spec(batch_axis),
        ),
        out_specs=_points_spec(batch_axis),
    )
    def f(se, te, tg):
        te_full = jax.lax.all_gather(te, "data", axis=1, tiled=True)
        tg_full = jax.lax.all_gather(tg, "data", axis=1, tiled=True)
        scores = jax.nn.softmax(
            _g.neg_pairwise_sqdist(se, te_full), axis=2
        )
        return jnp.einsum("bnm,bmc->bnc", scores, tg_full)

    return f(src_emb, tgt_emb, tgt)


def shard_points(
    x: jax.Array, mesh: Mesh, batch_axis: str | None = None
) -> jax.Array:
    """Place [B, N, C] with the point axis sharded over the mesh (and the
    batch axis over ``batch_axis`` on a 2-D dp x sp mesh)."""
    return jax.device_put(x, NamedSharding(mesh, _points_spec(batch_axis)))
