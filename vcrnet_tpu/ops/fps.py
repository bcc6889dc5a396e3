"""Farthest point sampling as a `lax.fori_loop` (sequential by nature).

Reference util/util.py:107-140 runs a python loop over npoint steps; here the
loop is compiled (static trip count) and the whole batch advances together.
Seeding matches the reference: the first sample is the point farthest from
the barycenter (util/util.py:125-130).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def farthest_point_sample(xyz: jax.Array, npoint: int) -> jax.Array:
    """xyz: [B, N, 3] -> indices [B, npoint] (int32)."""
    B, N, _ = xyz.shape

    barycenter = xyz.mean(axis=1, keepdims=True)  # [B, 1, 3]
    dist0 = jnp.sum((xyz - barycenter) ** 2, axis=-1)  # [B, N]
    farthest = jnp.argmax(dist0, axis=-1)  # [B]

    centroids0 = jnp.zeros((B, npoint), dtype=jnp.int32)
    distance0 = jnp.full((B, N), 1e10, dtype=xyz.dtype)

    def body(i, carry):
        centroids, distance, farthest = carry
        centroids = centroids.at[:, i].set(farthest.astype(jnp.int32))
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)  # [B, N]
        distance = jnp.minimum(distance, dist)
        farthest = jnp.argmax(distance, axis=-1)
        return centroids, distance, farthest

    centroids, _, _ = jax.lax.fori_loop(
        0, npoint, body, (centroids0, distance0, farthest)
    )
    return centroids
