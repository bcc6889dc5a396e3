"""Classical batched ICP as a compiled `lax.while_loop`.

Reference model/icp_model.py:16-108 (torch, python loop, per-item SVD) and
util/icp.py (numpy). Here: brute-force nearest neighbor is one [B, N, M]
matmul + argmin per iteration, the rigid solve is the shared batched
Procrustes, and the convergence break (|prev_err - err| < tolerance, batch
mean — reference icp_model.py:37-39) is the while_loop predicate.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vcrnet_tpu import geometry
from vcrnet_tpu.ops import pairwise_sqdist


def nearest_neighbor_corr(src: jax.Array, dst: jax.Array, precision=None):
    """For each src point, the closest dst point.

    src [B, N, 3], dst [B, M, 3] -> (mean_sqdist scalar, corr [B, N, 3]).
    """
    d = pairwise_sqdist(src, dst, precision=precision)  # [B, N, M]
    idx = jnp.argmin(d, axis=-1)  # [B, N]
    val = jnp.min(d, axis=-1)
    corr = jnp.take_along_axis(dst, idx[:, :, None], axis=1)
    return val.mean(), corr


def icp_register(
    src: jax.Array,
    dst: jax.Array,
    max_iterations: int = 50,
    tolerance: float = 1e-3,
    precision=None,
    with_iters: bool = False,
):
    """Align src -> dst. Returns (src, src_aligned, R_ab, t_ab, R_ba, t_ba),
    the reference ICP.forward signature (icp_model.py:26-48).

    ``with_iters=True`` appends the while_loop iteration count actually
    executed (int32 scalar — the tolerance break is a batch-mean predicate,
    so the count is per-batch, reference icp_model.py:37-39). Benchmarks
    report it so an early-converging run can't masquerade as a
    max_iterations-deep one."""

    def cond(carry):
        cur, prev_err, err, i, done = carry
        return jnp.logical_and(i < max_iterations, jnp.logical_not(done))

    def body(carry):
        cur, prev_err, _, i, _ = carry
        err, corr = nearest_neighbor_corr(cur, dst, precision=precision)
        R, t = geometry.procrustes(cur, corr)
        cur = geometry.transform_points(cur, R, t)
        done = jnp.abs(prev_err - err) < tolerance
        return cur, err, err, i + 1, done

    init = (src, jnp.asarray(0.0, src.dtype), jnp.asarray(0.0, src.dtype),
            jnp.asarray(0, jnp.int32), jnp.asarray(False))
    aligned, _, _, n_iters, _ = jax.lax.while_loop(cond, body, init)

    R_ab, t_ab = geometry.procrustes(src, aligned)
    R_ba, t_ba = geometry.invert_transform(R_ab, t_ab)
    if with_iters:
        return src, aligned, R_ab, t_ab, R_ba, t_ba, n_iters
    return src, aligned, R_ab, t_ab, R_ba, t_ba
