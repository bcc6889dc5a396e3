"""Batched rigid-transform math. Everything is [B, ...] and jit/vmap friendly.

Replaces the reference's three duplicated SVD solvers (model/vcrnet_model.py:350-399,
model/icp_model.py:75-108, util/icp.py:10-51) with one batched, branchless,
differentiable Procrustes solve, and the per-item scipy euler loops
(util/util.py:99-104) with closed-form conversions.

Conventions:
  * points are row vectors, shape [B, N, 3] (channels-last for TPU lanes)
  * rotations R are [B, 3, 3] acting on column vectors: p' = p @ R^T + t,
    identical to the reference's R @ p_col + t (util/util.py:91-96)
  * euler orders follow scipy's extrinsic lowercase convention:
      'zyx' (angles [z, y, x]): R = Rx @ Ry @ Rz   (A->B in the reference)
      'xyz' (angles [x, y, z]): R = Rz @ Ry @ Rx   (B->A)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quat2mat(quat: jax.Array) -> jax.Array:
    """Quaternion [B, 4] in (x, y, z, w) order -> rotation matrix [B, 3, 3].

    Matches reference util/util.py:76-88 (used by the DCP MLP head). The
    quaternion is assumed normalised by the caller.
    """
    x, y, z, w = quat[:, 0], quat[:, 1], quat[:, 2], quat[:, 3]
    w2, x2, y2, z2 = w * w, x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    rot = jnp.stack(
        [
            w2 + x2 - y2 - z2, 2 * xy - 2 * wz, 2 * wy + 2 * xz,
            2 * wz + 2 * xy, w2 - x2 + y2 - z2, 2 * yz - 2 * wx,
            2 * xz - 2 * wy, 2 * wx + 2 * yz, w2 - x2 - y2 + z2,
        ],
        axis=1,
    )
    return rot.reshape(-1, 3, 3)


def transform_points(points: jax.Array, R: jax.Array, t: jax.Array) -> jax.Array:
    """Apply rigid transform: [B, N, 3] x [B, 3, 3] x [B, 3] -> [B, N, 3]."""
    return jnp.einsum("bij,bnj->bni", R, points) + t[:, None, :]


def invert_transform(R: jax.Array, t: jax.Array):
    """(R, t) -> (R^T, -R^T t). Reference model/vcrnet_model.py:515-516."""
    R_inv = jnp.swapaxes(R, -1, -2)
    t_inv = -jnp.einsum("bij,bj->bi", R_inv, t)
    return R_inv, t_inv


def compose_transforms(R2: jax.Array, t2: jax.Array, R1: jax.Array, t1: jax.Array):
    """Composition (R2, t2) o (R1, t1): first apply 1, then 2.

    Reference model/vcrnet_model.py:35-38 (iterative refinement composition).
    """
    R = jnp.einsum("bij,bjk->bik", R2, R1)
    t = jnp.einsum("bij,bj->bi", R2, t1) + t2
    return R, t


# ---------------------------------------------------------------------------
# Euler conversions (scipy extrinsic-lowercase semantics, closed form)
# ---------------------------------------------------------------------------


def euler_to_mat_zyx(angles: jax.Array) -> jax.Array:
    """angles [..., 3] = [z, y, x] (radians), extrinsic 'zyx' -> R = Rx@Ry@Rz.

    Matches scipy Rotation.from_euler('zyx', [z, y, x]) and the reference's
    hand-built R_ab = Rx.dot(Ry).dot(Rz) (util/data.py:268-277).
    """
    az, ay, ax = angles[..., 0], angles[..., 1], angles[..., 2]
    ca, sa = jnp.cos(az), jnp.sin(az)
    cb, sb = jnp.cos(ay), jnp.sin(ay)
    cg, sg = jnp.cos(ax), jnp.sin(ax)
    # Rx(g) @ Ry(b) @ Rz(a)
    row0 = jnp.stack([cb * ca, -cb * sa, sb], axis=-1)
    row1 = jnp.stack(
        [cg * sa + sg * sb * ca, cg * ca - sg * sb * sa, -sg * cb], axis=-1
    )
    row2 = jnp.stack(
        [sg * sa - cg * sb * ca, sg * ca + cg * sb * sa, cg * cb], axis=-1
    )
    return jnp.stack([row0, row1, row2], axis=-2)


def mat_to_euler_zyx(R: jax.Array, degrees: bool = False) -> jax.Array:
    """R [..., 3, 3] -> [z, y, x] angles, extrinsic 'zyx' (R = Rx@Ry@Rz).

    Matches scipy's Rotation.as_euler('zyx') away from gimbal lock
    (|y| = pi/2). Replaces the per-item host loop in util/util.py:99-104.
    """
    sb = jnp.clip(R[..., 0, 2], -1.0, 1.0)
    y = jnp.arcsin(sb)
    z = jnp.arctan2(-R[..., 0, 1], R[..., 0, 0])
    x = jnp.arctan2(-R[..., 1, 2], R[..., 2, 2])
    out = jnp.stack([z, y, x], axis=-1)
    return jnp.degrees(out) if degrees else out


def mat_to_euler_xyz(R: jax.Array, degrees: bool = False) -> jax.Array:
    """R [..., 3, 3] -> [x, y, z] angles, extrinsic 'xyz' (R = Rz@Ry@Rx).

    Used for the B->A metrics (reference model/vcrnet_model.py:784).
    """
    sb = jnp.clip(-R[..., 2, 0], -1.0, 1.0)
    y = jnp.arcsin(sb)
    x = jnp.arctan2(R[..., 2, 1], R[..., 2, 2])
    z = jnp.arctan2(R[..., 1, 0], R[..., 0, 0])
    out = jnp.stack([x, y, z], axis=-1)
    return jnp.degrees(out) if degrees else out


# ---------------------------------------------------------------------------
# Procrustes (Kabsch) solve
# ---------------------------------------------------------------------------


def _svd_rotation(H: jax.Array) -> jax.Array:
    """[B, 3, 3] covariance -> [B, 3, 3] proper rotation via SVD.

    Branchless det-sign fix: flip the last column of V where det(V U^T) < 0
    (equivalent to the reference's diag(1,1,-1) re-solve in
    model/vcrnet_model.py:379-391, but batched and differentiable).
    """
    # Keep the SVD in float32: 3x3 problems are tiny and precision-critical.
    # The tiny diagonal tie-breaker rescues exactly-degenerate H (e.g. all
    # correspondences identical) from NaN gradients; at typical magnitudes
    # it is far below float32 resolution, so results are unchanged. The
    # reference instead printed NaN warnings (vcrnet_model.py:366-374).
    H = H.astype(jnp.float32) + 1e-12 * jnp.eye(3, dtype=jnp.float32)
    U, _, Vt = jnp.linalg.svd(H)
    V = jnp.swapaxes(Vt, -1, -2)
    R = jnp.einsum("bij,bkj->bik", V, U)  # V @ U^T
    det = jnp.linalg.det(R)
    # flip V's last column where the solution is a reflection
    flip = jnp.where(det < 0, -1.0, 1.0)[:, None]
    V = V.at[:, :, 2].multiply(flip)
    return jnp.einsum("bij,bkj->bik", V, U)


def procrustes(src: jax.Array, corr: jax.Array, weights: jax.Array | None = None):
    """Least-squares rigid transform aligning src -> corr.

    src, corr: [B, N, 3]; optional weights [B, N] (>= 0). Returns R [B, 3, 3],
    t [B, 3] such that corr ~= src @ R^T + t.

    Weighted generalisation of the reference SVDHead (model/vcrnet_model.py:356-399):
    weights let callers express masked/partial correspondences with static
    shapes (weight 0 = dropped point) instead of dynamic subset sizes.
    """
    if weights is None:
        src_mean = src.mean(axis=1, keepdims=True)
        corr_mean = corr.mean(axis=1, keepdims=True)
        src_c = src - src_mean
        corr_c = corr - corr_mean
        H = jnp.einsum("bni,bnj->bij", src_c, corr_c)
    else:
        w = weights[:, :, None]
        wsum = jnp.maximum(w.sum(axis=1, keepdims=True), 1e-12)
        src_mean = (src * w).sum(axis=1, keepdims=True) / wsum
        corr_mean = (corr * w).sum(axis=1, keepdims=True) / wsum
        src_c = src - src_mean
        corr_c = corr - corr_mean
        H = jnp.einsum("bni,bnj->bij", src_c * w, corr_c)

    R = _svd_rotation(H)
    t = corr_mean[:, 0, :] - jnp.einsum("bij,bj->bi", R, src_mean[:, 0, :])
    return R, t
