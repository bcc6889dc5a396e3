"""Registration-pair augmentation.

Two paths:

1. ``make_pair_from_cloud`` — host numpy, reproducing the reference's exact
   RNG draw order (util/data.py:247-314) so that eval-set transforms match the
   reference sample-for-sample (test items are seeded by index,
   data.py:255-256). This is the parity path.

2. ``device_augment_batch`` — pure ``jax.random`` on-device augmentation for
   the high-throughput training path (the BASELINE.json north star): one
   fused jitted transform over the whole batch, no host round-trips. Not
   RNG-compatible with numpy, by design.
"""

from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from vcrnet_tpu.config import Config


@dataclasses.dataclass
class RegistrationPair:
    """The canonical 9-tuple one training example carries
    (reference util/data.py:312-314). Points are [N, 3] (channels-last)."""

    src: np.ndarray  # [N, 3]
    tgt: np.ndarray  # [N, 3]
    R_ab: np.ndarray  # [3, 3]
    t_ab: np.ndarray  # [3]
    R_ba: np.ndarray  # [3, 3]
    t_ba: np.ndarray  # [3]
    euler_ab: np.ndarray  # [3] radians, (z, y, x)
    euler_ba: np.ndarray  # [3] radians, (x, y, z) negated-reversed
    label: int

    def astuple(self):
        return (
            self.src, self.tgt, self.R_ab, self.t_ab, self.R_ba, self.t_ba,
            self.euler_ab, self.euler_ba, self.label,
        )


def _euler_zyx_mat(anglez, angley, anglex):
    """R = Rx @ Ry @ Rz, built like reference util/data.py:262-277."""
    cosx, cosy, cosz = np.cos(anglex), np.cos(angley), np.cos(anglez)
    sinx, siny, sinz = np.sin(anglex), np.sin(angley), np.sin(anglez)
    Rx = np.array([[1, 0, 0], [0, cosx, -sinx], [0, sinx, cosx]])
    Ry = np.array([[cosy, 0, siny], [0, 1, 0], [-siny, 0, cosy]])
    Rz = np.array([[cosz, -sinz, 0], [sinz, cosz, 0], [0, 0, 1]])
    return Rx.dot(Ry).dot(Rz)


def nn_crop(points: np.ndarray, reserve: float) -> np.ndarray:
    """Keep the ``int(N*reserve)`` nearest neighbors of the LAST point,
    sorted by distance — simulates a contiguous missing chunk (reference
    util/data.py:320-329). points: [N, 3] -> [int(N*reserve), 3]."""
    n_keep = int(points.shape[0] * reserve)
    seed = points[-1]
    d = ((points - seed) ** 2).sum(-1)
    idx = np.argsort(d, kind="stable")[:n_keep]
    return points[idx]


def make_pair_from_cloud(
    pointcloud: np.ndarray,
    item: int,
    cfg: Config,
    partition: str = "train",
    label: int = 0,
) -> RegistrationPair:
    """Reference-parity ModelNet40 item pipeline (util/data.py:247-314).

    pointcloud: [M, 3] raw cloud (M >= num_points). Uses the GLOBAL numpy
    RNG in the reference's exact draw order; test items reseed with the item
    index first, making eval deterministic.
    """
    pointcloud = np.array(pointcloud, dtype=np.float32)

    if cfg.gaussian_noise:
        n, c = pointcloud.shape
        pointcloud += np.clip(
            0.01 * np.random.randn(n, c), -0.05, 0.05
        ).astype(np.float32)
    if partition != "train":
        np.random.seed(item)

    anglex = np.random.uniform() * np.pi / cfg.factor
    angley = np.random.uniform() * np.pi / cfg.factor
    anglez = np.random.uniform() * np.pi / cfg.factor
    R_ab = _euler_zyx_mat(anglez, angley, anglex)
    R_ba = R_ab.T
    translation_ab = np.array(
        [
            np.random.uniform(-0.5, 0.5),
            np.random.uniform(-0.5, 0.5),
            np.random.uniform(-0.5, 0.5),
        ]
    )
    translation_ba = -R_ba.dot(translation_ab)

    pc1 = np.random.permutation(pointcloud)[: cfg.num_points]  # [N, 3]
    pc2 = pc1 @ R_ab.T + translation_ab  # rotate rows

    euler_ab = np.asarray([anglez, angley, anglex])
    euler_ba = -euler_ab[::-1]

    if cfg.model != "lpd":
        pc1 = np.random.permutation(pc1)
        if cfg.partial:
            pc1 = nn_crop(pc1, cfg.reserve)
        pc2 = np.random.permutation(pc2)
        if cfg.partial:
            pc2 = nn_crop(pc2, cfg.reserve)
    else:
        # LPD keeps point correspondence: jointly permute both clouds
        # (reference data.py:304-309)
        both = np.concatenate([pc1, pc2], axis=1)  # [N, 6]
        both = np.random.permutation(both)
        pc1, pc2 = both[:, :3], both[:, 3:]

    return RegistrationPair(
        src=pc1.astype(np.float32),
        tgt=pc2.astype(np.float32),
        R_ab=R_ab.astype(np.float32),
        t_ab=translation_ab.astype(np.float32),
        R_ba=R_ba.astype(np.float32),
        t_ba=translation_ba.astype(np.float32),
        euler_ab=euler_ab.astype(np.float32),
        euler_ba=euler_ba.astype(np.float32),
        label=label,
    )


# ---------------------------------------------------------------------------
# On-device batched augmentation (TPU path)
# ---------------------------------------------------------------------------


def device_augment_batch(key: jax.Array, clouds: jax.Array, cfg: Config):
    """Fully on-device ModelNet40-style augmentation for a whole batch.

    clouds: [B, M, 3] raw clouds -> dict of batched registration pairs with
    the same distributional semantics as the host path (random zyx rotation
    in [0, pi/factor], translation U(-0.5, 0.5), subsample to num_points,
    optional jitter, optional nearest-to-seed crop), but drawn from the JAX
    PRNG. Shapes are static: the crop keeps int(N*reserve) points.
    """
    B, M, _ = clouds.shape
    k_ang, k_t, k_perm, k_jit, k_p1, k_p2 = jax.random.split(key, 6)

    if cfg.gaussian_noise:
        noise = jnp.clip(0.01 * jax.random.normal(k_jit, clouds.shape), -0.05, 0.05)
        clouds = clouds + noise

    angles = jax.random.uniform(k_ang, (B, 3)) * (jnp.pi / cfg.factor)  # z, y, x
    from vcrnet_tpu import geometry

    R_ab = geometry.euler_to_mat_zyx(angles)
    t_ab = jax.random.uniform(k_t, (B, 3), minval=-0.5, maxval=0.5)

    # subsample to num_points via random permutation
    perm = jax.random.permutation(
        k_perm, jnp.broadcast_to(jnp.arange(M), (B, M)), axis=1, independent=True
    )[:, : cfg.num_points]
    pc1 = jnp.take_along_axis(clouds, perm[:, :, None], axis=1)
    pc2 = geometry.transform_points(pc1, R_ab, t_ab)

    def shuffle(k, pc):
        p = jax.random.permutation(
            k, jnp.broadcast_to(jnp.arange(cfg.num_points), (B, cfg.num_points)),
            axis=1, independent=True,
        )
        return jnp.take_along_axis(pc, p[:, :, None], axis=1)

    pc1 = shuffle(k_p1, pc1)
    pc2 = shuffle(k_p2, pc2)

    if cfg.partial:
        n_keep = int(cfg.num_points * cfg.reserve)

        def crop(pc):
            seed = pc[:, -1:, :]
            d = ((pc - seed) ** 2).sum(-1)  # [B, N]
            _, idx = jax.lax.top_k(-d, n_keep)
            return jnp.take_along_axis(pc, idx[:, :, None], axis=1)

        pc1 = crop(pc1)
        pc2 = crop(pc2)

    R_ba, t_ba = geometry.invert_transform(R_ab, t_ab)
    euler_ab = angles
    euler_ba = -angles[:, ::-1]
    return {
        "src": pc1,
        "tgt": pc2,
        "R_ab": R_ab,
        "t_ab": t_ab,
        "R_ba": R_ba,
        "t_ba": t_ba,
        "euler_ab": euler_ab,
        "euler_ba": euler_ba,
    }
