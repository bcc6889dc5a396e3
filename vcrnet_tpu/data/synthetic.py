"""Synthetic registration-pair dataset with known ground truth.

Generalises the reference's ``getDateset`` fixture (model/icp_model.py:117-171,
the closest thing to a test fixture in the reference repo): random uniform
clouds, known (R, t) built from seeded euler draws. Needs no dataset download
— used by the test suite and the benchmark harness.
"""

from __future__ import annotations

import numpy as np

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.augment import RegistrationPair, make_pair_from_cloud


def random_shape_cloud(rng: np.random.RandomState, n_points: int) -> np.ndarray:
    """A structured cloud: a random composition of 2-4 geometric primitives
    (sphere/box/cylinder/plane surfaces), normalised to the unit ball —
    ModelNet40-like local structure so kNN graphs and registration accuracy
    are meaningful (uniform noise has no learnable geometry)."""
    n_parts = rng.randint(2, 5)
    counts = np.full(n_parts, n_points // n_parts)
    counts[: n_points - counts.sum()] += 1
    parts = []
    for m in counts:
        kind = rng.randint(4)
        center = rng.uniform(-0.4, 0.4, 3)
        if kind == 0:  # sphere surface
            u = rng.randn(m, 3)
            u /= np.linalg.norm(u, axis=1, keepdims=True) + 1e-9
            p = center + rng.uniform(0.1, 0.35) * u
        elif kind == 1:  # box surface
            half = rng.uniform(0.08, 0.3, 3)
            p = rng.uniform(-1, 1, (m, 3)) * half
            face_axis = rng.randint(0, 3, m)
            face_sign = rng.choice([-1.0, 1.0], m)
            p[np.arange(m), face_axis] = half[face_axis] * face_sign
            p = center + p
        elif kind == 2:  # cylinder shell
            r = rng.uniform(0.05, 0.25)
            h = rng.uniform(0.1, 0.5)
            ang = rng.uniform(0, 2 * np.pi, m)
            p = np.stack(
                [r * np.cos(ang), r * np.sin(ang),
                 rng.uniform(-h, h, m)], axis=1,
            ) + center
        else:  # planar patch
            extent = rng.uniform(0.15, 0.4, 2)
            p2 = rng.uniform(-1, 1, (m, 2)) * extent
            normal = rng.randn(3)
            normal /= np.linalg.norm(normal) + 1e-9
            b1 = np.cross(normal, [1.0, 0.0, 0.0])
            if np.linalg.norm(b1) < 1e-6:
                b1 = np.cross(normal, [0.0, 1.0, 0.0])
            b1 /= np.linalg.norm(b1)
            b2 = np.cross(normal, b1)
            p = center + p2[:, :1] * b1 + p2[:, 1:] * b2
        parts.append(p)
    cloud = np.concatenate(parts, axis=0).astype(np.float32)
    cloud -= cloud.mean(axis=0)
    cloud /= np.abs(cloud).max() + 1e-9  # unit-ball-ish like ModelNet40
    return cloud


class SyntheticDataset:
    """Map-style dataset of synthetic clouds run through the SAME parity
    augmentation pipeline as ModelNet40 — exercises every data-path branch
    (crop, permutation, seeding) without the h5 files.

    kind='uniform' (default): unit-cube noise, used by the test suite.
    kind='shapes': random primitive compositions with real local geometry,
    used for trained-accuracy demos.
    """

    def __init__(
        self,
        cfg: Config,
        partition: str = "train",
        n_items: int = 256,
        cloud_points: int = 2048,
        seed: int = 7,
        kind: str = "uniform",
    ):
        self.cfg = cfg
        self.partition = partition
        rng = np.random.RandomState(seed if partition == "train" else seed + 1)
        if kind == "shapes":
            self.data = np.stack(
                [random_shape_cloud(rng, cloud_points) for _ in range(n_items)]
            )
        else:
            self.data = (
                rng.rand(n_items, cloud_points, 3).astype(np.float32) - 0.5
            )

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int) -> RegistrationPair:
        return make_pair_from_cloud(
            self.data[item], item, self.cfg, self.partition, label=0
        )

    def raw_clouds(self) -> np.ndarray:
        return self.data
