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


class SyntheticDataset:
    """Map-style dataset of unit-cube clouds run through the SAME parity
    augmentation pipeline as ModelNet40 — exercises every data-path branch
    (crop, permutation, seeding) without the h5 files."""

    def __init__(
        self,
        cfg: Config,
        partition: str = "train",
        n_items: int = 256,
        cloud_points: int = 2048,
        seed: int = 7,
    ):
        self.cfg = cfg
        self.partition = partition
        rng = np.random.RandomState(seed if partition == "train" else seed + 1)
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
