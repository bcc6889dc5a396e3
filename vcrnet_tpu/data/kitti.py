"""KITTI odometry velodyne dataset (reference util/data.py:48-84, 105-221).

Train sequences 00/03/05/07/10 at ::3 stride, test 02/04/06/08/09. Each item
reads a raw velodyne ``.bin``, pads/truncates to ``int(num_points/reserve)+1``
points, zooms by 1/30, and applies the reference's KITTI-specific
augmentation (±5° x/y, ±30° z, translations (±5, ±5, ±1)m / 30) with the
same RNG draw order.
"""

from __future__ import annotations

import os

import numpy as np

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.augment import RegistrationPair, _euler_zyx_mat, nn_crop

TRAIN_SEQS = ["00", "03", "05", "07", "10"]
TEST_SEQS = ["02", "04", "06", "08", "09"]


def _load_index(data_dir: str, partition: str):
    import h5py

    seqs = TRAIN_SEQS if partition == "train" else TEST_SEQS
    idx_key = "idx_train" if partition == "train" else "idx_odo"
    rot_key = "rotations_train" if partition == "train" else "rotations_odo"
    tr_key = "translations_train" if partition == "train" else "translations_odo"
    stride = slice(None, None, 3) if partition == "train" else slice(None)

    all_idx, rotations, translations = [], [], []
    for seq in seqs:
        path = os.path.join(data_dir, "h5", f"{seq}.h5")
        with h5py.File(path, "r") as f:
            all_idx.append(f[idx_key][stride].astype("int32"))
            rotations.append(f[rot_key][stride].astype("float32"))
            translations.append(f[tr_key][stride].astype("float32"))
    return (
        np.concatenate(all_idx, axis=0),
        np.concatenate(rotations, axis=0),
        np.concatenate(translations, axis=0),
    )


def read_velodyne_bin(path: str, num_points: int) -> np.ndarray:
    """Read xyz from a velodyne bin, pad (tiling point N//6) or truncate to
    num_points (reference util/data.py:105-144). Returns [num_points, 3]."""
    pc = np.fromfile(path, dtype=np.float32, count=-1).reshape(-1, 4)[:, :3]
    n = pc.shape[0]
    if n < num_points:
        supply = np.tile(pc[n // 6, :], (num_points - n, 1))
        pc = np.concatenate([pc, supply], axis=0)
    else:
        pc = pc[:num_points]
    return pc


class KITTI:
    def __init__(self, cfg: Config, partition: str = "train"):
        self.cfg = cfg
        self.partition = partition
        base = cfg.data_dir or os.environ.get("VCRNET_DATA")
        if base is None:
            raise FileNotFoundError("KITTI data not found: set cfg.data_dir")
        self.data_dir = os.path.join(base, "kitti_down")
        self.all_idx, self.rotations, self.translations = _load_index(
            self.data_dir, partition
        )

    def __len__(self):
        return self.all_idx.shape[0]

    def __getitem__(self, item: int) -> RegistrationPair:
        cfg = self.cfg
        n_load = int(cfg.num_points / cfg.reserve) + 1
        seq = int(self.all_idx[item, 0])
        bin_num = int(self.all_idx[item, 1])
        path = os.path.join(
            self.data_dir, "bin", f"{seq:02d}", "velodyne", f"{bin_num:06d}.bin"
        )
        pointcloud = read_velodyne_bin(path, n_load) / 30.0  # zoom

        if self.partition != "train":
            np.random.seed(item)

        # KITTI-specific angle/translation ranges (reference data.py:167-197)
        anglex = (np.random.uniform() - 0.5) * 2 * 5.0 / 180.0 * np.pi
        angley = (np.random.uniform() - 0.5) * 2 * 5.0 / 180.0 * np.pi
        anglez = (np.random.uniform() - 0.5) * 2 * 30.0 / 180.0 * np.pi
        R_ab = _euler_zyx_mat(anglez, angley, anglex)
        R_ba = R_ab.T
        translation_ab = np.array(
            [
                np.random.uniform(-5.0, 5.0) / 30.0,
                np.random.uniform(-5.0, 5.0) / 30.0,
                np.random.uniform(-1.0, 1.0) / 30.0,
            ]
        )
        translation_ba = -R_ba.dot(translation_ab)

        pc1 = np.random.permutation(pointcloud)  # [n_load, 3]
        pc2 = pc1 @ R_ab.T + translation_ab

        euler_ab = np.asarray([anglez, angley, anglex])
        euler_ba = -euler_ab[::-1]

        if cfg.partial:
            pc1 = nn_crop(pc1, cfg.reserve)
        pc1 = pc1[: cfg.num_points]
        pc1 = np.random.permutation(pc1)

        if cfg.partial:
            pc2 = nn_crop(pc2, cfg.reserve)
        pc2 = pc2[: cfg.num_points]
        pc2 = np.random.permutation(pc2)

        return RegistrationPair(
            src=pc1.astype(np.float32),
            tgt=pc2.astype(np.float32),
            R_ab=R_ab.astype(np.float32),
            t_ab=translation_ab.astype(np.float32),
            R_ba=R_ba.astype(np.float32),
            t_ba=translation_ba.astype(np.float32),
            euler_ab=euler_ab.astype(np.float32),
            euler_ba=euler_ba.astype(np.float32),
            label=0,
        )
