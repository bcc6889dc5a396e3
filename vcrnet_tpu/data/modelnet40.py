"""ModelNet40 HDF5 dataset (reference util/data.py:16-47, 224-317).

Reads ``ply_data_{train,test}*.h5`` from a data directory (no auto-download
here — this environment has no egress; point ``cfg.data_dir`` or
$VCRNET_DATA at an existing ``modelnet40_ply_hdf5_2048`` directory). Supports
the unseen-category split (categories >= 20 test / < 20 train,
reference data.py:238-245).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.augment import RegistrationPair, make_pair_from_cloud


def resolve_data_dir(cfg: Config) -> str | None:
    cand = cfg.data_dir or os.environ.get("VCRNET_DATA")
    if cand is None:
        return None
    sub = os.path.join(cand, "modelnet40_ply_hdf5_2048")
    return sub if os.path.isdir(sub) else cand


def load_h5(data_dir: str, partition: str):
    import h5py

    files = sorted(glob.glob(os.path.join(data_dir, f"ply_data_{partition}*.h5")))
    if not files:
        raise FileNotFoundError(
            f"no ply_data_{partition}*.h5 under {data_dir}; set cfg.data_dir "
            "or $VCRNET_DATA to a modelnet40_ply_hdf5_2048 directory"
        )
    all_data, all_label = [], []
    for name in files:
        with h5py.File(name, "r") as f:
            all_data.append(f["data"][:].astype("float32"))
            all_label.append(f["label"][:].astype("int64"))
    return np.concatenate(all_data, axis=0), np.concatenate(all_label, axis=0)


class ModelNet40:
    """Map-style dataset yielding RegistrationPair via the parity pipeline."""

    def __init__(self, cfg: Config, partition: str = "train"):
        self.cfg = cfg
        self.partition = partition
        data_dir = resolve_data_dir(cfg)
        if data_dir is None:
            raise FileNotFoundError(
                "ModelNet40 data not found: set cfg.data_dir or $VCRNET_DATA"
            )
        self.data, self.label = load_h5(data_dir, partition)
        self.label = self.label.squeeze()
        if cfg.unseen:
            if partition == "test":
                keep = self.label >= 20
            else:
                keep = self.label < 20
            self.data = self.data[keep]
            self.label = self.label[keep]

    def __len__(self):
        return self.data.shape[0]

    def __getitem__(self, item: int) -> RegistrationPair:
        return make_pair_from_cloud(
            self.data[item], item, self.cfg, self.partition, label=0
        )

    def raw_clouds(self) -> np.ndarray:
        """[num_items, 2048, 3] raw clouds, for the on-device augment path."""
        return self.data
