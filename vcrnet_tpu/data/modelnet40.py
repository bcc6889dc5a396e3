"""ModelNet40 HDF5 dataset (reference util/data.py:16-47, 224-317).

Reads ``ply_data_{train,test}*.h5`` from a data directory. Resolution order:
``cfg.data_dir``, then ``$VCRNET_DATA``, then ``<repo>/dataset`` — and when
none exists, ONE auto-download attempt of the reference's zip (reference
util/data.py:16-26, via urllib instead of ``os.system(wget)``) unless
``$VCRNET_OFFLINE`` is set. A failed attempt (this environment has no
egress) degrades cleanly: callers get ``None`` and fall back to the
synthetic pipeline. Supports the unseen-category split (categories >= 20
test / < 20 train, reference data.py:238-245).
"""

from __future__ import annotations

import glob
import os

import numpy as np

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.augment import RegistrationPair, make_pair_from_cloud

# reference util/data.py:22
MODELNET40_URL = (
    "https://shapenet.cs.stanford.edu/media/modelnet40_ply_hdf5_2048.zip"
)

_download_attempted = False  # one network attempt per process


def default_data_root() -> str:
    """<repo>/dataset — the reference keeps the dataset beside the repo
    (util/data.py:17-18)."""
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    return os.path.join(os.path.dirname(pkg), "dataset")


def try_download(
    data_root: str | None = None,
    url: str = MODELNET40_URL,
    timeout: float = 30.0,
) -> str | None:
    """Attempt the reference's auto-download (util/data.py:16-26). Returns
    the extracted ``modelnet40_ply_hdf5_2048`` directory on success, None on
    ANY failure — offline is the normal case here, not an error."""
    root = data_root or default_data_root()
    target = os.path.join(root, "modelnet40_ply_hdf5_2048")
    if os.path.isdir(target):
        return target
    import shutil
    import tempfile
    import urllib.request
    import zipfile

    tmp_path = None
    try:
        os.makedirs(root, exist_ok=True)
        with tempfile.NamedTemporaryFile(
            suffix=".zip", dir=root, delete=False
        ) as tmp:
            tmp_path = tmp.name
            with urllib.request.urlopen(url, timeout=timeout) as resp:
                shutil.copyfileobj(resp, tmp)
        with zipfile.ZipFile(tmp_path) as z:
            # zip-slip guard: reject absolute paths and '..' components
            # (extractall(filter=...) is tarfile-only; do it by hand)
            base = os.path.realpath(root)
            for name in z.namelist():
                dest = os.path.realpath(os.path.join(base, name))
                if not (dest == base or dest.startswith(base + os.sep)):
                    raise ValueError(f"unsafe zip member: {name!r}")
            z.extractall(root)
        return target if os.path.isdir(target) else None
    except Exception:
        return None
    finally:
        if tmp_path is not None and os.path.exists(tmp_path):
            os.remove(tmp_path)


def resolve_data_dir(cfg: Config) -> str | None:
    global _download_attempted
    cand = cfg.data_dir or os.environ.get("VCRNET_DATA")
    if cand is not None:
        sub = os.path.join(cand, "modelnet40_ply_hdf5_2048")
        return sub if os.path.isdir(sub) else cand
    default = os.path.join(default_data_root(), "modelnet40_ply_hdf5_2048")
    if os.path.isdir(default):
        return default
    if os.environ.get("VCRNET_OFFLINE") or _download_attempted:
        return None
    _download_attempted = True
    return try_download()


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
