"""ModelNet40 h5 loader tests with synthetic h5 files on disk."""

import numpy as np
import pytest

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.modelnet40 import ModelNet40, load_h5


@pytest.fixture
def mn40_dir(tmp_path):
    import h5py

    d = tmp_path / "modelnet40_ply_hdf5_2048"
    d.mkdir()
    rng = np.random.RandomState(0)
    for split, n in (("train", 48), ("test", 24)):
        for part in range(2):
            with h5py.File(str(d / f"ply_data_{split}{part}.h5"), "w") as f:
                f["data"] = rng.rand(n // 2, 256, 3).astype("f4")
                f["label"] = rng.randint(0, 40, (n // 2, 1)).astype("i8")
    return str(tmp_path)


def test_load_h5_concatenates_files(mn40_dir):
    import os

    data, label = load_h5(
        os.path.join(mn40_dir, "modelnet40_ply_hdf5_2048"), "train"
    )
    assert data.shape == (48, 256, 3)
    assert label.shape == (48, 1)


def test_dataset_items(mn40_dir):
    cfg = Config(num_points=128, data_dir=mn40_dir)
    ds = ModelNet40(cfg, "test")
    assert len(ds) == 24
    p = ds[3]
    assert p.src.shape == (128, 3)
    q = ds[3]
    np.testing.assert_array_equal(p.src, q.src)  # eval determinism


def test_unseen_split(mn40_dir):
    cfg = Config(num_points=64, data_dir=mn40_dir, unseen=True)
    train = ModelNet40(cfg, "train")
    test = ModelNet40(cfg, "test")
    assert np.all(train.label < 20)
    assert np.all(test.label >= 20)
    assert len(train) + len(test) <= 72


def test_missing_data_raises():
    cfg = Config(num_points=64, data_dir="/nonexistent")
    with pytest.raises(FileNotFoundError):
        ModelNet40(cfg, "train")
