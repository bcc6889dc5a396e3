"""KITTI pipeline test with synthetic velodyne .bin files on disk."""

import os

import numpy as np
import pytest

from vcrnet_tpu.config import Config
from vcrnet_tpu.data.kitti import KITTI, read_velodyne_bin


@pytest.fixture
def kitti_dir(tmp_path):
    import h5py

    base = tmp_path / "kitti_down"
    rng = np.random.RandomState(0)
    for seq in ["00", "03", "05", "07", "10", "02", "04", "06", "08", "09"]:
        bin_dir = base / "bin" / seq / "velodyne"
        bin_dir.mkdir(parents=True)
        for i in range(4):
            pts = rng.rand(300, 4).astype(np.float32) * 20
            pts.tofile(str(bin_dir / f"{i:06d}.bin"))
        h5_dir = base / "h5"
        h5_dir.mkdir(exist_ok=True)
        n = 4
        with h5py.File(str(h5_dir / f"{seq}.h5"), "w") as f:
            idx = np.stack(
                [np.full(n, int(seq)), np.arange(n), np.arange(n)], axis=1
            ).astype("int32")
            for split in ("train", "odo"):
                f[f"idx_{split}"] = idx
                f[f"rotations_{split}"] = np.tile(
                    np.eye(3, dtype="f4"), (n, 1, 1)
                )
                f[f"translations_{split}"] = np.zeros((n, 3), "f4")
    return str(tmp_path)


def test_read_velodyne_pad_and_truncate(tmp_path):
    pts = np.random.RandomState(1).rand(50, 4).astype(np.float32)
    path = str(tmp_path / "a.bin")
    pts.tofile(path)
    out = read_velodyne_bin(path, 80)  # pad
    assert out.shape == (80, 3)
    np.testing.assert_array_equal(out[50:], np.tile(out[50 // 6], (30, 1)))
    out = read_velodyne_bin(path, 20)  # truncate
    assert out.shape == (20, 3)


def test_kitti_dataset_shapes(kitti_dir):
    cfg = Config(dataset="kitti", num_points=128, data_dir=kitti_dir)
    ds = KITTI(cfg, "train")
    assert len(ds) == 2 * 5  # ::3 stride over 4 items -> 2 per sequence
    p = ds[0]
    assert p.src.shape == (128, 3)
    assert p.tgt.shape == (128, 3)
    # zyx euler consistency
    from scipy.spatial.transform import Rotation

    R = Rotation.from_euler("zyx", p.euler_ab).as_matrix()
    np.testing.assert_allclose(p.R_ab, R, atol=1e-6)


def test_kitti_partial_and_determinism(kitti_dir):
    cfg = Config(
        dataset="kitti", num_points=64, partial=True, overlap=0.575,
        data_dir=kitti_dir,
    )
    ds = KITTI(cfg, "test")
    a = ds[1]
    b = ds[1]
    np.testing.assert_array_equal(a.src, b.src)  # seeded by item
    assert a.src.shape == (64, 3)
