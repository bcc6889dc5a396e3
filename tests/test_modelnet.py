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


class TestAutoDownload:
    """The reference auto-downloads the zip when missing (util/data.py:16-26);
    we reproduce that behind a clean offline failure path."""

    def _make_zip(self, tmp_path):
        import io
        import zipfile
        import h5py

        h5_bytes = io.BytesIO()
        with h5py.File(h5_bytes, "w") as f:
            f["data"] = np.zeros((4, 16, 3), np.float32)
            f["label"] = np.zeros((4, 1), np.int64)
        zpath = tmp_path / "modelnet40_ply_hdf5_2048.zip"
        with zipfile.ZipFile(zpath, "w") as z:
            z.writestr(
                "modelnet40_ply_hdf5_2048/ply_data_train0.h5",
                h5_bytes.getvalue(),
            )
        return zpath

    def test_download_extracts_zip(self, tmp_path):
        from vcrnet_tpu.data.modelnet40 import try_download

        zpath = self._make_zip(tmp_path)
        root = tmp_path / "dataset"
        out = try_download(str(root), url=f"file://{zpath}")
        assert out is not None
        data, label = load_h5(out, "train")
        assert data.shape == (4, 16, 3)
        # idempotent: existing dir short-circuits (no fetch)
        assert try_download(str(root), url="file:///nonexistent") == out

    def test_download_failure_returns_none(self, tmp_path):
        from vcrnet_tpu.data.modelnet40 import try_download

        root = tmp_path / "dataset"
        assert try_download(
            str(root), url=f"file://{tmp_path}/missing.zip"
        ) is None
        # no stray temp files left behind
        assert not any(root.glob("*.zip")) if root.exists() else True

    def test_resolve_respects_offline(self, monkeypatch, tmp_path):
        from vcrnet_tpu.data import modelnet40 as m

        monkeypatch.setenv("VCRNET_OFFLINE", "1")
        monkeypatch.delenv("VCRNET_DATA", raising=False)
        monkeypatch.setattr(m, "_download_attempted", False)
        monkeypatch.setattr(m, "default_data_root", lambda: str(tmp_path))
        called = []
        monkeypatch.setattr(m, "try_download", lambda *a, **k: called.append(1))
        assert m.resolve_data_dir(Config(num_points=64)) is None
        assert not called

    def test_resolve_attempts_download_once(self, monkeypatch, tmp_path):
        from vcrnet_tpu.data import modelnet40 as m

        monkeypatch.delenv("VCRNET_OFFLINE", raising=False)
        monkeypatch.delenv("VCRNET_DATA", raising=False)
        monkeypatch.setattr(m, "_download_attempted", False)
        monkeypatch.setattr(m, "default_data_root", lambda: str(tmp_path))
        calls = []

        def fake_download(*a, **k):
            calls.append(1)
            return None

        monkeypatch.setattr(m, "try_download", fake_download)
        assert m.resolve_data_dir(Config(num_points=64)) is None
        assert m.resolve_data_dir(Config(num_points=64)) is None
        assert len(calls) == 1  # one attempt per process
