"""Runbook validation against full-fidelity fake dataset trees.

Proves the real-data recipes (docs/RUNBOOK_MODELNET40.md — the reference
README.md:21-42 commands) execute end-to-end against generated trees that
replicate the real datasets' on-disk layout exactly, so a real data drop-in
works unchanged. Shapes are scaled down (num_points/emb/ff/epochs) to keep
the CPU suite fast; the flag STRUCTURE is the recipes' own.
"""

import json
import os

import numpy as np
import pytest

from vcrnet_tpu.cli import main as cli_main
from vcrnet_tpu.data.fixtures import (
    make_fake_kitti_tree,
    make_fake_modelnet40_tree,
)

TINY = [
    "--num_points", "64", "--emb_dims", "64", "--ff_dims", "128",
    "--epochs", "1",
]


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("fake_data")
    make_fake_modelnet40_tree(
        str(root),
        items_per_train_file=(8, 8, 8, 8, 4),
        items_per_test_file=(8, 4),
        cloud_points=256,
    )
    make_fake_kitti_tree(str(root), frames_per_seq=7, points_per_frame=512)
    return str(root)


@pytest.fixture()
def run_cwd(tmp_path, monkeypatch):
    monkeypatch.chdir(tmp_path)
    return tmp_path


def _latest_best_ckpt(run_root, sub="train"):
    runs = sorted((run_root / "checkpoints" / sub).iterdir())
    ckpt = runs[-1] / "models" / "model.best.msgpack"
    assert ckpt.exists(), f"no best checkpoint in {runs[-1]}"
    return str(ckpt)


class TestModelNet40Runbook:
    def test_tree_layout_matches_reference_loader(self, data_root):
        # the reference's own glob (util/data.py:33-38) must see the files
        import glob

        d = os.path.join(data_root, "modelnet40_ply_hdf5_2048")
        assert len(glob.glob(os.path.join(d, "ply_data_train*.h5"))) == 5
        assert len(glob.glob(os.path.join(d, "ply_data_test*.h5"))) == 2
        import h5py

        with h5py.File(
            os.path.join(d, "ply_data_train0.h5"), "r"
        ) as f:
            assert set(f.keys()) >= {"data", "label", "normal", "faceId"}
            assert f["data"].dtype == np.float32
            assert f["label"].dtype == np.uint8
            assert f["data"].shape[1:] == (256, 3)

    def test_recipe_whole_train_then_eval(self, data_root, run_cwd):
        # README.md:25-31: lpd pretrain -> vcrnet train -> eval (whole)
        common = TINY + [
            "--dataset", "modelnet40", "--data_dir", data_root,
        ]
        cli_main(
            common
            + ["--model", "lpd", "--batch_size", "4",
               "--test_batch_size", "4"]
        )
        lpd_ckpt = _latest_best_ckpt(run_cwd)
        cli_main(
            common
            + ["--batch_size", "4", "--test_batch_size", "4",
               "--model_path", lpd_ckpt]
        )
        vcr_ckpt = _latest_best_ckpt(run_cwd)
        cli_main(
            common
            + ["--test_batch_size", "4", "--model_path", vcr_ckpt, "--eval"]
        )
        runs = sorted((run_cwd / "checkpoints" / "test").iterdir())
        log = (runs[-1] / "run.log").read_text()
        assert "rot_ab_RMSE" in log and "FINISH" in log

    def test_recipe_partial_train_then_eval(self, data_root, run_cwd):
        # README.md:35-41: partial fine-tune from whole ckpt -> iter-3 eval
        common = TINY + [
            "--dataset", "modelnet40", "--data_dir", data_root,
            "--partial", "--overlap", "0.575",
        ]
        cli_main(
            common + ["--batch_size", "4", "--test_batch_size", "4"]
        )
        part_ckpt = _latest_best_ckpt(run_cwd)
        cli_main(
            common
            + ["--test_batch_size", "4", "--model_path", part_ckpt,
               "--iter", "3", "--eval"]
        )
        runs = sorted((run_cwd / "checkpoints" / "test").iterdir())
        log = (runs[-1] / "run.log").read_text()
        assert "rot_ab_RMSE" in log and "FINISH" in log

    def test_unseen_split_works_on_tree(self, data_root):
        from vcrnet_tpu.config import Config
        from vcrnet_tpu.data.modelnet40 import ModelNet40

        cfg = Config(num_points=64, unseen=True, data_dir=data_root)
        tr = ModelNet40(cfg, "train")
        te = ModelNet40(cfg, "test")
        assert np.all(tr.label < 20)
        assert np.all(te.label >= 20)
        assert len(tr) > 0 and len(te) > 0


class TestKittiRunbook:
    def test_train_one_epoch_and_eval(self, data_root, run_cwd):
        # reference KITTI recipes route through the same (model, eval)
        # dispatch; train 1 epoch then eval on the generated tree
        common = TINY + [
            "--dataset", "kitti", "--data_dir", data_root,
        ]
        cli_main(common + ["--batch_size", "2", "--test_batch_size", "2"])
        ckpt = _latest_best_ckpt(run_cwd)
        cli_main(
            common
            + ["--test_batch_size", "2", "--model_path", ckpt, "--eval"]
        )
        runs = sorted((run_cwd / "checkpoints" / "test").iterdir())
        log = (runs[-1] / "run.log").read_text()
        assert "rot_ab_RMSE" in log and "FINISH" in log

    def test_short_frame_pad_branch(self, data_root):
        # frames generated short must tile-pad (reference data.py:110-115):
        # loader output is always the requested size
        from vcrnet_tpu.config import Config
        from vcrnet_tpu.data.kitti import KITTI

        cfg = Config(num_points=64, data_dir=data_root)
        ds = KITTI(cfg, "train")
        assert len(ds) > 0
        for i in range(len(ds)):
            pair = ds[i]
            assert pair.src.shape == (64, 3)
            assert pair.tgt.shape == (64, 3)

    def test_partial_kitti_items(self, data_root):
        from vcrnet_tpu.config import Config
        from vcrnet_tpu.data.kitti import KITTI

        cfg = Config(
            num_points=64, data_dir=data_root, partial=True, overlap=0.575
        )
        ds = KITTI(cfg, "test")
        pair = ds[0]
        assert pair.src.shape == (64, 3)
        # deterministic per-item eval seeding (reference data.py:163)
        pair2 = ds[0]
        np.testing.assert_array_equal(pair.src, pair2.src)
