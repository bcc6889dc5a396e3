"""KITTI shape-family smoke on real TPU (VERDICT r4 #5 / r3 #5).

Builds a synthetic-but-full-fidelity KITTI odometry tree (raw velodyne
.bin files at realistic raw sizes ~120k points, h5 index/pose files per
sequence — the exact layout util/data.py:48-84 reads), then runs the
REAL pipeline end to end at reference KITTI shapes: bin read ->
pad/truncate to num_points -> /30 zoom -> aug (+-5 deg x/y, +-30 deg z)
-> jitted eval epoch on the TPU. Records wall + per-batch step time.

The point of the exercise: prove the second dataset's shape family
(pad/truncate path, zoomed coordinate scale ~[-2, 2] x/y, +-0.08 z)
compiles and runs on TPU, with a recorded number. Contents are
synthetic (zero-egress box, real bins can't land) but every shape,
dtype, file format, and code path is the real one.

Usage: PYTHONPATH=/root/.axon_site:/root/repo \
    python benchmarks/kitti_tpu_smoke.py [num_points] [batch]
"""

import os
import sys
import time

import numpy as np

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_comp_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TREE = "/tmp/kitti_fake"


def build_tree(raw_points: int = 120_000, n_frames: int = 8) -> str:
    """data_dir layout consumed by vcrnet_tpu.data.kitti (mirrors the
    reference tree: <data_dir>/kitti_down/{bin/<seq>/velodyne/*.bin,
    h5/<seq>.h5})."""
    import h5py

    if os.path.exists(os.path.join(TREE, ".done")):
        return TREE
    rng = np.random.RandomState(0)
    base = os.path.join(TREE, "kitti_down")
    for seq in ["00", "03", "05", "07", "10", "02", "04", "06", "08", "09"]:
        bin_dir = os.path.join(base, "bin", seq, "velodyne")
        os.makedirs(bin_dir, exist_ok=True)
        for i in range(n_frames):
            # realistic raw scan scale: xyz in tens of meters + intensity
            pts = np.empty((raw_points, 4), np.float32)
            pts[:, :3] = rng.randn(raw_points, 3) * 20.0
            pts[:, 3] = rng.rand(raw_points)
            pts.tofile(os.path.join(bin_dir, f"{i:06d}.bin"))
        h5_dir = os.path.join(base, "h5")
        os.makedirs(h5_dir, exist_ok=True)
        idx = np.stack(
            [np.full(n_frames, int(seq)), np.arange(n_frames),
             np.arange(n_frames)], axis=1,
        ).astype("int32")
        with h5py.File(os.path.join(h5_dir, f"{seq}.h5"), "w") as f:
            for split in ("train", "odo"):
                f[f"idx_{split}"] = idx
                f[f"rotations_{split}"] = np.tile(
                    np.eye(3, dtype="f4"), (n_frames, 1, 1)
                )
                f[f"translations_{split}"] = np.zeros((n_frames, 3), "f4")
    open(os.path.join(TREE, ".done"), "w").close()
    return TREE


def main():
    num_points = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    batch = int(sys.argv[2]) if len(sys.argv) > 2 else 16

    from vcrnet_tpu.config import Config
    from vcrnet_tpu.data.kitti import KITTI
    from vcrnet_tpu.data import Loader
    from vcrnet_tpu.train import Trainer

    data_dir = build_tree()
    cfg = Config(
        dataset="kitti", data_dir=data_dir, num_points=num_points,
        emb_dims=512, test_batch_size=batch, compute_dtype="bfloat16",
        iter=1,
    )
    ds = KITTI(cfg, "test")
    loader = Loader(ds, cfg.test_batch_size, shuffle=False, drop_last=False)
    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), next(iter(loader)))

    t0 = time.perf_counter()
    summary = trainer.eval_epoch(state, loader)  # compile + run
    t_cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    summary = trainer.eval_epoch(state, loader)
    t_warm = time.perf_counter() - t0
    n_items = len(ds)
    n_batches = -(-n_items // batch)
    print(
        f"KITTI eval on {jax.default_backend()}: N={num_points} B={batch} "
        f"items={n_items} cold_epoch={t_cold:.2f}s "
        f"warm_epoch={t_warm:.2f}s ({t_warm / n_batches * 1000:.1f} "
        f"ms/batch incl. host loop) rot_RMSE={summary['rot_ab_RMSE']:.3f}"
    )


if __name__ == "__main__":
    main()
