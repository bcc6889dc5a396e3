"""Full-fidelity fake dataset trees for runbook validation.

This environment has zero egress (the ModelNet40 auto-download, reference
util/data.py:16-26, was attempted and fails cleanly), so real-data recipes
are proven against GENERATED trees that replicate the real datasets'
on-disk layout exactly — file names, directory structure, h5 keys, dtypes
and shapes — such that dropping the real data in the same place works
unchanged.

ModelNet40 layout (mirrors modelnet40_ply_hdf5_2048 as the reference loads
it, util/data.py:28-47): ``ply_data_train{0..4}.h5`` + ``ply_data_test{0,1}.h5``
each with keys ``data`` [M,2048,3] float32, ``label`` [M,1] uint8,
``normal`` [M,2048,3] float32, ``faceId`` [M,2048] int32, plus
``shape_names.txt`` and the ``*_id2file.json`` sidecars.

KITTI layout (mirrors kitti_down as the reference loads it,
util/data.py:48-84, 105-144): ``kitti_down/h5/<seq>.h5`` with
``idx_train/rotations_train/translations_train`` for the train sequences
(00/03/05/07/10) and ``idx_odo/rotations_odo/translations_odo`` for the
test sequences (02/04/06/08/09); ``kitti_down/bin/<seq>/velodyne/<n>.bin``
raw [N,4] float32 velodyne frames. idx rows are (seq, bin, bin_next) —
the reference stores the true sequence number and adds/removes 11 around
``getPointCloud`` (data.py:156, 132-133), making the two-frame branch dead;
generated idx matches the real files' stored values.
"""

from __future__ import annotations

import json
import os

import numpy as np

from vcrnet_tpu.data.synthetic import random_shape_cloud

MODELNET40_SHAPE_NAMES = [
    "airplane", "bathtub", "bed", "bench", "bookshelf", "bottle", "bowl",
    "car", "chair", "cone", "cup", "curtain", "desk", "door", "dresser",
    "flower_pot", "glass_box", "guitar", "keyboard", "lamp", "laptop",
    "mantel", "monitor", "night_stand", "person", "piano", "plant", "radio",
    "range_hood", "sink", "sofa", "stairs", "stool", "table", "tent",
    "toilet", "tv_stand", "vase", "wardrobe", "xbox",
]

# real modelnet40_ply_hdf5_2048 per-file item counts
_FULL_TRAIN_COUNTS = (2048, 2048, 2048, 2048, 1648)
_FULL_TEST_COUNTS = (2048, 420)

KITTI_TRAIN_SEQS = ("00", "03", "05", "07", "10")
KITTI_TEST_SEQS = ("02", "04", "06", "08", "09")


def make_fake_modelnet40_tree(
    root: str,
    items_per_train_file: tuple = (16, 16, 16, 16, 12),
    items_per_test_file: tuple = (16, 8),
    cloud_points: int = 2048,
    seed: int = 0,
) -> str:
    """Write a modelnet40_ply_hdf5_2048 tree under ``root``; returns the
    dataset directory. Defaults are tiny (CI-sized); pass
    ``_FULL_TRAIN_COUNTS``/``_FULL_TEST_COUNTS`` for real-scale shapes.
    Clouds are structured primitive compositions (learnable geometry) in
    the unit ball, like the real (normalised) ModelNet40 clouds."""
    import h5py

    target = os.path.join(root, "modelnet40_ply_hdf5_2048")
    os.makedirs(target, exist_ok=True)
    rng = np.random.RandomState(seed)

    with open(os.path.join(target, "shape_names.txt"), "w") as f:
        f.write("\n".join(MODELNET40_SHAPE_NAMES) + "\n")

    def write_files(partition, counts):
        names = []
        for i, m in enumerate(counts):
            name = f"ply_data_{partition}{i}.h5"
            data = np.stack(
                [random_shape_cloud(rng, cloud_points) for _ in range(m)]
            ).astype(np.float32)
            label = rng.randint(0, 40, size=(m, 1)).astype(np.uint8)
            normal = rng.randn(m, cloud_points, 3).astype(np.float32)
            normal /= np.linalg.norm(normal, axis=-1, keepdims=True) + 1e-9
            face_id = rng.randint(
                0, 4 * cloud_points, size=(m, cloud_points)
            ).astype(np.int32)
            with h5py.File(os.path.join(target, name), "w") as f:
                f.create_dataset("data", data=data)
                f.create_dataset("label", data=label)
                f.create_dataset("normal", data=normal)
                f.create_dataset("faceId", data=face_id)
            id2file = [
                f"{partition}/{MODELNET40_SHAPE_NAMES[int(l)]}_{j:04d}.ply"
                for j, l in enumerate(label[:, 0])
            ]
            with open(
                os.path.join(target, f"ply_data_{partition}_{i}_id2file.json"),
                "w",
            ) as f:
                json.dump(id2file, f)
            names.append(name)
        with open(
            os.path.join(target, f"{partition}_files.txt"), "w"
        ) as f:
            f.write(
                "\n".join(
                    f"data/modelnet40_ply_hdf5_2048/{n}" for n in names
                )
                + "\n"
            )

    write_files("train", items_per_train_file)
    write_files("test", items_per_test_file)
    return target


def _street_like_frame(rng: np.random.RandomState, n: int) -> np.ndarray:
    """A velodyne-ish frame: a ground disc plus a few vertical structures,
    raw coordinates in metres (the loader divides by 30)."""
    n_ground = int(n * 0.6)
    ang = rng.uniform(0, 2 * np.pi, n_ground)
    r = 25.0 * np.sqrt(rng.uniform(0.01, 1.0, n_ground))
    ground = np.stack(
        [r * np.cos(ang), r * np.sin(ang),
         rng.normal(-1.7, 0.05, n_ground)], axis=1,
    )
    parts = [ground]
    remaining = n - n_ground
    n_struct = rng.randint(3, 7)
    counts = np.full(n_struct, remaining // n_struct)
    counts[: remaining - counts.sum()] += 1
    for m in counts:
        cx, cy = rng.uniform(-20, 20, 2)
        w = rng.uniform(0.5, 4.0)
        h = rng.uniform(2.0, 10.0)
        parts.append(
            np.stack(
                [
                    cx + rng.uniform(-w, w, m),
                    cy + rng.uniform(-w, w, m),
                    rng.uniform(-1.7, h, m),
                ],
                axis=1,
            )
        )
    pts = np.concatenate(parts, axis=0).astype(np.float32)
    intensity = rng.uniform(0, 1, (pts.shape[0], 1)).astype(np.float32)
    return np.concatenate([pts, intensity], axis=1)  # [N, 4]


def make_fake_kitti_tree(
    root: str,
    frames_per_seq: int = 12,
    points_per_frame: int = 4096,
    seed: int = 0,
) -> str:
    """Write a kitti_down tree (both partitions, all 10 sequences) under
    ``root``; returns the kitti_down directory. Some frames are generated
    short (< the loader's requested count) to exercise the tile-pad branch
    (reference util/data.py:110-115)."""
    import h5py

    target = os.path.join(root, "kitti_down")
    rng = np.random.RandomState(seed)
    for seqs, idx_key, rot_key, tr_key in (
        (KITTI_TRAIN_SEQS, "idx_train", "rotations_train",
         "translations_train"),
        (KITTI_TEST_SEQS, "idx_odo", "rotations_odo", "translations_odo"),
    ):
        for seq in seqs:
            vel_dir = os.path.join(target, "bin", seq, "velodyne")
            os.makedirs(vel_dir, exist_ok=True)
            for b in range(frames_per_seq):
                # every 5th frame short: exercises the pad/tile branch
                n = (
                    points_per_frame // 8
                    if b % 5 == 4
                    else points_per_frame + rng.randint(-256, 256)
                )
                _street_like_frame(rng, n).tofile(
                    os.path.join(vel_dir, f"{b:06d}.bin")
                )
            m = frames_per_seq - 1
            idx = np.stack(
                [
                    np.full(m, int(seq), np.int32),
                    np.arange(m, dtype=np.int32),
                    np.arange(1, m + 1, dtype=np.int32),
                ],
                axis=1,
            )
            rots = np.tile(np.eye(3, dtype=np.float32), (m, 1, 1))
            trans = rng.uniform(-1, 1, (m, 3)).astype(np.float32)
            os.makedirs(os.path.join(target, "h5"), exist_ok=True)
            with h5py.File(os.path.join(target, "h5", f"{seq}.h5"), "w") as f:
                f.create_dataset(idx_key, data=idx)
                f.create_dataset(rot_key, data=rots)
                f.create_dataset(tr_key, data=trans)
    return target


def main(argv=None):
    import argparse

    p = argparse.ArgumentParser(
        description="Generate full-fidelity fake dataset trees "
        "(see docs/RUNBOOK_MODELNET40.md)"
    )
    p.add_argument("--root", type=str, default="dataset")
    p.add_argument("--which", choices=["modelnet40", "kitti", "both"],
                   default="both")
    p.add_argument("--full", action="store_true",
                   help="real-scale ModelNet40 item counts (9840/2468)")
    p.add_argument("--seed", type=int, default=0)
    args = p.parse_args(argv)
    if args.which in ("modelnet40", "both"):
        if args.full:
            out = make_fake_modelnet40_tree(
                args.root, _FULL_TRAIN_COUNTS, _FULL_TEST_COUNTS,
                seed=args.seed,
            )
        else:
            out = make_fake_modelnet40_tree(args.root, seed=args.seed)
        print(out)
    if args.which in ("kitti", "both"):
        print(make_fake_kitti_tree(args.root, seed=args.seed))


if __name__ == "__main__":
    main()
