"""Host-side batching loader.

Replaces the reference's torch DataLoader + 4 workers (util/initPara.py:216-229)
with a simple numpy batcher: items are stacked into device-ready dicts of
[B, ...] arrays. Augmentation cost at N=1024 is small relative to a training
step; for the throughput-critical path use
``vcrnet_tpu.data.augment.device_augment_batch`` which moves augmentation
onto the TPU entirely.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np

from vcrnet_tpu.config import Config


def collate(pairs) -> dict:
    out = {
        "src": np.stack([p.src for p in pairs]),
        "tgt": np.stack([p.tgt for p in pairs]),
        "R_ab": np.stack([p.R_ab for p in pairs]),
        "t_ab": np.stack([p.t_ab for p in pairs]),
        "R_ba": np.stack([p.R_ba for p in pairs]),
        "t_ba": np.stack([p.t_ba for p in pairs]),
        "euler_ab": np.stack([p.euler_ab for p in pairs]),
        "euler_ba": np.stack([p.euler_ba for p in pairs]),
        "label": np.asarray([p.label for p in pairs], np.int32),
    }
    return out


class Loader:
    """Iterates a map-style dataset in batches of dicts.

    train semantics match the reference: shuffle + drop_last; eval: in-order,
    keep last partial batch padded up to batch size (with a 'valid' mask so
    metrics ignore padding — the reference instead ran a ragged last batch,
    which JAX's static shapes make undesirable).
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def __iter__(self) -> Iterator[dict]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            self.rng.shuffle(order)
        bs = self.batch_size
        stop = (n // bs) * bs if self.drop_last else n
        for start in range(0, stop, bs):
            idx = order[start : start + bs]
            pairs = [self.dataset[int(i)] for i in idx]
            batch = collate(pairs)
            valid = np.ones(len(idx), np.float32)
            if len(idx) < bs:  # pad the ragged tail
                pad = bs - len(idx)
                for k, v in batch.items():
                    batch[k] = np.concatenate(
                        [v, np.repeat(v[-1:], pad, axis=0)], axis=0
                    )
                valid = np.concatenate([valid, np.zeros(pad, np.float32)])
            batch["valid"] = valid
            yield batch


def prefetch(loader, map_fn=None, depth: int = 2):
    """Background-thread prefetch over any batch iterable.

    A worker thread pulls batches (running the dataset's numpy augmentation)
    and applies ``map_fn`` (typically the host->device put, which is async
    in JAX) up to ``depth`` batches ahead, so host-side batch prep and H2D
    transfer overlap device compute. Replaces — and on this workload beats —
    the reference's 4 DataLoader workers (util/initPara.py:219): the heavy
    augmentation can additionally run on-device entirely
    (data/augment.py::device_augment_batch).

    Exceptions in the worker are re-raised in the consumer. If the consumer
    abandons iteration early (generator close / exception mid-epoch), the
    worker is signalled to stop and the queue drained, so no thread parks
    holding device-put batches for the process lifetime.
    """
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, depth))
    sentinel = object()
    stop = threading.Event()

    def worker():
        try:
            for item in loader:
                mapped = map_fn(item) if map_fn is not None else item
                while not stop.is_set():
                    try:
                        q.put(mapped, timeout=0.1)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
            q.put(sentinel)
        except BaseException as e:  # noqa: BLE001 — re-raised in consumer
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while True:  # unblock a worker mid-put and drop pinned batches
            try:
                q.get_nowait()
            except queue.Empty:
                break


def make_datasets(cfg: Config):
    """Dataset factory mirroring the reference dispatch
    (util/initPara.py:216-231), with the synthetic fallback."""
    if cfg.dataset == "modelnet40":
        from vcrnet_tpu.data.modelnet40 import ModelNet40, resolve_data_dir

        if resolve_data_dir(cfg) is not None:
            return ModelNet40(cfg, "train"), ModelNet40(cfg, "test")
        # no data on disk: synthetic clouds through the same pipeline
        from vcrnet_tpu.data.synthetic import SyntheticDataset

        return (
            SyntheticDataset(cfg, "train"),
            SyntheticDataset(cfg, "test", n_items=128),
        )
    if cfg.dataset == "kitti":
        from vcrnet_tpu.data.kitti import KITTI

        return KITTI(cfg, "train"), KITTI(cfg, "test")
    if cfg.dataset in ("synthetic", "synthetic_shapes"):
        from vcrnet_tpu.data.synthetic import SyntheticDataset

        kind = "shapes" if cfg.dataset == "synthetic_shapes" else "uniform"
        return (
            SyntheticDataset(cfg, "train", n_items=1024, kind=kind),
            SyntheticDataset(cfg, "test", n_items=128, kind=kind),
        )
    raise ValueError(f"unknown dataset: {cfg.dataset}")


def make_loaders(cfg: Config):
    train_ds, test_ds = make_datasets(cfg)
    train = Loader(
        train_ds, cfg.batch_size, shuffle=True, drop_last=True, seed=cfg.seed
    )
    test = Loader(test_ds, cfg.test_batch_size, shuffle=False, drop_last=False)
    return train, test
