"""Data pipeline tests: RNG parity with the reference draw order,
determinism, crop semantics, loader behaviour, on-device augmentation."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from vcrnet_tpu.config import Config
from vcrnet_tpu.data import SyntheticDataset, Loader, make_pair_from_cloud
from vcrnet_tpu.data.augment import nn_crop, device_augment_batch
from vcrnet_tpu.data.pipeline import make_loaders


def reference_item_semantics(pointcloud, item, cfg, partition):
    """Independent mirror of reference util/data.py:247-314 (channels-first,
    exactly as the reference computes it) used as the parity golden."""
    pointcloud = np.array(pointcloud, dtype=np.float32)
    if cfg.gaussian_noise:
        N, C = pointcloud.shape
        pointcloud += np.clip(0.01 * np.random.randn(N, C), -0.05, 0.05)
    if partition != "train":
        np.random.seed(item)
    anglex = np.random.uniform() * np.pi / cfg.factor
    angley = np.random.uniform() * np.pi / cfg.factor
    anglez = np.random.uniform() * np.pi / cfg.factor
    cosx, cosy, cosz = np.cos(anglex), np.cos(angley), np.cos(anglez)
    sinx, siny, sinz = np.sin(anglex), np.sin(angley), np.sin(anglez)
    Rx = np.array([[1, 0, 0], [0, cosx, -sinx], [0, sinx, cosx]])
    Ry = np.array([[cosy, 0, siny], [0, 1, 0], [-siny, 0, cosy]])
    Rz = np.array([[cosz, -sinz, 0], [sinz, cosz, 0], [0, 0, 1]])
    R_ab = Rx.dot(Ry).dot(Rz)
    translation_ab = np.array(
        [np.random.uniform(-0.5, 0.5), np.random.uniform(-0.5, 0.5),
         np.random.uniform(-0.5, 0.5)]
    )
    pointcloud1 = (np.random.permutation(pointcloud)[: cfg.num_points]).T  # [3,N]
    rotation_ab = Rotation.from_euler("zyx", [anglez, angley, anglex])
    pointcloud2 = rotation_ab.apply(pointcloud1.T).T + np.expand_dims(
        translation_ab, axis=1
    )
    if cfg.model != "lpd":
        pointcloud1 = np.random.permutation(pointcloud1.T).T
        if cfg.partial:
            pointcloud1 = _ref_nn_crop(pointcloud1, cfg.reserve)
        pointcloud2 = np.random.permutation(pointcloud2.T).T
        if cfg.partial:
            pointcloud2 = _ref_nn_crop(pointcloud2, cfg.reserve)
    else:
        both = np.concatenate((pointcloud1, pointcloud2), axis=0)
        both = np.random.permutation(both.T).T
        pointcloud1, pointcloud2 = both[0:3, :], both[3:6, :]
    return (
        pointcloud1.astype(np.float32),
        pointcloud2.astype(np.float32),
        R_ab.astype(np.float32),
        translation_ab.astype(np.float32),
    )


def _ref_nn_crop(pc_3n, reserve):
    """reference util/data.py:320-329 via sklearn, channels-first."""
    from sklearn.neighbors import NearestNeighbors

    dst = pc_3n.T
    num = int(max(dst.shape) * reserve)
    src = dst[-1, :].reshape(1, -1)
    neigh = NearestNeighbors(n_neighbors=num)
    neigh.fit(dst)
    indices = neigh.kneighbors(src, return_distance=False).ravel()
    return dst[indices, :].T


@pytest.mark.parametrize("partial", [False, True])
@pytest.mark.parametrize("model", ["vcrnet", "lpd"])
def test_rng_parity_with_reference(partial, model):
    if model == "lpd" and partial:
        pytest.skip("reference never combines lpd with partial")
    cfg = Config(
        model=model, partial=partial, overlap=0.575, num_points=256, factor=4
    )
    rng = np.random.RandomState(0)
    cloud = rng.rand(512, 3).astype(np.float32) - 0.5

    # both paths consume the global RNG; test partition reseeds per item so
    # the comparison is exact
    ours = make_pair_from_cloud(cloud, item=5, cfg=cfg, partition="test")
    ref_pc1, ref_pc2, ref_R, ref_t = reference_item_semantics(
        cloud, 5, cfg, "test"
    )
    np.testing.assert_allclose(ours.src, ref_pc1.T, atol=1e-6)
    np.testing.assert_allclose(ours.tgt, ref_pc2.T, atol=1e-5)
    np.testing.assert_allclose(ours.R_ab, ref_R, atol=1e-6)
    np.testing.assert_allclose(ours.t_ab, ref_t, atol=1e-6)


def test_eval_items_deterministic():
    cfg = Config(num_points=128)
    cloud = np.random.RandomState(1).rand(256, 3).astype(np.float32)
    a = make_pair_from_cloud(cloud, item=3, cfg=cfg, partition="test")
    b = make_pair_from_cloud(cloud, item=3, cfg=cfg, partition="test")
    np.testing.assert_array_equal(a.src, b.src)
    np.testing.assert_array_equal(a.R_ab, b.R_ab)


def test_pair_consistency():
    # tgt must equal R_ab @ src_pre_shuffle + t; check via set match:
    # inverse-transform tgt and compare sorted point sets (whole mode)
    cfg = Config(num_points=128)
    cloud = np.random.RandomState(2).rand(256, 3).astype(np.float32)
    p = make_pair_from_cloud(cloud, item=0, cfg=cfg, partition="test")
    back = (p.tgt - p.t_ab) @ p.R_ab  # (R^T(tgt - t))^T rows
    s1 = np.sort(p.src.round(5).view([("x", "f4"), ("y", "f4"), ("z", "f4")]), 0)
    s2 = np.sort(back.astype(np.float32).round(5).view(
        [("x", "f4"), ("y", "f4"), ("z", "f4")]), 0)
    assert (np.abs(s1.view("f4") - s2.view("f4")) < 1e-3).mean() > 0.99


def test_nn_crop_matches_sklearn():
    rng = np.random.RandomState(3)
    pc = rng.rand(200, 3).astype(np.float32)
    ours = nn_crop(pc, 0.75)
    ref = _ref_nn_crop(pc.T, 0.75).T
    np.testing.assert_allclose(ours, ref, atol=1e-6)


def test_euler_fields_match_R():
    cfg = Config(num_points=64)
    cloud = np.random.RandomState(4).rand(128, 3).astype(np.float32)
    p = make_pair_from_cloud(cloud, item=9, cfg=cfg, partition="test")
    R_from_euler = Rotation.from_euler("zyx", p.euler_ab).as_matrix()
    np.testing.assert_allclose(p.R_ab, R_from_euler, atol=1e-6)
    R_ba_from_euler = Rotation.from_euler("xyz", p.euler_ba).as_matrix()
    np.testing.assert_allclose(p.R_ba, R_ba_from_euler, atol=1e-5)


class TestLoader:
    def test_shapes_and_drop_last(self):
        cfg = Config(num_points=64, batch_size=8, test_batch_size=24)
        ds = SyntheticDataset(cfg, "train", n_items=20, cloud_points=128)
        loader = Loader(ds, 8, shuffle=True, drop_last=True, seed=0)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[0]["src"].shape == (8, 64, 3)
        assert batches[0]["valid"].sum() == 8

    def test_ragged_tail_padded_and_masked(self):
        cfg = Config(num_points=64)
        ds = SyntheticDataset(cfg, "test", n_items=10, cloud_points=128)
        loader = Loader(ds, 8, shuffle=False, drop_last=False)
        batches = list(loader)
        assert len(batches) == 2
        assert batches[1]["src"].shape == (8, 64, 3)
        assert batches[1]["valid"].sum() == 2

    def test_make_loaders_synthetic_fallback(self):
        cfg = Config(num_points=64, batch_size=4)
        train, test = make_loaders(cfg)
        b = next(iter(train))
        assert b["src"].shape == (4, 64, 3)


class TestDeviceAugment:
    def test_shapes_and_consistency(self):
        cfg = Config(num_points=128)
        clouds = jnp.asarray(
            np.random.RandomState(5).rand(4, 256, 3).astype(np.float32)
        )
        out = jax.jit(lambda k, c: device_augment_batch(k, c, cfg))(
            jax.random.PRNGKey(0), clouds
        )
        assert out["src"].shape == (4, 128, 3)
        assert out["tgt"].shape == (4, 128, 3)
        # R orthonormal
        R = np.asarray(out["R_ab"])
        np.testing.assert_allclose(
            R @ R.transpose(0, 2, 1), np.tile(np.eye(3), (4, 1, 1)), atol=1e-5
        )
        # inverse-transformed tgt set == src set
        back = np.einsum(
            "bij,bnj->bni", np.asarray(out["R_ba"]), np.asarray(out["tgt"])
        ) + np.asarray(out["t_ba"])[:, None, :]
        src = np.asarray(out["src"])
        for b in range(4):
            s1 = src[b][np.lexsort(src[b].T)]
            s2 = back[b][np.lexsort(back[b].T)]
            np.testing.assert_allclose(s1, s2, atol=1e-4)

    def test_partial_crop_shapes(self):
        cfg = Config(num_points=128, partial=True, overlap=0.575)
        clouds = jnp.asarray(
            np.random.RandomState(6).rand(2, 256, 3).astype(np.float32)
        )
        out = device_augment_batch(jax.random.PRNGKey(1), clouds, cfg)
        n_keep = int(128 * cfg.reserve)
        assert out["src"].shape == (2, n_keep, 3)
