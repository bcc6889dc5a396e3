"""Geometry unit tests: euler conversions vs scipy, Procrustes recovery."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from vcrnet_tpu import geometry
from vcrnet_tpu.config import Config, solve_reserve


def random_rotations(n, rng, max_angle=np.pi):
    angles = rng.uniform(-max_angle, max_angle, size=(n, 3))
    return Rotation.from_euler("zyx", angles).as_matrix().astype(np.float32)


class TestEuler:
    def test_euler_to_mat_zyx_matches_scipy(self):
        rng = np.random.RandomState(0)
        angles = rng.uniform(-np.pi / 2, np.pi / 2, size=(32, 3))
        ours = np.asarray(geometry.euler_to_mat_zyx(jnp.asarray(angles)))
        ref = Rotation.from_euler("zyx", angles).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-6)

    def test_mat_to_euler_zyx_roundtrip_scipy(self):
        rng = np.random.RandomState(1)
        mats = random_rotations(64, rng, max_angle=np.pi / 3)
        ours = np.asarray(geometry.mat_to_euler_zyx(jnp.asarray(mats), degrees=True))
        ref = Rotation.from_matrix(mats).as_euler("zyx", degrees=True)
        np.testing.assert_allclose(ours, ref, atol=1e-4)

    def test_mat_to_euler_xyz_matches_scipy(self):
        rng = np.random.RandomState(2)
        mats = random_rotations(64, rng, max_angle=np.pi / 3)
        ours = np.asarray(geometry.mat_to_euler_xyz(jnp.asarray(mats), degrees=True))
        ref = Rotation.from_matrix(mats).as_euler("xyz", degrees=True)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestQuat:
    def test_quat2mat_matches_scipy(self):
        rng = np.random.RandomState(3)
        q = rng.randn(16, 4).astype(np.float32)
        q /= np.linalg.norm(q, axis=1, keepdims=True)
        ours = np.asarray(geometry.quat2mat(jnp.asarray(q)))
        # reference order is (x, y, z, w) == scipy's default order
        ref = Rotation.from_quat(q).as_matrix()
        np.testing.assert_allclose(ours, ref, atol=1e-5)


class TestTransforms:
    def test_transform_invert_compose(self):
        rng = np.random.RandomState(4)
        R = jnp.asarray(random_rotations(8, rng))
        t = jnp.asarray(rng.randn(8, 3).astype(np.float32))
        pts = jnp.asarray(rng.randn(8, 50, 3).astype(np.float32))

        moved = geometry.transform_points(pts, R, t)
        R_inv, t_inv = geometry.invert_transform(R, t)
        back = geometry.transform_points(moved, R_inv, t_inv)
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)

        R_id, t_id = geometry.compose_transforms(R_inv, t_inv, R, t)
        np.testing.assert_allclose(
            np.asarray(R_id), np.tile(np.eye(3), (8, 1, 1)), atol=1e-5
        )
        np.testing.assert_allclose(np.asarray(t_id), np.zeros((8, 3)), atol=1e-5)


class TestProcrustes:
    def test_exact_recovery(self):
        rng = np.random.RandomState(5)
        R_gt = jnp.asarray(random_rotations(16, rng))
        t_gt = jnp.asarray(rng.uniform(-0.5, 0.5, (16, 3)).astype(np.float32))
        src = jnp.asarray(rng.randn(16, 256, 3).astype(np.float32))
        corr = geometry.transform_points(src, R_gt, t_gt)

        R, t = geometry.procrustes(src, corr)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)

    def test_reflection_case_still_rotation(self):
        # construct a degenerate-ish correspondence that would produce a
        # reflection without the det fix
        rng = np.random.RandomState(6)
        src = rng.randn(4, 64, 3).astype(np.float32)
        corr = src.copy()
        corr[..., 2] *= -1.0  # mirrored correspondences
        R, t = geometry.procrustes(jnp.asarray(src), jnp.asarray(corr))
        dets = np.linalg.det(np.asarray(R))
        np.testing.assert_allclose(dets, np.ones(4), atol=1e-4)

    def test_weighted_masks_outliers(self):
        rng = np.random.RandomState(7)
        R_gt = jnp.asarray(random_rotations(4, rng))
        t_gt = jnp.asarray(rng.uniform(-0.5, 0.5, (4, 3)).astype(np.float32))
        src = rng.randn(4, 128, 3).astype(np.float32)
        corr = np.array(geometry.transform_points(jnp.asarray(src), R_gt, t_gt))
        # corrupt the last 32 correspondences, then mask them out
        corr[:, 96:, :] = rng.randn(4, 32, 3) * 10
        w = np.ones((4, 128), np.float32)
        w[:, 96:] = 0.0
        R, t = geometry.procrustes(jnp.asarray(src), jnp.asarray(corr), jnp.asarray(w))
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-4)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-4)

    def test_differentiable(self):
        rng = np.random.RandomState(8)
        src = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))
        corr = jnp.asarray(rng.randn(2, 32, 3).astype(np.float32))

        def loss(c):
            R, t = geometry.procrustes(src, c)
            return jnp.sum(R**2) + jnp.sum(t**2)

        g = jax.grad(loss)(corr)
        assert np.all(np.isfinite(np.asarray(g)))


class TestConfig:
    def test_reserve_published_value(self):
        # reference comment says "when overlap is 0.575, reserve is 0.75"
        # (util/initPara.py:110-114) — the actual sympy solve gives
        # 0.7506812782..., which is what the reference computes and uses.
        r = solve_reserve(0.575)
        assert abs(r - 0.75) < 1e-2
        assert abs(r - 0.7506812782552477) < 1e-9

    def test_reserve_matches_sympy_reference_semantics(self):
        import sympy as sp

        n = sp.Symbol("n")
        for overlap in [0.5, 0.575, 0.75, 0.9]:
            a = (n - sp.Rational(3, 2) * n**2) * (1 - 2 * n)
            b = (
                sp.Rational(1, 2) * (n - 1) ** 2 * n
                - sp.Rational(1, 6) * (1 - n) ** 3
                + sp.Rational(1, 6) * (1 - 2 * n) ** 3
            )
            f = ((a + b) * 2 + (1 - 2 * n) ** 3) / (1 - n) ** 2 - overlap
            roots = [
                complex(r) for r in sp.solve(f, n)
            ]
            (root,) = [
                r.real for r in roots if abs(r.imag) < 1e-9 and 0 <= r.real <= 0.5
            ]
            assert abs(solve_reserve(overlap) - (1 - root)) < 1e-9

    def test_overlap2(self):
        cfg = Config(partial=True, overlap=0.575)
        assert abs(cfg.reserve - 0.7506812782552477) < 1e-9
        assert abs(cfg.overlap2 - 0.575 / cfg.reserve) < 1e-9

    def test_whole_mode_no_crop(self):
        cfg = Config(partial=False, overlap=0.575)
        assert cfg.reserve == 1.0
        assert cfg.n_cropped == cfg.num_points

    def test_static_k_sizes(self):
        cfg = Config(partial=True, overlap=0.575, num_points=1024)
        # N after crop = int(1024 * 0.75) = 768
        assert cfg.n_cropped == 768
        # reference: srcK = int(768 * 0.84 * 0.76667) = 494
        assert cfg.select_k == int(768 * 0.84 * cfg.overlap2)
        assert cfg.pair_k == int(cfg.select_k * 0.52 * cfg.overlap2)
        assert cfg.attn_mask_k == int(768 * cfg.overlap2)
