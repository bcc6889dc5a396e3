"""Model-level tests: shapes, known-transform recovery, gradient flow."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

import jax
import jax.numpy as jnp

from vcrnet_tpu import geometry
from vcrnet_tpu.config import Config
from vcrnet_tpu.models import (
    VCRNet,
    DCP,
    LPD,
    icp_register,
    vcrnet_iter,
)
from vcrnet_tpu.models import heads
from vcrnet_tpu.models.vcrnet import vcrnet_icp


def make_pair(rng, batch=2, n=64, angle_deg=30.0, t_scale=0.3):
    src = rng.randn(batch, n, 3).astype(np.float32)
    angles = rng.uniform(0, np.radians(angle_deg), (batch, 3))
    R = Rotation.from_euler("zyx", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-t_scale, t_scale, (batch, 3)).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R, src) + t[:, None, :]
    return jnp.asarray(src), jnp.asarray(tgt), jnp.asarray(R), jnp.asarray(t)


class TestVcpHeads:
    def test_whole_recovers_transform_with_perfect_embeddings(self):
        # when the embedding IS the (aligned) geometry, the soft
        # correspondence must recover the exact transform via procrustes
        rng = np.random.RandomState(0)
        src, tgt, R_gt, t_gt = make_pair(rng, n=128)
        # perfect embeddings: use gt-aligned source coords as both embeddings
        src_emb = geometry.transform_points(src, R_gt, t_gt) * 10
        tgt_emb = tgt * 10
        s, corr = heads.vcp_top_k_whole(src_emb, tgt_emb, src, tgt)
        R, t = geometry.procrustes(s, corr)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-2)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-2)

    def test_partial_static_shapes(self):
        cfg = Config(partial=True, overlap=0.575, num_points=1024)
        rng = np.random.RandomState(1)
        n = cfg.n_cropped  # 768
        src, tgt, _, _ = make_pair(rng, batch=2, n=n)
        emb = rng.randn(2, n, 32).astype(np.float32)
        s, corr = heads.vcp_top_k_partial(
            jnp.asarray(emb), jnp.asarray(emb), src, tgt, cfg.overlap2
        )
        k1 = int(n * 0.84 * cfg.overlap2)
        k2 = int(k1 * 0.52 * cfg.overlap2)
        assert s.shape == (2, k2, 3)
        assert corr.shape == (2, k2, 3)

    def test_partial_recovers_transform_with_perfect_embeddings(self):
        cfg = Config(partial=True, overlap=0.575, num_points=256)
        rng = np.random.RandomState(2)
        n = cfg.n_cropped
        src, tgt, R_gt, t_gt = make_pair(rng, batch=2, n=n, angle_deg=20)
        src_emb = geometry.transform_points(src, R_gt, t_gt) * 10
        tgt_emb = tgt * 10
        s, corr = heads.vcp_top_k_partial(src_emb, tgt_emb, src, tgt, cfg.overlap2)
        R, t = geometry.procrustes(s, corr)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=5e-2)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=5e-2)

    def test_dist_head_shapes(self):
        rng = np.random.RandomState(3)
        src, tgt, _, _ = make_pair(rng)
        emb = jnp.asarray(rng.randn(2, 64, 16).astype(np.float32))
        s, corr = heads.vcp_by_dis(emb, emb, src, tgt)
        assert s.shape == src.shape and corr.shape == src.shape


class TestICP:
    def test_icp_recovers_small_transform(self):
        rng = np.random.RandomState(4)
        src, tgt, R_gt, t_gt = make_pair(rng, batch=2, n=256, angle_deg=10, t_scale=0.1)
        _, aligned, R, t, R_ba, t_ba = icp_register(src, tgt, max_iterations=50)
        np.testing.assert_allclose(np.asarray(R), np.asarray(R_gt), atol=1e-3)
        np.testing.assert_allclose(np.asarray(t), np.asarray(t_gt), atol=1e-3)
        # inverse consistency
        R_id, t_id = geometry.compose_transforms(R_ba, t_ba, R, t)
        np.testing.assert_allclose(
            np.asarray(R_id), np.tile(np.eye(3), (2, 1, 1)), atol=1e-4
        )

    def test_icp_jits(self):
        rng = np.random.RandomState(5)
        src, tgt, _, _ = make_pair(rng, batch=1, n=64, angle_deg=5)
        f = jax.jit(lambda s, d: icp_register(s, d, max_iterations=10))
        out = f(src, tgt)
        assert np.all(np.isfinite(np.asarray(out[2])))

    def test_icp_with_iters_reports_executed_count(self):
        rng = np.random.RandomState(6)
        # hard pair: real misalignment runs several iterations...
        src, tgt, _, _ = make_pair(rng, batch=2, n=256, angle_deg=40,
                                   t_scale=0.3)
        out = icp_register(src, tgt, max_iterations=50, with_iters=True)
        assert len(out) == 7
        hard_iters = int(np.asarray(out[-1]))
        assert 1 < hard_iters <= 50
        # ...an already-aligned pair breaks out almost immediately (the
        # batch-mean tolerance predicate, reference icp_model.py:37-39)
        out2 = icp_register(src, src, max_iterations=50, with_iters=True)
        assert int(np.asarray(out2[-1])) <= 2
        # and the 6-tuple default signature is unchanged
        assert len(icp_register(src, tgt, max_iterations=5)) == 6


@pytest.fixture(scope="module")
def small_cfg():
    return Config(num_points=64, emb_dims=64, ff_dims=128, n_heads=4)


class TestVCRNet:
    def test_merged_qkv_knob_matches_default(self, small_cfg, monkeypatch):
        # VCRNET_MERGED_QKV=1 runs q/k/v as one concatenated matmul —
        # column-separable, so outputs must match the per-projection
        # default to float tolerance (the knob is OFF by default after
        # the v5e A/B measured it slower; this guards its correctness
        # so the A/B path stays usable).
        rng = np.random.RandomState(11)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=small_cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        monkeypatch.delenv("VCRNET_MERGED_QKV", raising=False)
        base = model.apply(variables, src, tgt)
        monkeypatch.setenv("VCRNET_MERGED_QKV", "1")
        merged = jax.jit(model.apply)(variables, src, tgt)
        for a, b in zip(base, merged):
            # f32 summation order differs inside the merged matmul, so
            # allow a scaled tolerance rather than bitwise equality.
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4
            )

    def test_forward_shapes_whole(self, small_cfg):
        rng = np.random.RandomState(6)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=small_cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        src_k, corr, R, t, R_ba, t_ba = model.apply(variables, src, tgt)
        assert src_k.shape == (2, 64, 3)
        assert corr.shape == (2, 64, 3)
        assert R.shape == (2, 3, 3) and t.shape == (2, 3)
        # R must be a proper rotation
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)

    def test_forward_shapes_partial(self):
        cfg = Config(
            num_points=128, emb_dims=64, ff_dims=128, partial=True, overlap=0.575
        )
        rng = np.random.RandomState(7)
        n = cfg.n_cropped
        src, tgt, _, _ = make_pair(rng, batch=2, n=n)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        src_k, corr, R, t, _, _ = model.apply(variables, src, tgt)
        k1 = int(n * 0.84 * cfg.overlap2)
        k2 = int(k1 * 0.52 * cfg.overlap2)
        assert src_k.shape == (2, k2, 3)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)

    @pytest.mark.parametrize("emb_nn", ["pointnet", "dgcnn"])
    def test_other_embeddings(self, emb_nn):
        cfg = Config(num_points=64, emb_dims=64, ff_dims=128, emb_nn=emb_nn)
        rng = np.random.RandomState(8)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out = model.apply(variables, src, tgt)
        assert np.all(np.isfinite(np.asarray(out[2])))

    @pytest.mark.parametrize("vcp_nn", ["att", "dist"])
    def test_other_heads(self, vcp_nn):
        cfg = Config(num_points=64, emb_dims=64, ff_dims=128, vcp_nn=vcp_nn)
        rng = np.random.RandomState(9)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out = model.apply(variables, src, tgt)
        assert np.all(np.isfinite(np.asarray(out[2])))

    def test_identity_pointer_and_t3d(self):
        cfg = Config(
            num_points=64, emb_dims=64, ff_dims=128, pointer="identity",
            t3d=True, tfea=True,
        )
        rng = np.random.RandomState(10)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out = model.apply(variables, src, tgt)
        assert np.all(np.isfinite(np.asarray(out[2])))

    def test_grads_flow_point_loss(self, small_cfg):
        rng = np.random.RandomState(11)
        src, tgt, R_gt, t_gt = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=small_cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)

        def loss_fn(params):
            src_k, corr, *_ = model.apply({"params": params}, src, tgt)
            moved = geometry.transform_points(src_k, R_gt, t_gt)
            return jnp.mean((moved - corr) ** 2)

        g = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
        # embedding grads must be nonzero
        total = sum(float(jnp.sum(jnp.abs(l))) for l in leaves)
        assert total > 0

    def test_vcrnet_iter_composes(self, small_cfg):
        rng = np.random.RandomState(12)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=small_cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out = vcrnet_iter(model.apply, variables, src, tgt, n_iter=3)
        R, t = out[2], out[3]
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)

    def test_vcrnet_icp_refinement(self, small_cfg):
        rng = np.random.RandomState(13)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64, angle_deg=5)
        model = VCRNet(cfg=small_cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out = vcrnet_icp(model.apply, variables, src, tgt, max_iterations=10)
        np.testing.assert_allclose(np.linalg.det(np.asarray(out[2])), 1.0, atol=1e-4)


class TestDropout:
    """--dropout is functional here (an upgrade: the reference accepts the
    flag but nulls every dropout module — transformer.py:198, 235,
    147-153). Train-mode stochastic, eval deterministic, dropout=0 exact."""

    def _setup(self, dropout):
        cfg = Config(
            num_points=64, emb_dims=64, ff_dims=128, dropout=dropout
        )
        rng = np.random.RandomState(42)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        return model, variables, src, tgt

    def test_train_mode_is_stochastic(self):
        model, variables, src, tgt = self._setup(0.5)
        out1 = model.apply(
            variables, src, tgt, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(1)},
        )[0]
        out2 = model.apply(
            variables, src, tgt, True, mutable=["batch_stats"],
            rngs={"dropout": jax.random.PRNGKey(2)},
        )[0]
        assert not np.allclose(np.asarray(out1[2]), np.asarray(out2[2]))

    def test_eval_mode_is_deterministic_and_rate_free(self):
        model, variables, src, tgt = self._setup(0.5)
        out1 = model.apply(variables, src, tgt)
        out2 = model.apply(variables, src, tgt)
        np.testing.assert_array_equal(np.asarray(out1[2]), np.asarray(out2[2]))
        # eval at dropout=0.5 == eval of the same weights at dropout=0
        model0, _, _, _ = self._setup(0.0)
        out0 = model0.apply(variables, src, tgt)
        np.testing.assert_allclose(
            np.asarray(out1[2]), np.asarray(out0[2]), atol=1e-6
        )

    def test_zero_rate_needs_no_rng_in_train(self):
        model, variables, src, tgt = self._setup(0.0)
        out = model.apply(
            variables, src, tgt, True, mutable=["batch_stats"]
        )[0]
        assert np.all(np.isfinite(np.asarray(out[2])))

    def test_train_step_runs_with_dropout(self):
        from vcrnet_tpu.train.engine import Trainer

        cfg = Config(
            num_points=64, emb_dims=64, ff_dims=128, dropout=0.3,
            batch_size=2,
        )
        rng = np.random.RandomState(13)
        src, tgt, R, t = make_pair(rng, batch=2, n=64)
        batch = {
            "src": np.asarray(src), "tgt": np.asarray(tgt),
            "R_ab": np.asarray(R), "t_ab": np.asarray(t),
            "R_ba": np.asarray(R).transpose(0, 2, 1),
            "t_ba": -np.einsum("bji,bj->bi", np.asarray(R), np.asarray(t)),
            "euler_ab": Rotation.from_matrix(np.asarray(R))
            .as_euler("zyx").astype(np.float32),
            "euler_ba": Rotation.from_matrix(
                np.asarray(R).transpose(0, 2, 1)
            ).as_euler("xyz").astype(np.float32),
            "label": np.zeros(2, np.int32),
            "valid": np.ones(2, np.float32),
        }
        trainer = Trainer(cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), batch)
        # the step donates its input state: snapshot params first
        before = jax.tree_util.tree_map(np.asarray, state.params)
        state2, sums = trainer._train_step(state, trainer._to_device(batch))
        assert np.isfinite(float(sums["loss"]))
        # params actually moved
        moved = jax.tree_util.tree_map(
            lambda a, b: np.any(a != np.asarray(b)), before, state2.params
        )
        assert any(jax.tree_util.tree_leaves(moved))


class TestDCP:
    def test_svd_head(self):
        cfg = Config(model="dcp", num_points=64, emb_dims=64, ff_dims=128)
        rng = np.random.RandomState(14)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = DCP(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        R, t, R_ba, t_ba, s, corr = model.apply(variables, src, tgt)
        assert R.shape == (2, 3, 3)
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)

    def test_mlp_head(self):
        cfg = Config(model="dcp", head="mlp", num_points=64, emb_dims=64, ff_dims=128)
        rng = np.random.RandomState(15)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = DCP(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out, _ = model.apply(
            variables, src, tgt, True, mutable=["batch_stats"]
        )
        R = out[0]
        # unit quaternion -> proper rotation
        np.testing.assert_allclose(np.linalg.det(np.asarray(R)), 1.0, atol=1e-4)


class TestLPD:
    def test_loss_finite_and_grads(self):
        cfg = Config(model="lpd", num_points=64, emb_dims=64)
        rng = np.random.RandomState(16)
        src = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        tgt = src + 0.01 * jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        model = LPD(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)

        def loss_fn(params):
            _, _, loss, _, _ = model.apply({"params": params}, src, tgt)
            return loss

        loss, g = jax.value_and_grad(loss_fn)(variables["params"])
        assert np.isfinite(float(loss))
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)


class TestIterCachedEmbedding:
    def test_cached_tgt_embedding_is_exact(self):
        """vcrnet_iter with the cached-target-embedding path must equal the
        naive re-embed-everything path (the target never changes)."""
        cfg = Config(num_points=64, emb_dims=64, ff_dims=128)
        rng = np.random.RandomState(42)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        naive = vcrnet_iter(model.apply, variables, src, tgt, n_iter=3)
        cached = vcrnet_iter(
            model.apply, variables, src, tgt, n_iter=3, model=model
        )
        for a, b in zip(naive, cached):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-5
            )

    def test_cached_iter_dgcnn_spatial_idx(self):
        """DGCNN's graph is built on the input xyz, so refinement
        iterations reuse iteration 1's spatial kNN exactly like LPDNet.
        The cached path must match the naive re-embed path (f32 on
        near-generic data: rigid transforms preserve distances, so the
        cached selection equals the recomputed one away from ties)."""
        cfg = Config(num_points=64, emb_dims=128, ff_dims=128,
                     emb_nn="dgcnn")
        rng = np.random.RandomState(43)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        naive = vcrnet_iter(model.apply, variables, src, tgt, n_iter=2)
        cached = vcrnet_iter(
            model.apply, variables, src, tgt, n_iter=2, model=model
        )
        for a, b in zip(naive, cached):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=2e-4
            )

    def test_reuse_feature_knn_mechanism(self):
        """Config.reuse_feature_knn threads iteration 1's feature-space
        kNN selection into iterations 2+. The reuse is an approximation
        when the cloud moves, so: (a) supplying the idx the model would
        compute anyway must be EXACT; (b) at n_iter=1 the flag is a no-op;
        (c) at n_iter=3 the output stays a valid rigid transform."""
        cfg = Config(
            num_points=64, emb_dims=64, ff_dims=128, reuse_feature_knn=True
        )
        rng = np.random.RandomState(7)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)

        # (a) embedding with its own sown feature_idx supplied == without
        from vcrnet_tpu.models.vcrnet import VCRNet as VCRNetCls, _find_sown

        emb, sown = model.apply(
            variables, src, method=VCRNetCls.embed, mutable=["intermediates"]
        )
        f_idx = _find_sown(sown.get("intermediates", {}), "feature_idx")
        assert f_idx is not None and f_idx.shape == (2, 64, 20)
        emb2 = model.apply(
            variables, src, method=VCRNetCls.embed, feature_idx=f_idx
        )
        np.testing.assert_allclose(
            np.asarray(emb), np.asarray(emb2), atol=1e-6
        )

        # (b) n_iter=1 never reuses: identical to the flag-off model
        model_off = VCRNet(cfg=cfg.replace(reuse_feature_knn=False))
        one_on = vcrnet_iter(
            model.apply, variables, src, tgt, n_iter=1, model=model
        )
        one_off = vcrnet_iter(
            model_off.apply, variables, src, tgt, n_iter=1, model=model_off
        )
        for a, b in zip(one_on, one_off):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)

        # (c) n_iter=3 with reuse still produces a proper rotation
        out = vcrnet_iter(
            model.apply, variables, src, tgt, n_iter=3, model=model
        )
        np.testing.assert_allclose(
            np.linalg.det(np.asarray(out[2])), 1.0, atol=1e-4
        )

        # (d) refresh >= n_iter means every iteration is fresh — EXACTLY
        # the flag-off path
        model_all_fresh = VCRNet(
            cfg=cfg.replace(feature_knn_refresh=3)
        )
        three_fresh = vcrnet_iter(
            model_all_fresh.apply, variables, src, tgt, n_iter=3,
            model=model_all_fresh,
        )
        model_off3 = VCRNet(cfg=cfg.replace(reuse_feature_knn=False))
        three_off = vcrnet_iter(
            model_off3.apply, variables, src, tgt, n_iter=3, model=model_off3
        )
        for a, b in zip(three_fresh, three_off):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=1e-6
            )

    def test_refine_subsample_matches_naive_mirror(self):
        """Config.refine_subsample=M runs iterations 2+ on the first M
        points. The cached implementation must equal a hand-rolled mirror
        built from naive full forwards on the (sub)clouds."""
        from vcrnet_tpu import geometry

        M = 32
        cfg = Config(
            num_points=64, emb_dims=64, ff_dims=128, refine_subsample=M
        )
        rng = np.random.RandomState(11)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)
        model = VCRNet(cfg=cfg)
        variables = model.init(jax.random.PRNGKey(0), src, tgt)
        out = vcrnet_iter(
            model.apply, variables, src, tgt, n_iter=3, model=model
        )

        transformed = jnp.asarray(src)
        R_f = t_f = None
        mirror = None
        for i in range(3):
            s = transformed[:, :M] if i >= 1 else transformed
            tt = jnp.asarray(tgt[:, :M] if i >= 1 else tgt)
            mirror = model.apply(variables, s, tt)
            _, _, R_i, t_i, _, _ = mirror
            transformed = geometry.transform_points(transformed, R_i, t_i)
            if R_f is None:
                R_f, t_f = R_i, t_i
            else:
                R_f, t_f = geometry.compose_transforms(R_i, t_i, R_f, t_f)
        np.testing.assert_allclose(
            np.asarray(out[2]), np.asarray(R_f), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(out[3]), np.asarray(t_f), atol=1e-5
        )
        assert out[0].shape == (2, M, 3)  # last iteration's (sub)points
        np.testing.assert_allclose(
            np.asarray(out[0]), np.asarray(mirror[0]), atol=1e-5
        )

    def test_refine_subsample_gates(self):
        """The knob is a no-op at n_iter=1, in partial mode, and at
        M >= num_points (clamped to the exact path)."""
        rng = np.random.RandomState(12)
        src, tgt, _, _ = make_pair(rng, batch=2, n=64)

        base = Config(num_points=64, emb_dims=64, ff_dims=128)
        m_off = VCRNet(cfg=base)
        variables = m_off.init(jax.random.PRNGKey(0), src, tgt)
        for sub_cfg, n_iter in (
            (base.replace(refine_subsample=32), 1),   # single iteration
            (base.replace(refine_subsample=64), 3),   # M == N: exact
            (base.replace(refine_subsample=999), 3),  # M > N: clamped
        ):
            m_sub = VCRNet(cfg=sub_cfg)
            a = vcrnet_iter(
                m_sub.apply, variables, src, tgt, n_iter=n_iter, model=m_sub
            )
            b = vcrnet_iter(
                m_off.apply, variables, src, tgt, n_iter=n_iter, model=m_off
            )
            for x, y in zip(a, b):
                np.testing.assert_allclose(
                    np.asarray(x), np.asarray(y), atol=1e-6
                )

        part = Config(
            num_points=64, emb_dims=64, ff_dims=128,
            partial=True, overlap=0.575,
        )
        srcp, tgtp = src[:, : part.n_cropped], tgt[:, : part.n_cropped]
        m_p_off = VCRNet(cfg=part)
        vp = m_p_off.init(jax.random.PRNGKey(0), srcp, tgtp)
        m_p_sub = VCRNet(cfg=part.replace(refine_subsample=24))
        a = vcrnet_iter(m_p_sub.apply, vp, srcp, tgtp, n_iter=3, model=m_p_sub)
        b = vcrnet_iter(m_p_off.apply, vp, srcp, tgtp, n_iter=3, model=m_p_off)
        for x, y in zip(a, b):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-6)
