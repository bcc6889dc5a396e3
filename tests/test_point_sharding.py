"""Point-axis sharding tests: sharded primitives == single-device ops,
run on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from vcrnet_tpu import ops
from vcrnet_tpu.parallel import make_mesh
from vcrnet_tpu.parallel.point_sharding import (
    sharded_knn,
    sharded_gather_neighbors,
    sharded_soft_correspondence,
    shard_points,
)
from vcrnet_tpu.models.heads import vcp_top_k_whole


def setup_mesh_and_cloud(n=256, c=8, batch=2, seed=0):
    mesh = make_mesh(8)
    rng = np.random.RandomState(seed)
    x = jnp.asarray(rng.rand(batch, n, c).astype(np.float32))
    return mesh, shard_points(x, mesh), x


def test_sharded_knn_matches_single_device():
    mesh, x_sharded, x = setup_mesh_and_cloud()
    idx_s = np.asarray(sharded_knn(x_sharded, 8, mesh))
    idx_ref = np.asarray(ops.knn(x, 8, method="exact"))
    # compare as neighbor sets (tie order can differ)
    same = np.mean(
        [
            len(set(idx_s[b, n]) & set(idx_ref[b, n])) / 8.0
            for b in range(2)
            for n in range(0, 256, 17)
        ]
    )
    assert same == 1.0


def test_sharded_gather_matches():
    mesh, x_sharded, x = setup_mesh_and_cloud()
    rng = np.random.RandomState(1)
    idx = jnp.asarray(rng.randint(0, 256, (2, 256, 4)).astype(np.int32))
    idx_sharded = shard_points(idx, mesh)
    out_s = np.asarray(sharded_gather_neighbors(x_sharded, idx_sharded, mesh))
    out_ref = np.asarray(ops.gather_neighbors(x, idx))
    np.testing.assert_allclose(out_s, out_ref, atol=1e-6)


def test_sharded_correspondence_matches():
    mesh = make_mesh(8)
    rng = np.random.RandomState(2)
    se = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    te = jnp.asarray(rng.randn(2, 128, 16).astype(np.float32))
    src = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    tgt = jnp.asarray(rng.randn(2, 128, 3).astype(np.float32))
    _, ref = vcp_top_k_whole(se, te, src, tgt)
    out = sharded_soft_correspondence(
        shard_points(se, mesh), shard_points(te, mesh),
        shard_points(tgt, mesh), mesh,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_output_stays_sharded():
    mesh, x_sharded, x = setup_mesh_and_cloud()
    idx = sharded_knn(x_sharded, 4, mesh)
    assert len(idx.sharding.device_set) == 8


class TestPointShardedModel:
    """The FULL embedding / registration forward point-sharded (not just
    primitives): equality vs the single-device model on the 8-device mesh."""

    def _params(self, n=64, emb=64, seed=0):
        from vcrnet_tpu.config import Config
        from vcrnet_tpu.models import VCRNet

        cfg = Config(
            num_points=n, emb_dims=emb, ff_dims=2 * emb,
            pointer="identity",
        )
        model = VCRNet(cfg=cfg)
        rng = np.random.RandomState(seed)
        src = jnp.asarray(rng.rand(2, n, 3).astype(np.float32) - 0.5)
        tgt = jnp.asarray(rng.rand(2, n, 3).astype(np.float32) - 0.5)
        v = model.init(jax.random.PRNGKey(seed), src[:1], tgt[:1])
        return cfg, model, v, src, tgt

    def test_lpdnet_embed_sp_matches_flax(self):
        from vcrnet_tpu.models.embeddings import LPDNet
        from vcrnet_tpu.parallel.sp_model import lpdnet_embed_sp

        mesh = make_mesh(8)
        cfg, model, v, src, _ = self._params()
        lpd = LPDNet(emb_dims=cfg.emb_dims)
        ref = lpd.apply({"params": v["params"]["emb_nn"]}, src)

        out = lpdnet_embed_sp(
            v["params"]["emb_nn"], shard_points(src, mesh), mesh
        )
        assert len(out.sharding.device_set) == 8  # stays sharded
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )

    def test_register_whole_sp_matches_model(self):
        from vcrnet_tpu.parallel.sp_model import register_whole_sp

        mesh = make_mesh(8)
        cfg, model, v, src, tgt = self._params()
        # single-device reference: identity-pointer VCRNet forward
        _, corr_ref, R_ref, t_ref, _, _ = model.apply(v, src, tgt)

        corr, R, t = register_whole_sp(
            v["params"], shard_points(src, mesh), shard_points(tgt, mesh),
            mesh,
        )
        np.testing.assert_allclose(
            np.asarray(corr), np.asarray(corr_ref), atol=1e-5, rtol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(R), np.asarray(R_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(t), np.asarray(t_ref), atol=1e-5
        )

    def test_embed_sp_with_lpd_slope(self):
        """slope 0.2 (the LPD-pretrain wrapper's slope) also matches."""
        from vcrnet_tpu.models.embeddings import LPDNet
        from vcrnet_tpu.parallel.sp_model import lpdnet_embed_sp

        mesh = make_mesh(8)
        rng = np.random.RandomState(3)
        src = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32) - 0.5)
        lpd = LPDNet(emb_dims=32, negative_slope=0.2)
        v = lpd.init(jax.random.PRNGKey(1), src)
        ref = lpd.apply(v, src)
        out = lpdnet_embed_sp(
            v["params"], shard_points(src, mesh), mesh, negative_slope=0.2
        )
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(ref), atol=1e-5, rtol=1e-5
        )
