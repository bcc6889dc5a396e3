"""Point-sharded FLAGSHIP model vs the single-device model, 8-device CPU
mesh: pointer equivalence, partial-head equivalence, full forward
equivalence (whole + partial), and gradients through shard_map.

Runtime budget: every forward/grad here is wrapped in jax.jit. Evaluating
jax.grad (or a big model.apply) EAGERLY on the multi-device CPU backend
dispatches thousands of tiny ops and takes MINUTES per test (this file was
~15 min before jitting); the jitted versions trace+compile in ~10 s each,
so full-mesh (8-device, 2x4) coverage stays in the routine suite.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet
from vcrnet_tpu.models import heads
from vcrnet_tpu.parallel import make_mesh
from vcrnet_tpu.parallel.mesh import make_mesh_2d
from vcrnet_tpu.parallel.point_sharding import shard_points
from vcrnet_tpu.parallel.sp_flagship import (
    pointer_sp,
    register_flagship_sp,
    sp_train_loss,
)

B, N, E = 2, 128, 64


@pytest.fixture(scope="module")
def setup():
    cfg = Config(num_points=N, emb_dims=E, ff_dims=128)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(B, N, 3).astype(np.float32) - 0.5
    tgt = rng.rand(B, N, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    mesh = make_mesh()
    return cfg, model, variables, src, tgt, mesh


def test_pointer_sp_matches_single_device(setup):
    cfg, model, variables, src, tgt, mesh = setup
    rng = np.random.RandomState(1)
    se = rng.randn(B, N, E).astype(np.float32)
    te = rng.randn(B, N, E).astype(np.float32)

    sd_ref, td_ref = jax.jit(
        lambda a, b: model.apply(
            variables, a, b, method=lambda m, a, b: m.pointer(a, b)
        )
    )(jnp.asarray(se), jnp.asarray(te))
    sd, td = jax.jit(
        lambda a, b: pointer_sp(
            variables["params"]["pointer"], a, b, mesh,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
        )
    )(shard_points(jnp.asarray(se), mesh), shard_points(jnp.asarray(te), mesh))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(td), np.asarray(td_ref), atol=2e-4)


def test_pointer_sp_partial_remask_matches(setup):
    _, _, _, src, tgt, mesh = setup
    cfg = Config(
        num_points=N, emb_dims=E, ff_dims=128, partial=True, overlap=0.575
    )
    model = VCRNet(cfg=cfg)
    n = cfg.n_cropped - (cfg.n_cropped % mesh.devices.size)
    rng = np.random.RandomState(2)
    s = rng.rand(B, n, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), s[:1], s[:1])
    se = rng.randn(B, n, E).astype(np.float32)
    te = rng.randn(B, n, E).astype(np.float32)

    sd_ref, td_ref = jax.jit(
        lambda a, b: model.apply(
            variables, a, b, method=lambda m, a, b: m.pointer(a, b)
        )
    )(jnp.asarray(se), jnp.asarray(te))
    sd, td = jax.jit(
        lambda a, b: pointer_sp(
            variables["params"]["pointer"], a, b, mesh,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
            partial_mode=True, overlap2=cfg.overlap2,
        )
    )(shard_points(jnp.asarray(se), mesh), shard_points(jnp.asarray(te), mesh))
    np.testing.assert_allclose(np.asarray(sd), np.asarray(sd_ref), atol=2e-4)
    np.testing.assert_allclose(np.asarray(td), np.asarray(td_ref), atol=2e-4)


def test_flagship_sp_whole_matches_model(setup):
    cfg, model, variables, src, tgt, mesh = setup
    out_ref = jax.jit(
        lambda a, b: model.apply(variables, a, b)
    )(jnp.asarray(src), jnp.asarray(tgt))
    src_k, corr, R, t = jax.jit(
        lambda a, b: register_flagship_sp(
            variables["params"], a, b, mesh,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
        )
    )(shard_points(jnp.asarray(src), mesh), shard_points(jnp.asarray(tgt), mesh))
    np.testing.assert_allclose(
        np.asarray(R), np.asarray(out_ref[2]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(t), np.asarray(out_ref[3]), atol=1e-3
    )
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(out_ref[1]), atol=1e-3
    )


def test_flagship_sp_partial_matches_model():
    mesh = make_mesh()
    cfg = Config(
        num_points=N, emb_dims=E, ff_dims=128, partial=True, overlap=0.575
    )
    n = cfg.n_cropped - (cfg.n_cropped % mesh.devices.size)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(3)
    src = rng.rand(B, n, 3).astype(np.float32) - 0.5
    tgt = rng.rand(B, n, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    out_ref = jax.jit(
        lambda a, b: model.apply(variables, a, b)
    )(jnp.asarray(src), jnp.asarray(tgt))
    src_k, corr, R, t = jax.jit(
        lambda a, b: register_flagship_sp(
            variables["params"], a, b, mesh,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
            partial_mode=True, overlap2=cfg.overlap2,
        )
    )(shard_points(jnp.asarray(src), mesh), shard_points(jnp.asarray(tgt), mesh))
    np.testing.assert_allclose(
        np.asarray(src_k), np.asarray(out_ref[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(out_ref[1]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(R), np.asarray(out_ref[2]), atol=1e-3
    )


def test_flagship_dp_sp_2d_mesh_partial_matches_model():
    """Regression: partial-mode VCP on a 2-D dp x sp mesh must use the
    POINT-axis shard count, not the total device count — with the total
    (8) instead of the 'data' size (4), stage-2 rescoring covered only
    half the K1 candidate rows and R was off by ~0.2."""
    mesh2 = make_mesh_2d(2)  # 2 (batch) x 4 (points)
    cfg = Config(
        num_points=N, emb_dims=E, ff_dims=128, partial=True, overlap=0.575
    )
    n = cfg.n_cropped - (cfg.n_cropped % mesh2.shape["data"])
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(4)
    src = rng.rand(B, n, 3).astype(np.float32) - 0.5
    tgt = rng.rand(B, n, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])

    out_ref = jax.jit(
        lambda a, b: model.apply(variables, a, b)
    )(jnp.asarray(src), jnp.asarray(tgt))
    sp = lambda a: shard_points(jnp.asarray(a), mesh2, batch_axis="batch")
    src_k, corr, R, t = jax.jit(
        lambda a, b: register_flagship_sp(
            variables["params"], a, b, mesh2,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
            partial_mode=True, overlap2=cfg.overlap2, batch_axis="batch",
        )
    )(sp(src), sp(tgt))
    np.testing.assert_allclose(
        np.asarray(src_k), np.asarray(out_ref[0]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(out_ref[1]), atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(R), np.asarray(out_ref[2]), atol=1e-3
    )


def _grad_pair(model, variables, src, tgt, mesh, cfg, batch_axis=None):
    """Jitted (reference, shard_map) gradients of the same point loss."""
    R_gt = np.tile(np.eye(3, dtype=np.float32), (B, 1, 1))
    t_gt = np.zeros((B, 3), np.float32)
    kw = {"batch_axis": batch_axis} if batch_axis else {}

    def loss_ref(params):
        out = model.apply(
            {"params": params}, jnp.asarray(src), jnp.asarray(tgt)
        )
        moved = (
            jnp.einsum("bij,bnj->bni", jnp.asarray(R_gt), out[0])
            + jnp.asarray(t_gt)[:, None, :]
        )
        return jnp.mean((moved - out[1]) ** 2)

    def loss_sp(params):
        return sp_train_loss(
            params,
            shard_points(jnp.asarray(src), mesh, **kw),
            shard_points(jnp.asarray(tgt), mesh, **kw),
            jnp.asarray(R_gt), jnp.asarray(t_gt), mesh,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks, **kw,
        )

    g_ref = jax.jit(jax.grad(loss_ref))(variables["params"])
    g_sp = jax.jit(jax.grad(loss_sp))(variables["params"])
    return g_ref, g_sp


def _assert_grads_match(g_ref, g_sp, atol=5e-4):
    sp_flat = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(g_sp)
    }
    checked = 0
    for key, ref in jax.tree_util.tree_leaves_with_path(g_ref):
        ks = jax.tree_util.keystr(key)
        np.testing.assert_allclose(
            np.asarray(sp_flat[ks]), np.asarray(ref), atol=atol,
            err_msg=f"grad mismatch at {ks}",
        )
        checked += 1
    assert checked > 20  # embedding + pointer params all covered
    total = sum(
        float(np.abs(np.asarray(v)).sum())
        for v in jax.tree_util.tree_leaves(g_sp)
    )
    assert total > 0  # non-trivial gradients


def test_sp_gradients_match_single_device(setup):
    cfg, model, variables, src, tgt, mesh = setup
    g_ref, g_sp = _grad_pair(model, variables, src, tgt, mesh, cfg)
    _assert_grads_match(g_ref, g_sp)


def test_flagship_dp_sp_2d_mesh_matches_model(setup):
    """Composed data x point parallelism: batch sharded 2-way over 'batch',
    points 4-way over 'data' (mesh.make_mesh_2d) — forward must match the
    single-device model."""
    cfg, model, variables, src, tgt, _ = setup
    mesh2 = make_mesh_2d(2)  # 8 devices -> 2 (batch) x 4 (points)
    assert mesh2.devices.shape == (2, 4)

    sp = lambda a: shard_points(jnp.asarray(a), mesh2, batch_axis="batch")
    out_ref = jax.jit(
        lambda a, b: model.apply(variables, a, b)
    )(jnp.asarray(src), jnp.asarray(tgt))
    src_k, corr, R, t = jax.jit(
        lambda a, b: register_flagship_sp(
            variables["params"], a, b, mesh2,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks, batch_axis="batch",
        )
    )(sp(src), sp(tgt))
    np.testing.assert_allclose(np.asarray(R), np.asarray(out_ref[2]), atol=1e-3)
    np.testing.assert_allclose(np.asarray(t), np.asarray(out_ref[3]), atol=1e-3)
    np.testing.assert_allclose(
        np.asarray(corr), np.asarray(out_ref[1]), atol=1e-3
    )


def test_flagship_dp_sp_2d_mesh_grads(setup):
    """Gradients through the composed full 2x4 dp x sp mesh match the
    single-device model."""
    cfg, model, variables, src, tgt, _ = setup
    mesh2 = make_mesh_2d(2, 4)
    g_ref, g_sp = _grad_pair(
        model, variables, src, tgt, mesh2, cfg, batch_axis="batch"
    )
    _assert_grads_match(g_ref, g_sp)


def test_sp_gradients_partial_mode_finite():
    mesh = make_mesh()
    cfg = Config(
        num_points=N, emb_dims=E, ff_dims=128, partial=True, overlap=0.575
    )
    n = cfg.n_cropped - (cfg.n_cropped % mesh.devices.size)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(5)
    src = rng.rand(B, n, 3).astype(np.float32) - 0.5
    tgt = rng.rand(B, n, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    R_gt = jnp.asarray(np.tile(np.eye(3, dtype=np.float32), (B, 1, 1)))
    t_gt = jnp.zeros((B, 3), jnp.float32)

    def loss_sp(params):
        return sp_train_loss(
            params,
            shard_points(jnp.asarray(src), mesh),
            shard_points(jnp.asarray(tgt), mesh),
            R_gt, t_gt, mesh,
            n_heads=cfg.n_heads, n_blocks=cfg.n_blocks,
            partial_mode=True, overlap2=cfg.overlap2,
        )

    g = jax.jit(jax.grad(loss_sp))(variables["params"])
    for leaf in jax.tree_util.tree_leaves(g):
        assert np.all(np.isfinite(np.asarray(leaf)))
