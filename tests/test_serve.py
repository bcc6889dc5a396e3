"""Registrar serving surface: bucketed compiles, padding hygiene,
numpy I/O, agreement with the direct eval path."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet
from vcrnet_tpu.models.vcrnet import vcrnet_iter
from vcrnet_tpu.serve import Registrar

N = 64


@pytest.fixture(scope="module")
def served():
    cfg = Config(num_points=N, emb_dims=64, ff_dims=128, iter=2)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(1, N, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src, src)
    return cfg, variables, Registrar(cfg, variables, buckets=(2, 4))


def _pair(rng, b, n):
    src = rng.rand(b, n, 3).astype(np.float32) - 0.5
    ang = rng.uniform(0, np.pi / 8, (b, 3))
    R = Rotation.from_euler("zyx", ang).as_matrix().astype(np.float32)
    t = rng.uniform(-0.2, 0.2, (b, 3)).astype(np.float32)
    return src, np.einsum("bij,bnj->bni", R, src) + t[:, None, :]


def test_matches_direct_eval_path(served):
    cfg, variables, reg = served
    src, tgt = _pair(np.random.RandomState(1), 2, N)
    out = reg.register(src, tgt)
    direct = vcrnet_iter(
        reg.model.apply, variables, jnp.asarray(src), jnp.asarray(tgt),
        cfg.iter, model=reg.model,
    )
    np.testing.assert_allclose(out["R"], np.asarray(direct[2]), atol=1e-5)
    np.testing.assert_allclose(out["t"], np.asarray(direct[3]), atol=1e-5)
    np.testing.assert_allclose(
        out["R_inv"], np.asarray(direct[4]), atol=1e-5
    )


def test_padding_never_contaminates(served):
    # batch 3 pads to bucket 4: results must equal the unpadded per-pair
    # runs (registration has no cross-pair coupling)
    cfg, variables, reg = served
    src, tgt = _pair(np.random.RandomState(2), 3, N)
    batched = reg.register(src, tgt)
    assert batched["R"].shape == (3, 3, 3)
    for i in range(3):
        solo = reg.register(src[i], tgt[i])  # single-pair API, bucket 2
        np.testing.assert_allclose(batched["R"][i], solo["R"], atol=1e-5)
        np.testing.assert_allclose(batched["t"][i], solo["t"], atol=1e-5)


def test_buckets_compile_once_and_split_large_batches(served):
    cfg, variables, reg = served
    src, tgt = _pair(np.random.RandomState(3), 9, N)  # 9 > top bucket 4
    out = reg.register(src, tgt)
    assert out["R"].shape == (9, 3, 3)
    # chunks of 4, 4, 1 -> buckets {4, 2}; a second call adds no compiles
    assert reg.compiled_buckets == [2, 4]
    reg.register(src[:3], tgt[:3])
    assert reg.compiled_buckets == [2, 4]


def test_point_subsample_and_undersize_rejection(served):
    cfg, variables, reg = served
    src, tgt = _pair(np.random.RandomState(4), 1, N + 40)
    out = reg.register(src, tgt)  # subsampled to N deterministically
    out2 = reg.register(src, tgt)
    np.testing.assert_array_equal(out["R"], out2["R"])
    with pytest.raises(ValueError, match="needs >="):
        reg.register(src[:, : N - 8], tgt[:, : N - 8])


def test_warmup_compiles_all_buckets(served):
    cfg, variables, reg = served
    reg2 = Registrar(cfg, variables, buckets=(2, 4))
    reg2.warmup()
    assert reg2.compiled_buckets == [2, 4]
    with pytest.raises(ValueError, match="not one of"):
        reg2.warmup([3])


def test_mesh_serving_matches_single_device(served):
    # 8-device data mesh (conftest forces 8 virtual CPU devices): buckets
    # round up to mesh multiples, the batch shards over 'data', results
    # match the unsharded Registrar (per-pair math is unchanged).
    from vcrnet_tpu.parallel.mesh import make_mesh

    cfg, variables, reg = served
    mesh = make_mesh()
    mreg = Registrar(cfg, variables, buckets=(2, 4), mesh=mesh)
    assert mreg._buckets == (8,)  # 2, 4 -> 8 on an 8-device mesh
    src, tgt = _pair(np.random.RandomState(6), 5, N)  # ragged: pads to 8
    out = mreg.register(src, tgt)
    ref = reg.register(src, tgt)
    assert out["R"].shape == (5, 3, 3)
    np.testing.assert_allclose(out["R"], ref["R"], atol=1e-5)
    np.testing.assert_allclose(out["t"], ref["t"], atol=1e-5)
    np.testing.assert_allclose(out["R_inv"], ref["R_inv"], atol=1e-5)


def test_export_roundtrip(served, tmp_path):
    # export_bucket -> bytes on disk -> load_exported: self-contained
    # artifact (weights embedded) reproduces the live Registrar exactly
    from vcrnet_tpu.serve import load_exported

    cfg, variables, reg = served
    path = str(tmp_path / "bucket2.jaxexport")
    blob = reg.export_bucket(2, path=path)
    assert len(blob) > 1000
    exported = load_exported(path)
    assert exported.batch == 2 and exported.n_points == N
    src, tgt = _pair(np.random.RandomState(10), 2, N)
    out = exported.register(src, tgt)
    live = reg.register(src, tgt)
    np.testing.assert_allclose(out["R"], live["R"], atol=1e-6)
    np.testing.assert_allclose(out["t"], live["t"], atol=1e-6)
    with pytest.raises(ValueError, match="takes exactly"):
        exported.register(src[:1], tgt[:1])
    with pytest.raises(ValueError, match="not one of"):
        reg.export_bucket(3)

    # a bytes blob (not just a path) also loads
    out2 = load_exported(blob).register(src, tgt)
    np.testing.assert_array_equal(out2["R"], out["R"])


def test_export_from_mesh_registrar_is_portable(served):
    # export from a mesh-backed Registrar must NOT bake the 8-device
    # sharding into the artifact: the weights are pulled to host first,
    # so the blob lowers single-device and loads anywhere
    from vcrnet_tpu.parallel.mesh import make_mesh
    from vcrnet_tpu.serve import load_exported

    cfg, variables, reg = served
    mreg = Registrar(cfg, variables, buckets=(2,), mesh=make_mesh())
    blob = mreg.export_bucket(mreg._buckets[0])
    exported = load_exported(blob)
    src, tgt = _pair(np.random.RandomState(11), exported.batch, N)
    out = exported.register(src, tgt)
    live = mreg.register(src, tgt)
    np.testing.assert_allclose(out["R"], live["R"], atol=1e-5)


def test_partial_mode_serving():
    # the Registrar serves the partial protocol too: clouds are fitted to
    # cfg.n_cropped and the remasked pointer/partial VCP path runs
    cfg = Config(
        num_points=N, emb_dims=64, ff_dims=128, iter=2,
        partial=True, overlap=0.575,
    )
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(8)
    init = rng.rand(1, cfg.n_cropped, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), init, init)
    reg = Registrar(cfg, variables, buckets=(2,))
    assert reg.n_points == cfg.n_cropped < N
    src, tgt = _pair(np.random.RandomState(9), 2, N)  # oversized: subsampled
    out = reg.register(src, tgt)
    assert out["R"].shape == (2, 3, 3)
    np.testing.assert_allclose(
        np.einsum("bij,bkj->bik", out["R"], out["R"]),
        np.tile(np.eye(3), (2, 1, 1)), atol=1e-4,
    )


def test_single_pair_shapes(served):
    cfg, variables, reg = served
    src, tgt = _pair(np.random.RandomState(5), 1, N)
    out = reg.register(src[0], tgt[0])
    assert out["R"].shape == (3, 3) and out["t"].shape == (3,)
    # R @ R_inv ~= I (analytic inverse branch)
    np.testing.assert_allclose(
        out["R"] @ out["R_inv"], np.eye(3), atol=1e-5
    )
