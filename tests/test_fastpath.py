"""Accuracy tests of the TPU fast path (bfloat16 matmuls + approx kNN):
the speed knobs must not meaningfully change model outputs."""

import numpy as np

import jax
import jax.numpy as jnp

from vcrnet_tpu import ops
from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet
from vcrnet_tpu.train.checkpoint import load_t7_lpdnet

import pytest

T7_PATH = "/root/reference/pretrained/lpd-pretrained.t7"
T7_SKIP = pytest.mark.skipif(
    not __import__("os").path.exists(T7_PATH),
    reason="reference pretrained .t7 not present",
)



def test_approx_knn_recall():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.rand(4, 1024, 3).astype(np.float32))
    exact = np.asarray(ops.knn(x, 20))
    approx = np.asarray(ops.knn(x, 20, approx=True, recall_target=0.95))
    # recall of approx vs exact neighbor sets
    recall = np.mean(
        [
            len(set(exact[b, n]) & set(approx[b, n])) / 20.0
            for b in range(4)
            for n in range(0, 1024, 37)
        ]
    )
    assert recall > 0.9, recall


@T7_SKIP
def test_fast_mode_rotation_close_to_exact():
    """Full VCRNet forward with pretrained LPDNet embedding: the fast path's
    recovered rotation must be within a fraction of a degree of the exact
    path on a realistic registration pair."""
    from scipy.spatial.transform import Rotation

    rng = np.random.RandomState(1)
    B, N = 2, 256
    src = rng.rand(B, N, 3).astype(np.float32) - 0.5
    angles = rng.uniform(0, np.pi / 8, (B, 3))
    R = Rotation.from_euler("zyx", angles).as_matrix().astype(np.float32)
    t = rng.uniform(-0.2, 0.2, (B, 3)).astype(np.float32)
    tgt = np.einsum("bij,bnj->bni", R, src) + t[:, None, :]

    outs = {}
    for mode, cfg in {
        "exact": Config(num_points=N, emb_dims=512),
        "fast": Config(
            num_points=N, emb_dims=512,
            compute_dtype="bfloat16", approx_knn=True,
        ),
    }.items():
        model = VCRNet(cfg=cfg)
        variables = model.init(
            jax.random.PRNGKey(0), jnp.asarray(src[:1]), jnp.asarray(tgt[:1])
        )
        params = dict(variables["params"])
        emb = dict(params["emb_nn"])
        emb.update(load_t7_lpdnet(T7_PATH))
        params["emb_nn"] = emb
        out = model.apply({"params": params}, jnp.asarray(src), jnp.asarray(tgt))
        outs[mode] = np.asarray(out[2])  # R_ab

    # relative rotation angle between the two modes' predictions
    rel = np.einsum("bij,bkj->bik", outs["exact"], outs["fast"])
    trace = np.trace(rel, axis1=1, axis2=2)
    ang = np.degrees(np.arccos(np.clip((trace - 1) / 2, -1, 1)))
    assert np.all(ang < 1.0), ang  # < 1 degree apart
