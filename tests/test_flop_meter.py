"""Trace-time Pallas FLOP meter (ops/flop_meter.py) + bench MFU plumbing.

XLA cost analysis counts Pallas custom calls as zero flops; the meter is
what makes bench.py's MFU honest. These tests pin the per-kernel
formulas at known shapes (tracing only — no TPU needed).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vcrnet_tpu.ops import flop_meter
from vcrnet_tpu.ops.pallas_attention import flash_mha
from vcrnet_tpu.ops.pallas_knn import fused_knn


def test_meter_off_is_noop():
    # no active meter: add() must not raise or leak state
    flop_meter.add(123.0)
    with flop_meter.meter() as acc:
        flop_meter.add(2.0)
    assert acc[0] == 2.0
    flop_meter.add(5.0)  # after exit: no-op again
    assert acc[0] == 2.0


def test_meter_nesting_restores_outer():
    with flop_meter.meter() as outer:
        flop_meter.add(1.0)
        with flop_meter.meter() as inner:
            flop_meter.add(10.0)
        flop_meter.add(2.0)
    assert inner[0] == 10.0
    assert outer[0] == 3.0  # inner total does NOT propagate up


def test_flash_mha_fwd_and_bwd_counts():
    B, H, N, D = 2, 4, 256, 128
    q = jnp.ones((B, H, N, D), jnp.bfloat16)
    with flop_meter.meter() as acc:
        jax.make_jaxpr(lambda a: flash_mha(a, a, a, 0.1))(q)
    assert acc[0] == 2.0 * B * H * N * N * D * 2  # QK^T + PV

    def loss(a):
        return flash_mha(a, a, a, 0.1).astype(jnp.float32).sum()

    with flop_meter.meter() as acc:
        jax.make_jaxpr(jax.grad(loss))(q)
    # fwd (2 passes) + one-pass fused backward (5 score-shaped passes)
    assert acc[0] == 2.0 * B * H * N * N * D * (2 + 5)


def test_fused_knn_counts_distance_matrix():
    B, N, C = 2, 256, 64
    x = jnp.ones((B, N, C), jnp.bfloat16)
    with flop_meter.meter() as acc:
        jax.make_jaxpr(lambda a: fused_knn(a, 20))(x)
    assert acc[0] == 2.0 * B * N * N * C


def test_flops_of_step_counts_xla_side():
    # On CPU the model runs the XLA formulation (no Pallas), so the step
    # count must come from cost analysis and be clearly nonzero.
    import bench
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet

    cfg = Config(num_points=128, emb_dims=64, compute_dtype="float32")
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(2, 128, 3).astype(np.float32) - 0.5
    tgt = rng.rand(2, 128, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    f = bench._flops_of_step(lambda s: model.apply(variables, s, tgt), src)
    # kNN distance matrices alone are ~2*B*N^2*d > 10 MFLOP here
    assert f is not None and f > 1e7
