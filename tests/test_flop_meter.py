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


def test_time_chained_counts_xla_flops_per_step():
    # The bench derives per-step FLOPs from the SAME compiled chained
    # executables it times (cost analysis differenced across the two scan
    # lengths, VERDICT r3 #1c). On CPU the model runs the XLA formulation
    # (no Pallas), so the count must come from cost analysis and be
    # clearly nonzero — and per-STEP, not per-chain.
    import bench
    from vcrnet_tpu.config import Config
    from vcrnet_tpu.models import VCRNet

    cfg = Config(num_points=128, emb_dims=64, compute_dtype="float32")
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(2, 128, 3).astype(np.float32) - 0.5
    tgt = rng.rand(2, 128, 3).astype(np.float32) - 0.5
    variables = model.init(jax.random.PRNGKey(0), src[:1], tgt[:1])
    src_d, tgt_d = jax.device_put(src), jax.device_put(tgt)

    def make_chained(T):
        def chained(s0):
            def body(s, _):
                out = model.apply(variables, s, tgt_d)
                return s + 1e-9 * out[3][:, None, :], out[3].ravel()[0]

            s, _ = jax.lax.scan(body, s0, None, length=T)
            return s.ravel()[0]

        return chained

    dt, f1 = bench._time_chained(make_chained, src_d, 1, 3, reps=1)
    assert dt > 0
    # kNN distance matrices alone are ~2*B*N^2*d > 10 MFLOP here
    assert f1 is not None and f1 > 1e7
    # differencing makes the count per-step: doubling the chain lengths
    # must give (approximately) the same per-step figure
    _, f2 = bench._time_chained(make_chained, src_d, 2, 6, reps=1)
    assert f2 == pytest.approx(f1, rel=0.05)
