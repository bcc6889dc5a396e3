"""Dynamically-quantized int8 linear for the pointer's projection matmuls.

The v5e MXU runs int8 at 2x the bf16 rate; at the pointer's protocol shape
([B*N, 512] x [512, 512], B=64 N=1024) the ISOLATED numbers are 0.199 ms
(bf16) vs 0.081 ms (int8 INCLUDING the dynamic per-row activation
quantization and the f32 dequant) — see benchmarks/int8_matmul_probe.py.
The FF pair (512->1024->512) measured NEUTRAL because the mid-layer
re-quantization of the [M, 1024] hidden eats the second matmul's savings.

IN CONTEXT this path measured SLOWER (pointer 12.63 vs 8.17 ms; see
docs/KERNELS.md "Dynamic-int8 pointer projections"): XLA fuses the bf16
projections with their producers/consumers and the quant/dequant HBM
passes break that. Default OFF (`Config.int8_eval`); kept as a tested
option for shapes where the matmuls dominate (large d_model).

Scheme: symmetric per-row activation scales (absmax/127) x symmetric
per-output-channel weight scales, int32 accumulation on the MXU, f32
dequant, bias add. Mean relative error vs the bf16 matmul is ~1% at
protocol shapes; the end-task accuracy gate lives in
benchmarks/parity_report.py (Δrot RMSE vs the exact path).

Eval-only by construction: callers gate on ``not train`` (rounding has a
zero gradient almost everywhere, so training keeps the bf16 path).

Reference parity note: the reference has no quantization; this is a pure
TPU-side throughput lever under the same ``--iter 3`` protocols
(reference model/vcrnet_model.py:21-43).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def quantize_rows(x: jax.Array):
    """Symmetric per-row int8 quantization over the last axis.

    Returns (q int8 [..., K], scale f32 [..., 1]) with q * scale ~= x.
    """
    s = jnp.max(jnp.abs(x), axis=-1, keepdims=True).astype(jnp.float32)
    s = jnp.maximum(s, 1e-30) / 127.0
    q = jnp.clip(
        jnp.round(x.astype(jnp.float32) / s), -127, 127
    ).astype(jnp.int8)
    return q, s


def int8_linear(x: jax.Array, kernel: jax.Array, bias: jax.Array) -> jax.Array:
    """``x @ kernel + bias`` with both operands quantized to int8.

    x: [..., K] float; kernel: [K, F]; bias: [F]. Activation scales are
    per row (dynamic), kernel scales per output channel. The kernel
    quantization is recomputed per call site — it is a [K, F] absmax
    reduce, ~microseconds against the matmul it halves. Output dtype
    matches x.
    """
    out_dtype = x.dtype
    xq, xs = quantize_rows(x)
    ks = jnp.max(jnp.abs(kernel), axis=0, keepdims=True).astype(jnp.float32)
    ks = jnp.maximum(ks, 1e-30) / 127.0  # [1, F]
    kq = jnp.clip(
        jnp.round(kernel.astype(jnp.float32) / ks), -127, 127
    ).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq,
        kq,
        (((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * xs * ks + bias.astype(jnp.float32)
    return y.astype(out_dtype)
