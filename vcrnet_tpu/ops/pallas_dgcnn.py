"""Fused DGCNN eval kernel: the whole 4-stage edge-conv chain + final
projection as ONE Pallas program per (batch, query-tile).

The XLA formulation of DGCNN (models/embeddings.py, reference
vcrnet_model.py:90-123) materialises every per-neighbor intermediate in
HBM — [B, N, k, 6] graph features, then [B, N, k, 64/64/128/256]
activations between the four conv+BN+relu stages — ~2.7 GB of HBM
round-trips per cloud at B=64, N=1024, k=20, while the useful matmul
FLOPs are ~1.5 ms of MXU time. Measured 13.9 ms per cloud (62% of the
DCP eval step). This kernel keeps the whole chain in VMEM:

  gather neighbors (one-hot matmul from the VMEM-resident cloud)
  -> h1 = relu(W1n·nbr + W1c·center + b1)     (the concat(neighbor,
     center) @ W1 split into two partial matmuls; the center part is
     computed once per query tile and broadcast over k)
  -> h2..h4 = relu(Wi·h + bi)                  per-neighbor pointwise
  -> x_i = max over k of h_i                   (static max trees)
  -> out = relu(W5·concat(x1..x4) + b5)

BatchNorm (eval mode, running stats) is an affine per channel and is
FOLDED into each stage's weights/bias on the host side
(``fold_dgcnn_eval_params``): W' = W·s, b' = beta − mean·s with
s = gamma/√(var+eps) — exactly `relu(bn_i(conv_i(x)))` at
use_running_average=True. EVAL ONLY (no VJP): DGCNN training keeps the
XLA formulation with live batch statistics.

Matmuls run bf16 with f32 accumulation, matching the XLA bf16 profile
(Dense(dtype=bf16) casts its input); bias + relu run f32; the output is
f32 like the slow path's BN output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcrnet_tpu.ops import flop_meter
from vcrnet_tpu.ops.pallas_edgeconv import (
    _kmajor_broadcast,
    _kmajor_onehot,
)

_LANES = 128


def fold_bn_dense(kernel, scale, bias, mean, var, eps: float = 1e-5):
    """relu-less fold of eval-mode BatchNorm into the preceding bias-free
    Dense: y = BN(x @ W) = x @ (W·s) + (beta − mean·s), s = gamma/√(var+eps).
    Returns (W' f32, b' f32) as jnp arrays. jnp throughout — under jit the
    variables are tracers, so the fold compiles into the program and
    re-runs each call; that is elementwise work over ~0.4 M params,
    negligible next to the kernel itself."""
    f32 = jnp.float32
    s = jnp.asarray(scale, f32) * jax.lax.rsqrt(jnp.asarray(var, f32) + eps)
    w = jnp.asarray(kernel, f32) * s[None, :]
    b = jnp.asarray(bias, f32) - jnp.asarray(mean, f32) * s
    return w, b


def fold_dgcnn_eval_params(params, batch_stats, eps: float = 1e-5):
    """DGCNN variables -> the kernel's folded weight list
    [(W1', b1'), ..., (W5', b5')] as jnp f32 arrays (a pure affine
    transform, re-executed per apply — negligible elementwise cost)."""
    out = []
    for i in range(1, 6):
        w, b = fold_bn_dense(
            params[f"conv{i}"]["kernel"],
            params[f"bn{i}"]["scale"],
            params[f"bn{i}"]["bias"],
            batch_stats[f"bn{i}"]["mean"],
            batch_stats[f"bn{i}"]["var"],
            eps,
        )
        out.append((w, b))
    return out


def fused_dgcnn_supported(n: int, k: int, emb_dims: int) -> bool:
    """VMEM gate: the [k·TQ, N] bf16 one-hot plus two live [k·TQ, 256]
    f32 stage activations must fit next to the resident cloud/weights."""
    if n % 8 or emb_dims % 128:
        return False
    tile_q = _pick_tile_dgcnn(n, k)
    onehot = k * tile_q * n * 2
    stages = k * tile_q * (256 + 128) * 4
    cloud = n * _LANES * 2
    w = (emb_dims * 512 + 512 * 256) * 2 * 2
    return onehot + stages + cloud + w <= 12 * 1024 * 1024


def _pick_tile_dgcnn(n: int, k: int) -> int:
    for t in (128, 64, 32, 16, 8):
        if n % t == 0 and k * t * n * 2 <= 6 * 1024 * 1024:
            return t
    return 8


def _dgcnn_kernel(
    xpad_ref, xt_ref, idx_ref,
    w1n_ref, w1c_ref, b1_ref, w2_ref, b2_ref, w3_ref, b3_ref,
    w4_ref, b4_ref, w5_ref, b5_ref,
    out_ref, *, k: int, tile_q: int,
):
    f32 = jnp.float32
    bf16 = jnp.bfloat16
    x_full = xpad_ref[0]          # [N, LANES] bf16 (xyz in lanes 0..2)
    xt = xt_ref[0]                # [TQ, LANES] bf16 centers
    idx = idx_ref[0]              # [TQ, k] int32
    n = x_full.shape[0]

    onehot = _kmajor_onehot(idx, n, k, tile_q, bf16)      # [k*TQ, N]
    nbr = jnp.dot(onehot, x_full, preferred_element_type=f32)  # [k*TQ, LANES]

    # stage 1: concat(neighbor, center) @ W1 == nbr@W1n + center@W1c
    c1 = jnp.dot(xt, w1c_ref[:], preferred_element_type=f32)   # [TQ, 64]
    h = jnp.dot(nbr.astype(bf16), w1n_ref[:], preferred_element_type=f32)
    h = h + _kmajor_broadcast(c1, k) + b1_ref[0]
    h = jnp.maximum(h, 0.0)

    def max_tree(v):
        m = v[0:tile_q]
        for j in range(1, k):
            m = jnp.maximum(m, v[j * tile_q:(j + 1) * tile_q])
        return m

    x1 = max_tree(h)
    h = jnp.maximum(
        jnp.dot(h.astype(bf16), w2_ref[:], preferred_element_type=f32)
        + b2_ref[0], 0.0,
    )
    x2 = max_tree(h)
    h = jnp.maximum(
        jnp.dot(h.astype(bf16), w3_ref[:], preferred_element_type=f32)
        + b3_ref[0], 0.0,
    )
    x3 = max_tree(h)
    h = jnp.maximum(
        jnp.dot(h.astype(bf16), w4_ref[:], preferred_element_type=f32)
        + b4_ref[0], 0.0,
    )
    x4 = max_tree(h)

    cat = jnp.concatenate([x1, x2, x3, x4], axis=1).astype(bf16)  # [TQ, 512]
    out = jnp.maximum(
        jnp.dot(cat, w5_ref[:], preferred_element_type=f32) + b5_ref[0],
        0.0,
    )
    out_ref[0] = out.astype(out_ref.dtype)


def fused_dgcnn_eval(
    x: jax.Array,
    idx: jax.Array,
    folded,
    emb_dims: int,
    interpret: bool = False,
) -> jax.Array:
    """x [B, N, 3] (any float dtype), idx [B, N, k] int32 neighbor
    selection, folded = fold_dgcnn_eval_params(...) -> [B, N, emb_dims]
    f32. Eval only — no VJP."""
    B, N, _ = x.shape
    k = idx.shape[-1]
    (w1, b1), (w2, b2), (w3, b3), (w4, b4), (w5, b5) = folded
    tile_q = _pick_tile_dgcnn(N, k)
    if N % tile_q:
        # gate with fused_dgcnn_supported; without this check a ragged N
        # would silently leave the last N % tile_q output rows unwritten
        raise ValueError(f"fused_dgcnn_eval: N={N} not tileable ({tile_q})")

    flop_meter.add(
        flop_meter.matmul(B * N * k, 6, 64)
        + flop_meter.matmul(B * N * k, 64, 64)
        + flop_meter.matmul(B * N * k, 64, 128)
        + flop_meter.matmul(B * N * k, 128, 256)
        + flop_meter.matmul(B * N, 512, emb_dims)
    )

    xpad = jnp.pad(
        x.astype(jnp.float32), ((0, 0), (0, 0), (0, _LANES - 3))
    ).astype(jnp.bfloat16)
    pad_w = lambda w: jnp.pad(
        jnp.asarray(w, jnp.float32), ((0, _LANES - w.shape[0]), (0, 0))
    ).astype(jnp.bfloat16)
    w1f = jnp.asarray(w1, jnp.float32)
    w1n = pad_w(w1f[:3])   # neighbor rows of W1
    w1c = pad_w(w1f[3:])   # center rows of W1
    as_bf = lambda w: jnp.asarray(w, jnp.float32).astype(jnp.bfloat16)
    row = lambda b: jnp.asarray(b, jnp.float32)[None, :]

    kernel = functools.partial(_dgcnn_kernel, k=k, tile_q=tile_q)
    full = lambda f: pl.BlockSpec(
        (1, N, f), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    tile = lambda f: pl.BlockSpec(
        (1, tile_q, f), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    wspec = lambda r, c: pl.BlockSpec(
        (r, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM
    )
    bspec = lambda c: pl.BlockSpec(
        (1, c), lambda b, i: (0, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            full(_LANES), tile(_LANES), tile(k),
            wspec(_LANES, 64), wspec(_LANES, 64), bspec(64),
            wspec(64, 64), bspec(64),
            wspec(64, 128), bspec(128),
            wspec(128, 256), bspec(256),
            wspec(512, emb_dims), bspec(emb_dims),
        ],
        out_specs=tile(emb_dims),
        out_shape=jax.ShapeDtypeStruct((B, N, emb_dims), jnp.float32),
        interpret=interpret,
    )(
        xpad, xpad, idx,
        w1n, w1c, row(b1),
        as_bf(w2), row(b2),
        as_bf(w3), row(b3),
        as_bf(w4), row(b4),
        as_bf(w5), row(b5),
    )
    return out
