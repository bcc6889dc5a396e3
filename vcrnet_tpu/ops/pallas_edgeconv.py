"""Fused kNN + edge-conv Pallas kernels with custom-VJP backward kernels.

Two ops that extend the fused-kNN loop (see pallas_knn.py) with in-VMEM
neighbor combination, so neither the [B, N, N] scores, the [B, N, k] index
tensor, nor any [B, N, k, F] gathered edge tensor ever reaches HBM:

  fused_edge_conv      — the LPDNet DG block (reference lpdnet_model.py:122-126):
                         z_ij = leaky(a[j] + h[i]); x1 = max_j z_ij;
                         x2 = max_j leaky(z_ij @ W2 + b2)
  fused_knn_gather_max — the LPDNet SN block reduction
                         (lpdnet_model.py:129-132, decomposed form):
                         out[i] = max_{j in knn(i)} values[j]

The per-iteration neighbor "gather" is a one-hot matmul against the
VMEM-resident value table — MXU work, no dynamic addressing.

Backward (custom_vjp, used by the TRAINING path): the forward additionally
emits its selection indices ([B, N, k] int32) AND the max-WINNER k-position
per output channel ([B, N, F] int8 — tracked for free inside the selection
loop); the backward kernel turns all k selections into ONE [k*TQ, N]
one-hot per query tile and runs the whole VJP as a handful of large MXU
matmuls (gather, z^T@dp, dp@w2^T, and the scatter onehot^T@dq) — no score
recompute, no serial argmax chain, no second-conv recompute, and no
[B, N, k, F] edge tensor in HBM in either direction. Because max routing
comes from the saved winners (not value-match claims), the backward math
is decoupled from the forward's gather dtype: int8 forward gathers get a
backward evaluated with exact values at the forward's winner selection.
kNN indices carry zero gradient, matching torch.topk (reference
util/util.py:143-160).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vcrnet_tpu.ops import flop_meter

# Deferred-gather variant of the fused forward kernels: run the k-step
# selection loop FIRST (VPU-only), then all gathers + the convDG2 conv as
# single large MXU matmuls (the structure of the from-idx/backward
# kernels) instead of interleaving an MXU gather into every serial
# selection step. TPU A/B (v5e, B=64 N=1024 k=20, docs/KERNELS.md):
#   edge_conv  int8 7.66 -> 5.98 ms   gather_max int8 7.72 -> 6.07 ms
#   edge_conv  bf16 8.37 -> 7.60 ms   gather_max bf16 9.14 -> 11.69 ms
# so the measured default is ON everywhere EXCEPT bf16 gather_max (the
# one case where the [k*TQ, N] one-hot matmul at 2-byte width loses to
# the interleaved per-step gathers). VCRNET_DEFERRED_GATHER=1/0 forces
# both kernels on/off for re-measurement; unset uses the per-kernel
# policy below.
_DEFERRED_ENV = os.environ.get("VCRNET_DEFERRED_GATHER", "").strip().lower()
DEFERRED_OVERRIDE: bool | None = (
    None if _DEFERRED_ENV == ""
    else _DEFERRED_ENV not in ("0", "false", "off", "no")
)

# A/B knob for the query-tile size of the fused forward kernels (the VMEM
# guards still shrink it where the one-hot would not fit). Larger tiles =
# fewer grid programs and wider gather/selection ops, at more VMEM per
# program. Default 256 after the round-5 same-session A/B at B=64 N=1024
# (vs 128): edge_conv int8 4.81 -> 4.03 ms, bf16 7.12 -> 5.20,
# gather_max int8 4.93 -> 4.47, bf16 7.89 -> 6.89, selection-only kNN
# 2.96 -> 2.66 — the [k*256, 1024] int8 one-hot (5 MB) fits the raised
# 6 MB budget below; larger N shapes still auto-shrink via the guard.
_TILE_ENV = os.environ.get("VCRNET_EDGECONV_TILE_Q", "").strip()
TILE_Q_DEFAULT: int = int(_TILE_ENV) if _TILE_ENV.isdigit() else 256


def _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q):
    q = x_q_ref[0]
    keys = x_k_ref[0]
    n = keys.shape[0]
    scores = 2.0 * jnp.dot(
        q, keys.T, preferred_element_type=jnp.float32
    ) - norms_ref[0, 0][None, :]
    row0 = pl.program_id(1) * tile_q
    row_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 0) + row0
    col_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 1)
    scores = jnp.where(col_ids == row_ids, jnp.float32(-jnp.inf), scores)
    return scores, col_ids


def _idx_mask(n: int) -> int:
    """Low-bit index field width for packed selection (>= 10 bits)."""
    return (1 << max(10, (n - 1).bit_length())) - 1


def _pack_scores(scores, col_ids, n: int):
    """Pack f32 scores + column index into ONE sortable int32 per entry:
    the f32 bits (monotone-mapped so integer compare == float compare) with
    the low index-field bits replaced by the REVERSED column index.

    One plain max-reduce then yields both the winning score and its column
    (ties break to the SMALLEST column — torch argmax semantics), replacing
    the argmax+compare chain: measured 14.2 -> 9.0 ms on the selection loop
    at B=128, N=1024, k=20. Cost: scores compare at ~13 mantissa bits
    (22 at N<=1024) instead of 23 — selection can differ from exact f32
    argsort only for scores within ~2^-13 relative, below the bf16 input
    noise that produced them."""
    mask = _idx_mask(n)
    bits = jax.lax.bitcast_convert_type(scores, jnp.int32)
    sortable = jnp.where(
        bits >= 0, bits, jnp.bitwise_xor(bits, jnp.int32(0x7FFFFFFF))
    )
    packed = jnp.bitwise_or(
        jnp.bitwise_and(sortable, jnp.int32(~mask)),
        jnp.int32(mask) - col_ids,
    )
    return packed, jnp.int32(mask)


def _packed_pop_max(packed, mask):
    """One selection step: returns (sel, col, packed') where sel is the
    unique one-hot row mask of the max entry, col its column index, and
    packed' has it masked out."""
    m = jnp.max(packed, axis=1)  # [TQ]
    col = mask - jnp.bitwise_and(m, mask)
    sel = packed == m[:, None]  # unique: packed values are distinct per row
    packed = jnp.where(sel, jnp.int32(-(2**31)), packed)
    return sel, col, packed


# Threshold-scan selection (default): because _pack_scores makes every
# packed value DISTINCT per row, popping in descending order means "already
# popped" == "packed >= previous max". Each step is then a READ-ONLY masked
# max against a per-row scalar threshold — the [TQ, N] score array is never
# written back, so the serial chain carries only a [TQ] vector instead of
# re-storing the whole tile every step. Selection SET and order are
# identical to _packed_pop_max (strictly-decreasing distinct values).
# VCRNET_THRESHOLD_SELECT=0 restores the masking loop for A/B.
# (Caveat shared with the masking loop: NaN scores pack to large values and
# get selected first — NaN inputs are undefined behavior in both variants.)
_THRESHOLD_SELECT: bool = (
    os.environ.get("VCRNET_THRESHOLD_SELECT", "1") != "0"
)


def _threshold_pop_max(packed, thr, mask):
    """One read-only selection step: max over entries strictly below thr.
    Returns (sel, col, m) where m is both the popped value and the next
    threshold. packed is NOT modified."""
    masked = jnp.where(packed < thr[:, None], packed, jnp.int32(-(2**31)))
    m = jnp.max(masked, axis=1)  # [TQ]
    col = mask - jnp.bitwise_and(m, mask)
    sel = packed == m[:, None]  # unique: packed values are distinct per row
    return sel, col, m


def _thr_init(tile_q):
    return jnp.full((tile_q,), jnp.int32(2**31 - 1))


def _quantize_channels_batched(values):
    """Per-item per-channel symmetric int8 quantization of a [B, N, F]
    value table -> (int8 table, [B, 1, F] f32 scale).

    The one-hot gather of an int8 table is EXACT in the quantized domain
    (each output row copies one table row), so the only error is the
    table's own rounding (<= scale/2 per entry, ~0.4% of channel max);
    the int8 x int8 -> int32 matmul runs the MXU at twice bf16 rate.

    Evaluated in XLA OUTSIDE the kernels, once per call: quantizing inside
    the kernel both repeated the identical [N, F] absmax/round pass every
    q-tile grid step AND is not bitwise-identical to the XLA computation
    (compiled division rounds differently in the last ULP) — forward and
    backward MUST consume this same table or the backward's value-match
    claims silently misroute gradients."""
    v32 = values.astype(jnp.float32)
    scale = jnp.max(jnp.abs(v32), axis=1, keepdims=True) / 127.0 + 1e-30
    v8 = jnp.round(v32 / scale).astype(jnp.int8)
    return v8, scale


def _table_and_scale(values, int8_gather: bool):
    """Wrapper-side table prep: (int8 table, scale) when gathering int8,
    else (the table as-is, a zero placeholder scale)."""
    B, _, F = values.shape
    if int8_gather:
        return _quantize_channels_batched(values)
    return values, jnp.zeros((B, 1, F), jnp.float32)


def _gather_rows(sel, table, scale, int8_gather: bool):
    """One-hot gather of the max-selected rows: [TQ, N] sel x [N, F].
    ``table`` is the pre-quantized int8 table when int8_gather (scale [F]
    dequantizes), else the raw bf16/f32 values."""
    if int8_gather:
        g8 = jnp.dot(sel.astype(jnp.int8), table,
                     preferred_element_type=jnp.int32)
        return g8.astype(jnp.float32) * scale
    return jnp.dot(sel.astype(table.dtype), table,
                   preferred_element_type=jnp.float32)


def _edge_conv_kernel(
    x_q_ref, x_k_ref, norms_ref, a_ref, scale_ref, h_ref, w2_ref, b2_ref,
    x1_ref, x2_ref, idx_ref, *win_refs, k: int, tile_q: int, slope: float,
    packed_select: bool, int8_gather: bool, emit_winners: bool = False,
):
    scores, col_ids = _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q)
    a_full = a_ref[0]  # [N, F] (pre-quantized int8 when int8_gather)
    a_scale = scale_ref[0][0]  # [F]
    h = h_ref[0]  # [TQ, F]
    w2 = w2_ref[:]  # [F, F]
    b2 = b2_ref[0]  # [F]

    n = a_full.shape[0]
    f = a_full.shape[-1]
    neg_inf = jnp.float32(-jnp.inf)
    h32 = h.astype(jnp.float32)
    b32 = b2.astype(jnp.float32)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)
    if packed_select:
        scores, mask = _pack_scores(scores, col_ids, n)

    def leaky(v):
        return jnp.where(v >= 0, v, v * slope)

    # fori_loop, not a python unroll: keeps the Mosaic program (and its
    # compile time) independent of k. ``st`` is the selection state: the
    # [TQ] threshold (read-only scores) or the masked score tile itself.
    def body(j, carry):
        st, x1, x2, idx, w1, w2_win = carry
        if packed_select and _THRESHOLD_SELECT:
            sel, amax, st = _threshold_pop_max(scores, st, mask)
        elif packed_select:
            sel, amax, st = _packed_pop_max(st, mask)
        else:
            amax = jnp.argmax(st, axis=1).astype(jnp.int32)  # [TQ]
            sel = col_ids == amax[:, None]
            st = jnp.where(sel, neg_inf, st)
        g = _gather_rows(sel, a_full, a_scale, int8_gather)
        z = leaky(g + h32)
        y = leaky(
            jnp.dot(
                z.astype(w2.dtype), w2, preferred_element_type=jnp.float32
            )
            + b32
        )
        if emit_winners:
            # strict > keeps the FIRST j achieving the final max (torch
            # argmax semantics), in the exact f32 domain
            b1 = z > x1
            b2w = y > x2
            x1 = jnp.where(b1, z, x1)
            x2 = jnp.where(b2w, y, x2)
            w1 = jnp.where(b1, j, w1)
            w2_win = jnp.where(b2w, j, w2_win)
        else:
            x1 = jnp.maximum(x1, z)
            x2 = jnp.maximum(x2, y)
        # record the selection (consumed by the backward)
        idx = jnp.where(k_ids == j, amax[:, None], idx)
        return st, x1, x2, idx, w1, w2_win

    init = (
        _thr_init(tile_q) if (packed_select and _THRESHOLD_SELECT)
        else scores,
        jnp.full((tile_q, f), neg_inf, jnp.float32),
        jnp.full((tile_q, f), neg_inf, jnp.float32),
        jnp.zeros((tile_q, k), jnp.int32),
        jnp.zeros((tile_q, f), jnp.int32),
        jnp.zeros((tile_q, f), jnp.int32),
    )
    _, x1, x2, idx, w1, w2_win = jax.lax.fori_loop(0, k, body, init)

    x1_ref[0] = x1.astype(x1_ref.dtype)
    x2_ref[0] = x2.astype(x2_ref.dtype)
    idx_ref[0] = idx
    if emit_winners:
        win_refs[0][0] = w1.astype(win_refs[0].dtype)
        win_refs[1][0] = w2_win.astype(win_refs[1].dtype)


def _select_knn_idx(scores, col_ids, k: int, tile_q: int,
                    packed_select: bool):
    """The k-step serial selection ONLY (no interleaved gathers): returns
    the [TQ, k] neighbor indices. Each step is a max-reduce + mask over
    [TQ, N] — pure VPU work with no MXU op serialized between steps."""
    neg_inf = jnp.float32(-jnp.inf)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)
    if packed_select:
        packed, mask = _pack_scores(scores, col_ids, scores.shape[-1])
        if _THRESHOLD_SELECT:
            min32 = jnp.int32(-(2**31))

            def tbody(j, carry):
                thr, idx = carry
                m = jnp.max(
                    jnp.where(packed < thr[:, None], packed, min32), axis=1
                )
                amax = mask - jnp.bitwise_and(m, mask)
                idx = jnp.where(k_ids == j, amax[:, None], idx)
                return m, idx

            _, idx = jax.lax.fori_loop(
                0, k, tbody,
                (_thr_init(tile_q), jnp.zeros((tile_q, k), jnp.int32)),
            )
            return idx
        scores = packed

    def body(j, carry):
        scores, idx = carry
        if packed_select:
            _, amax, scores = _packed_pop_max(scores, mask)
        else:
            amax = jnp.argmax(scores, axis=1).astype(jnp.int32)
            scores = jnp.where(col_ids == amax[:, None], neg_inf, scores)
        idx = jnp.where(k_ids == j, amax[:, None], idx)
        return scores, idx

    _, idx = jax.lax.fori_loop(
        0, k, body, (scores, jnp.zeros((tile_q, k), jnp.int32))
    )
    return idx


def _edge_conv_deferred_kernel(
    x_q_ref, x_k_ref, norms_ref, a_ref, scale_ref, h_ref, w2_ref, b2_ref,
    x1_ref, x2_ref, idx_ref, *win_refs, k: int, tile_q: int, slope: float,
    packed_select: bool, int8_gather: bool, emit_winners: bool = False,
):
    """_edge_conv_kernel with the gathers DEFERRED out of the selection
    loop: select all k indices first (VPU-only serial chain), then run the
    neighbor combine as ONE [k*TQ, N] one-hot gather matmul + ONE
    [k*TQ, F] conv matmul + static max-trees (the structure of
    _edge_conv_from_idx_kernel). Trades [k*TQ, N] VMEM residency for
    removing k MXU ops from the serial chain and running the gathers at
    full-matmul efficiency."""
    scores, col_ids = _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q)
    idx = _select_knn_idx(scores, col_ids, k, tile_q, packed_select)
    a_full = a_ref[0]  # pre-quantized int8 when int8_gather
    h = h_ref[0]
    w2 = w2_ref[:]
    b2 = b2_ref[0]
    n = a_full.shape[0]
    h32 = h.astype(jnp.float32)
    b32 = b2.astype(jnp.float32)

    def leaky(v):
        return jnp.where(v >= 0, v, v * slope)

    if int8_gather:
        onehot = _kmajor_onehot(idx, n, k, tile_q, jnp.int8)
        g = jnp.dot(onehot, a_full, preferred_element_type=jnp.int32)
        g = g.astype(jnp.float32) * scale_ref[0][0]
    else:
        onehot = _kmajor_onehot(idx, n, k, tile_q, a_full.dtype)
        g = jnp.dot(onehot, a_full, preferred_element_type=jnp.float32)
    z = leaky(g + _kmajor_broadcast(h32, k))
    y = leaky(
        jnp.dot(z.astype(w2.dtype), w2, preferred_element_type=jnp.float32)
        + b32
    )
    x1 = z[0:tile_q]
    x2 = y[0:tile_q]
    if emit_winners:
        w1 = jnp.zeros(x1.shape, jnp.int32)
        w2_win = jnp.zeros(x2.shape, jnp.int32)
        for j in range(1, k):
            zj = z[j * tile_q:(j + 1) * tile_q]
            yj = y[j * tile_q:(j + 1) * tile_q]
            b1 = zj > x1  # strict >: first j claims (torch argmax)
            b2w = yj > x2
            x1 = jnp.where(b1, zj, x1)
            x2 = jnp.where(b2w, yj, x2)
            w1 = jnp.where(b1, j, w1)
            w2_win = jnp.where(b2w, j, w2_win)
        win_refs[0][0] = w1.astype(win_refs[0].dtype)
        win_refs[1][0] = w2_win.astype(win_refs[1].dtype)
    else:
        for j in range(1, k):
            x1 = jnp.maximum(x1, z[j * tile_q:(j + 1) * tile_q])
            x2 = jnp.maximum(x2, y[j * tile_q:(j + 1) * tile_q])
    x1_ref[0] = x1.astype(x1_ref.dtype)
    x2_ref[0] = x2.astype(x2_ref.dtype)
    idx_ref[0] = idx


def _gather_max_deferred_kernel(
    x_q_ref, x_k_ref, norms_ref, v_ref, scale_ref, out_ref, idx_ref,
    *win_refs, k: int, tile_q: int, packed_select: bool, int8_gather: bool,
    emit_winners: bool = False,
):
    """_gather_max_kernel with deferred gathers (see
    _edge_conv_deferred_kernel)."""
    scores, col_ids = _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q)
    idx = _select_knn_idx(scores, col_ids, k, tile_q, packed_select)
    values = v_ref[0]  # pre-quantized int8 when int8_gather
    n = values.shape[0]
    if int8_gather:
        onehot = _kmajor_onehot(idx, n, k, tile_q, jnp.int8)
        g = jnp.dot(onehot, values, preferred_element_type=jnp.int32)
        g = g.astype(jnp.float32) * scale_ref[0][0]
    else:
        onehot = _kmajor_onehot(idx, n, k, tile_q, values.dtype)
        g = jnp.dot(onehot, values, preferred_element_type=jnp.float32)
    m = g[0:tile_q]
    if emit_winners:
        w = jnp.zeros(m.shape, jnp.int32)
        for j in range(1, k):
            gj = g[j * tile_q:(j + 1) * tile_q]
            b = gj > m  # strict >: first j claims (torch argmax)
            m = jnp.where(b, gj, m)
            w = jnp.where(b, j, w)
        win_refs[0][0] = w.astype(win_refs[0].dtype)
    else:
        for j in range(1, k):
            m = jnp.maximum(m, g[j * tile_q:(j + 1) * tile_q])
    out_ref[0] = m.astype(out_ref.dtype)
    idx_ref[0] = idx


def _gather_max_kernel(
    x_q_ref, x_k_ref, norms_ref, v_ref, scale_ref, out_ref, idx_ref,
    *win_refs, k: int, tile_q: int, packed_select: bool, int8_gather: bool,
    emit_winners: bool = False,
):
    scores, col_ids = _scores_and_ids(x_q_ref, x_k_ref, norms_ref, tile_q)
    values = v_ref[0]  # [N, F] (pre-quantized int8 when int8_gather)
    v_scale = scale_ref[0][0]  # [F]
    n = values.shape[0]
    f = values.shape[-1]
    neg_inf = jnp.float32(-jnp.inf)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tile_q, k), 1)
    if packed_select:
        scores, mask = _pack_scores(scores, col_ids, n)

    def body(j, carry):
        st, gmax, idx, w = carry
        if packed_select and _THRESHOLD_SELECT:
            sel, amax, st = _threshold_pop_max(scores, st, mask)
        elif packed_select:
            sel, amax, st = _packed_pop_max(st, mask)
        else:
            amax = jnp.argmax(st, axis=1).astype(jnp.int32)
            sel = col_ids == amax[:, None]
            st = jnp.where(sel, neg_inf, st)
        g = _gather_rows(sel, values, v_scale, int8_gather)
        if emit_winners:
            b = g > gmax  # strict >: first j claims (torch argmax)
            gmax = jnp.where(b, g, gmax)
            w = jnp.where(b, j, w)
        else:
            gmax = jnp.maximum(gmax, g)
        idx = jnp.where(k_ids == j, amax[:, None], idx)
        return st, gmax, idx, w

    init = (
        _thr_init(tile_q) if (packed_select and _THRESHOLD_SELECT)
        else scores,
        jnp.full((tile_q, f), neg_inf, jnp.float32),
        jnp.zeros((tile_q, k), jnp.int32),
        jnp.zeros((tile_q, f), jnp.int32),
    )
    _, gmax, idx, w = jax.lax.fori_loop(0, k, body, init)

    out_ref[0] = gmax.astype(out_ref.dtype)
    idx_ref[0] = idx
    if emit_winners:
        win_refs[0][0] = w.astype(win_refs[0].dtype)


def _kmajor_broadcast(x, k: int):
    """[TQ, F] -> [k*TQ, F] repeating the tile k times (k-major rows)."""
    return jnp.concatenate([x] * k, axis=0)


def _kmajor_onehot(idx, n: int, k: int, tile_q: int, dtype):
    """idx [TQ, k] int32 -> one-hot [k*TQ, N] in k-major row order, built
    from k static slice-compares (no reshapes Mosaic can't lay out)."""
    col = jax.lax.broadcasted_iota(jnp.int32, (tile_q, n), 1)
    rows = [
        (col == idx[:, j:j + 1]).astype(dtype) for j in range(k)
    ]
    return jnp.concatenate(rows, axis=0)


def _edge_conv_bwd_kernel(
    idx_ref, win1_ref, win2_ref, a_ref, h_ref, w2_ref,
    x2_ref, ct1_ref, ct2_ref,
    da_ref, dh_ref, dw2_ref, db2_ref,
    *, k: int, tile_q: int, slope: float, n: int,
):
    """Backward of _edge_conv_kernel, batched over k.

    Consumes the forward's saved neighbor indices ([TQ, k]) AND max-winner
    indices ([TQ, F], the k-position that won each output channel), so
    there is NO score recompute, NO serial argmax chain, and NO second
    conv recompute: the k neighbor selections become ONE [k*TQ, N] one-hot
    whose matmuls (gather, z^T@dp, dp@w2^T, onehot^T@dq — the scatter)
    each run as a single large MXU op per tile. Only z is recomputed in
    VMEM (its gather matmul feeds dw2 and dleaky); the x2 = max(y) branch
    needs no y recompute at all — dleaky at the winner equals dleaky of
    the saved output, and winner masks replace the value-match claims.

    a_ref always holds the UNQUANTIZED table: winner routing is explicit,
    so the backward math is decoupled from the forward's gather dtype.
    Under int8 forward gathers the gradient is the straight-through
    gradient (identity through the table quantization) evaluated with
    exact values at the forward's winner selection."""
    idx = idx_ref[0]  # [TQ, k] int32
    win1 = win1_ref[0].astype(jnp.int32)  # [TQ, F]
    win2 = win2_ref[0].astype(jnp.int32)  # [TQ, F]
    a_full = a_ref[0]  # [N, F] (original dtype)
    h = h_ref[0]  # [TQ, F]
    w2 = w2_ref[:]  # [F, F]
    x2_32 = x2_ref[0].astype(jnp.float32)
    ct1 = ct1_ref[0].astype(jnp.float32)
    ct2 = ct2_ref[0].astype(jnp.float32)

    h32 = h.astype(jnp.float32)
    act_dt = h.dtype
    one = jnp.float32(1.0)

    def leaky(v):
        return jnp.where(v >= 0, v, v * slope)

    def dleaky(post):  # leaky' from the post-activation sign
        return jnp.where(post > 0, one, jnp.float32(slope))

    # one-hot of ALL k selections at once: [k*TQ, N]
    onehot = _kmajor_onehot(idx, n, k, tile_q, act_dt)
    g = jnp.dot(onehot, a_full, preferred_element_type=jnp.float32)
    h_rep = _kmajor_broadcast(h32, k)
    z = leaky(g + h_rep)  # [k*TQ, F], same ops as the forward

    # dp is nonzero only at each channel's winner row; at the winner,
    # y == x2 so dleaky(y) == dleaky(x2) — no y recompute needed
    dp_tile = ct2 * dleaky(x2_32)  # [TQ, F]
    dp = jnp.concatenate(
        [jnp.where(win2 == j, dp_tile, 0.0) for j in range(k)], axis=0
    )  # [k*TQ, F]
    dw2 = jax.lax.dot_general(
        z, dp, (((0,), (0,)), ((), ())),  # z^T @ dp -> [F, F]
        preferred_element_type=jnp.float32,
    )
    db2 = dp.sum(axis=0)
    dz = jnp.concatenate(
        [jnp.where(win1 == j, ct1, 0.0) for j in range(k)], axis=0
    ) + jax.lax.dot_general(
        dp.astype(w2.dtype), w2, (((1,), (1,)), ((), ())),  # dp @ w2^T
        preferred_element_type=jnp.float32,
    )
    dq = dz * dleaky(z)  # [k*TQ, F] pre-activation grad of z
    da = jax.lax.dot_general(
        onehot, dq.astype(act_dt),
        (((0,), (0,)), ((), ())),  # onehot^T @ dq: the scatter, one matmul
        preferred_element_type=jnp.float32,
    )
    dh = dq[0:tile_q]
    for j in range(1, k):
        dh = dh + dq[j * tile_q:(j + 1) * tile_q]

    dh_ref[0] = dh
    i = pl.program_id(1)
    first_tile = i == 0
    first_all = (pl.program_id(0) == 0) & first_tile

    @pl.when(first_tile)
    def _():
        da_ref[0] = da

    @pl.when(jnp.logical_not(first_tile))
    def _():
        da_ref[0] = da_ref[0] + da

    @pl.when(first_all)
    def _():
        dw2_ref[:] = dw2
        db2_ref[0] = db2

    @pl.when(jnp.logical_not(first_all))
    def _():
        dw2_ref[:] = dw2_ref[:] + dw2
        db2_ref[0] = db2_ref[0] + db2


def _gather_max_from_idx_kernel(
    idx_ref, v_ref, scale_ref, out_ref, *win_refs,
    k: int, tile_q: int, int8_gather: bool, emit_winners: bool = False,
):
    """Forward gather-max given PRECOMPUTED neighbor indices: no score
    matmul, no k-step argmax — the k gathers run as ONE [k*TQ, N] one-hot
    MXU matmul, then a static max-tree over the k row blocks. Used when the
    selection is known to be reusable (e.g. spatial kNN across eval
    refinement iterations: rigid transforms preserve distances, so the
    neighbor sets of the transformed source equal the original's)."""
    idx = idx_ref[0]  # [TQ, k]
    values = v_ref[0]  # [N, F] (pre-quantized int8 when int8_gather)
    n = values.shape[0]
    if int8_gather:
        onehot = _kmajor_onehot(idx, n, k, tile_q, jnp.int8)
        g = jnp.dot(onehot, values, preferred_element_type=jnp.int32)
        g = g.astype(jnp.float32) * scale_ref[0][0]
    else:
        onehot = _kmajor_onehot(idx, n, k, tile_q, values.dtype)
        g = jnp.dot(onehot, values, preferred_element_type=jnp.float32)
    m = g[0:tile_q]
    if emit_winners:
        w = jnp.zeros(m.shape, jnp.int32)
        for j in range(1, k):
            gj = g[j * tile_q:(j + 1) * tile_q]
            b = gj > m  # strict >: first j claims (torch argmax)
            m = jnp.where(b, gj, m)
            w = jnp.where(b, j, w)
        win_refs[0][0] = w.astype(win_refs[0].dtype)
    else:
        for j in range(1, k):
            m = jnp.maximum(m, g[j * tile_q:(j + 1) * tile_q])
    out_ref[0] = m.astype(out_ref.dtype)


def _edge_conv_from_idx_kernel(
    idx_ref, a_ref, scale_ref, h_ref, w2_ref, b2_ref, x1_ref, x2_ref,
    *, k: int, tile_q: int, slope: float, int8_gather: bool,
):
    """Edge-conv forward given PRECOMPUTED neighbor indices: no distance
    matmul and no serial k-step selection loop — the k gathers run as ONE
    [k*TQ, N] one-hot MXU matmul and the convDG2 conv as one [k*TQ, F]
    matmul, then static max-trees over the k row blocks. The from-indices
    twin of _edge_conv_kernel (same outputs given idx = its selection);
    used when the feature-graph selection is reused across eval refinement
    iterations (Config.reuse_feature_knn)."""
    idx = idx_ref[0]  # [TQ, k]
    a_full = a_ref[0]  # [N, F] (pre-quantized int8 when int8_gather)
    h = h_ref[0]  # [TQ, F]
    w2 = w2_ref[:]  # [F, F]
    b2 = b2_ref[0]  # [F]
    n = a_full.shape[0]
    h32 = h.astype(jnp.float32)
    b32 = b2.astype(jnp.float32)

    def leaky(v):
        return jnp.where(v >= 0, v, v * slope)

    if int8_gather:
        onehot = _kmajor_onehot(idx, n, k, tile_q, jnp.int8)
        g = jnp.dot(onehot, a_full, preferred_element_type=jnp.int32)
        g = g.astype(jnp.float32) * scale_ref[0][0]
    else:
        onehot = _kmajor_onehot(idx, n, k, tile_q, a_full.dtype)
        g = jnp.dot(onehot, a_full, preferred_element_type=jnp.float32)
    z = leaky(g + _kmajor_broadcast(h32, k))  # [k*TQ, F]
    y = leaky(
        jnp.dot(z.astype(w2.dtype), w2, preferred_element_type=jnp.float32)
        + b32
    )
    x1 = z[0:tile_q]
    x2 = y[0:tile_q]
    for j in range(1, k):
        x1 = jnp.maximum(x1, z[j * tile_q:(j + 1) * tile_q])
        x2 = jnp.maximum(x2, y[j * tile_q:(j + 1) * tile_q])
    x1_ref[0] = x1.astype(x1_ref.dtype)
    x2_ref[0] = x2.astype(x2_ref.dtype)


def edge_conv_from_idx(
    idx, a, h, w2, b2, negative_slope: float = 0.0, tile_q: int | None = None,
    interpret: bool = False, int8_gather: bool = False,
):
    """idx [B, N, k] int32, a/h [B, N, F], w2 [F, F], b2 [F]
    -> (x1, x2) each [B, N, F] in a's dtype: the LPDNet DG block evaluated
    over the GIVEN neighbor selection (see _edge_conv_from_idx_kernel).
    EVAL ONLY — no VJP (training never reuses a selection)."""
    B, N, k = idx.shape
    F = a.shape[-1]
    flop_meter.add(flop_meter.matmul(B * N, F, F))
    tile_q = _pick_tile(N, tile_q)
    # the full [k*TQ, N] one-hot is materialised (no fori_loop)
    tile_q = _vmem_guard_tile(
        tile_q, k, N, 1 if int8_gather else a.dtype.itemsize
    )
    kernel = functools.partial(
        _edge_conv_from_idx_kernel, k=k, tile_q=tile_q,
        slope=negative_slope, int8_gather=int8_gather,
    )
    out_sds = jax.ShapeDtypeStruct((B, N, F), a.dtype)
    table, scale = _table_and_scale(a, int8_gather)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[out_sds, out_sds],
        interpret=interpret,
    )(idx, table, scale, h, w2, b2.reshape(1, F))


def _gather_max_bwd_kernel(
    idx_ref, win_ref, ct_ref, dv_ref,
    *, k: int, tile_q: int, n: int,
):
    """Backward of _gather_max_kernel, driven by the forward's SAVED
    winner indices: dvalues[idx[i, win[i, f]], f] += ct[i, f]. No value
    table, no gather recompute, no value-match claims — the whole
    backward is ONE scatter matmul (onehot^T @ winner-masked-ct). Because
    routing comes from explicit winners, the forward's gather dtype
    (int8/bf16/f32) is irrelevant here."""
    idx = idx_ref[0]  # [TQ, k]
    win = win_ref[0].astype(jnp.int32)  # [TQ, F]
    ct = ct_ref[0].astype(jnp.float32)
    mm_dt = ct_ref.dtype  # match the forward's matmul width

    onehot = _kmajor_onehot(idx, n, k, tile_q, mm_dt)
    masked = jnp.concatenate(
        [jnp.where(win == j, ct, 0.0) for j in range(k)], axis=0
    )  # [k*TQ, F]
    dv = jax.lax.dot_general(
        onehot, masked.astype(mm_dt),
        (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    i = pl.program_id(1)

    @pl.when(i == 0)
    def _():
        dv_ref[0] = dv

    @pl.when(i != 0)
    def _():
        dv_ref[0] = dv_ref[0] + dv


def _norms(x):
    xf = x.astype(jnp.float32)
    return jnp.sum(xf * xf, axis=-1)[:, None, :]  # [B, 1, N]


def _pick_tile(n, tile_q):
    if tile_q is None:
        tile_q = TILE_Q_DEFAULT
    if n % tile_q == 0:
        return tile_q
    # >= 8: Mosaic requires the sublane dim divisible by 8
    return next(t for t in (128, 64, 32, 16, 8) if n % t == 0)


def _vmem_guard_tile(tile_q, k, n, itemsize, budget=6 << 20):
    """Shrink tile_q so a [k*tile_q, n] one-hot stays under ~budget bytes of
    VMEM. Each halving must keep tile_q a multiple of 8 (Mosaic sublane
    constraint) and a divisor of n (grid tiling); stop when it can't.
    VCRNET_ONEHOT_VMEM_BUDGET_MB overrides the budget (A/B knob, pairs
    with VCRNET_EDGECONV_TILE_Q; read at call time so tests can clear it)."""
    env = os.environ.get("VCRNET_ONEHOT_VMEM_BUDGET_MB", "").strip()
    if env.isdigit():
        budget = int(env) << 20
    while tile_q > 8 and k * tile_q * n * itemsize > budget:
        nxt = tile_q // 2
        if nxt % 8 != 0 or n % nxt != 0:
            break
        tile_q = nxt
    return tile_q


def fused_edge_conv(
    x, a, h, w2, b2, k: int = 20, negative_slope: float = 0.0,
    tile_q: int | None = None, interpret: bool = False,
    packed_select: bool = True, int8_gather: bool = False,
    return_idx: bool = False,
):
    """x [B,N,C] (distance space), a/h [B,N,F], w2 [F,F], b2 [F]
    -> (x1, x2) each [B, N, F] in a's dtype.

    Differentiable: custom VJP with a Pallas backward kernel (grads wrt
    a, h, w2, b2; x gets zeros — kNN indices carry no gradient, like
    torch.topk). ``packed_select=False`` selects by exact-f32 argmax
    (slower; see _pack_scores). ``int8_gather`` runs the one-hot gather
    matmuls int8 x int8 -> int32 (2x MXU rate; table-quantization error
    only); under differentiation the backward recomputes from the SAME
    quantized table, yielding the straight-through gradient of the
    quantized forward (gate via Config.int8_train_gathers — convergence
    is an A/B question like every quantized-training knob).

    ``return_idx`` additionally returns the [B, N, k] int32 neighbor
    selection (the kernel materialises it anyway for the backward, so
    this is free) — EVAL ONLY: the returning path bypasses the VJP."""
    if return_idx:
        return _fused_edge_conv_fwd_impl(
            x, a, h, w2, b2, k, negative_slope, tile_q, interpret,
            packed_select, int8_gather,
        )
    return _fused_edge_conv_vjp(
        x, a, h, w2, b2, k, negative_slope, tile_q, interpret,
        packed_select, int8_gather,
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9, 10))
def _fused_edge_conv_vjp(
    x, a, h, w2, b2, k, negative_slope, tile_q, interpret, packed_select,
    int8_gather,
):
    x1, x2, _ = _fused_edge_conv_fwd_impl(
        x, a, h, w2, b2, k, negative_slope, tile_q, interpret,
        packed_select, int8_gather,
    )
    return x1, x2


def _fused_edge_conv_fwd(
    x, a, h, w2, b2, k, negative_slope, tile_q, interpret, packed_select,
    int8_gather,
):
    x1, x2, idx, win1, win2 = _fused_edge_conv_fwd_impl(
        x, a, h, w2, b2, k, negative_slope, tile_q, interpret,
        packed_select, int8_gather, emit_winners=True,
    )
    # zeros_like(x) residual: a free broadcast after DCE, returned as x's
    # (identically zero) cotangent — kNN indices carry no gradient
    return (x1, x2), (idx, win1, win2, a, h, w2, b2, x2, jnp.zeros_like(x))


def _fused_edge_conv_bwd(
    k, negative_slope, tile_q, interpret, packed_select, int8_gather,
    res, cts,
):
    idx, win1, win2, a, h, w2, b2, x2, zero_x = res
    ct1, ct2 = cts
    B, N, F = a.shape
    # dW2 = x^T ct and the ct @ w2^T routing matmul
    flop_meter.add(flop_meter.matmul(B * N, F, F, 2.0))
    tile_q = _pick_tile(N, tile_q)
    # the backward materialises the full [k*TQ, N] one-hot (no fori_loop).
    # 6 MB budget: keeps the proven tile 128 at (k=20, N=1024, bf16)
    # [5.2 MB] while still shrinking at N>=2048 where Mosaic would fail.
    budget = 6 << 20
    tile_q = _vmem_guard_tile(tile_q, k, N, a.dtype.itemsize, budget=budget)
    kernel = functools.partial(
        _edge_conv_bwd_kernel, k=k, tile_q=tile_q, slope=negative_slope,
        n=N,
    )
    tile_spec = lambda f: pl.BlockSpec(
        (1, tile_q, f), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    full_spec = lambda f: pl.BlockSpec(
        (1, N, f), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
    )
    # the UNQUANTIZED table: winner routing decouples the backward math
    # from the forward's gather dtype (see kernel docstring)
    da, dh, dw2, db2 = pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),  # saved indices
            tile_spec(F),                      # win1 (int8)
            tile_spec(F),                      # win2 (int8)
            full_spec(F),                      # a (original dtype)
            tile_spec(F),                      # h
            pl.BlockSpec((F, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            tile_spec(F),                      # x2
            tile_spec(F),                      # ct1
            tile_spec(F),                      # ct2
        ],
        out_specs=[
            full_spec(F),                      # da, accumulated over tiles
            tile_spec(F),                      # dh
            pl.BlockSpec((F, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, N, F), jnp.float32),
            jax.ShapeDtypeStruct((B, N, F), jnp.float32),
            jax.ShapeDtypeStruct((F, F), jnp.float32),
            jax.ShapeDtypeStruct((1, F), jnp.float32),
        ],
        interpret=interpret,
    )(idx, win1, win2, a, h, w2, x2, ct1, ct2)
    return (
        zero_x,
        da.astype(a.dtype),
        dh.astype(h.dtype),
        dw2.astype(w2.dtype),
        db2.reshape(F).astype(b2.dtype),
    )


_fused_edge_conv_vjp.defvjp(_fused_edge_conv_fwd, _fused_edge_conv_bwd)


def _fused_edge_conv_fwd_impl(
    x, a, h, w2, b2, k: int, negative_slope: float,
    tile_q: int, interpret: bool, packed_select: bool = True,
    int8_gather: bool = False, deferred_gather: bool | None = None,
    emit_winners: bool = False,
):
    if deferred_gather is None:
        # measured default: deferred wins for edge-conv at both widths
        deferred_gather = (
            DEFERRED_OVERRIDE if DEFERRED_OVERRIDE is not None else True
        )
    B, N, C = x.shape
    F = a.shape[-1]
    # distance matrix + the in-kernel w2 conv (one [N,F]x[F,F] per cloud)
    flop_meter.add(
        flop_meter.pairwise_dist(B, N, N, C) + flop_meter.matmul(B * N, F, F)
    )
    tile_q = _pick_tile(N, tile_q)
    if deferred_gather:
        # the deferred kernel materialises the [k*TQ, N] one-hot
        tile_q = _vmem_guard_tile(
            tile_q, k, N, 1 if int8_gather else a.dtype.itemsize
        )
        kern_fn = _edge_conv_deferred_kernel
    else:
        kern_fn = _edge_conv_kernel
    kernel = functools.partial(
        kern_fn, k=k, tile_q=tile_q, slope=negative_slope,
        packed_select=packed_select, int8_gather=int8_gather,
        emit_winners=emit_winners,
    )
    out_sds = jax.ShapeDtypeStruct((B, N, F), a.dtype)
    # selection indices [B, N, k] (consumed by the backward)
    idx_sds = jax.ShapeDtypeStruct((B, N, k), jnp.int32)
    b2_2d = b2.reshape(1, F)
    tile_f = lambda f: pl.BlockSpec(
        (1, tile_q, f), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [tile_f(F), tile_f(F), tile_f(k)]
    out_shape = [out_sds, out_sds, idx_sds]
    if emit_winners:
        # max-winner k-positions per output channel (consumed by the
        # backward; int8 is plenty for k <= 127)
        win_sds = jax.ShapeDtypeStruct((B, N, F), jnp.int8)
        out_specs += [tile_f(F), tile_f(F)]
        out_shape += [win_sds, win_sds]
    # int8 tables are quantized ONCE here (not per grid step in-kernel)
    table, scale = _table_and_scale(a, int8_gather)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((F, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, F), lambda b, i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, x, _norms(x), table, scale, h, w2, b2_2d)


def fused_knn_gather_max(
    x, values, k: int = 20, tile_q: int | None = None, interpret: bool = False,
    return_idx: bool = False, packed_select: bool = True,
    int8_gather: bool = False,
):
    """x [B,N,C] (distance space), values [B,N,F]
    -> [B, N, F]: per point, channel-wise max of values over its k nearest
    neighbors in x-space (self excluded). With ``return_idx`` also returns
    the [B, N, k] int32 neighbor indices (zero-gradient), so callers can
    reuse the selection (e.g. across eval refinement iterations).

    Differentiable wrt ``values`` via a Pallas backward kernel (x gets
    zeros — kNN indices carry no gradient). ``int8_gather``: see
    fused_edge_conv (straight-through under differentiation)."""
    out, idx = _fused_gather_max_vjp(
        x, values, k, tile_q, interpret, packed_select, int8_gather
    )
    return (out, idx) if return_idx else out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5, 6))
def _fused_gather_max_vjp(
    x, values, k, tile_q, interpret, packed_select, int8_gather
):
    return _fused_gather_max_impl(
        x, values, k, tile_q, interpret, packed_select, int8_gather
    )


def _fused_gather_max_fwd(
    x, values, k, tile_q, interpret, packed_select, int8_gather
):
    out, idx, win = _fused_gather_max_impl(
        x, values, k, tile_q, interpret, packed_select, int8_gather,
        emit_winners=True,
    )
    return (out, idx), (idx, win, values, jnp.zeros_like(x))


def _gather_max_bwd_from_winners(idx, win, values, ct, tile_q, interpret):
    """Shared winner-driven gather-max backward: dv[idx[i, win[i,f]], f]
    += ct[i, f] as one scatter matmul (no value table needed — `values`
    only supplies the output shape/dtype)."""
    B, N, F = values.shape
    k = idx.shape[-1]
    tile_q = _pick_tile(N, tile_q)
    # the backward materialises the full [k*TQ, N] one-hot (no fori_loop)
    tile_q = _vmem_guard_tile(
        tile_q, k, N, ct.dtype.itemsize, budget=6 << 20
    )
    kernel = functools.partial(
        _gather_max_bwd_kernel, k=k, tile_q=tile_q, n=N,
    )
    dv = pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),  # saved indices
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),  # winners (int8)
            pl.BlockSpec((1, tile_q, F), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),  # cotangent
        ],
        out_specs=pl.BlockSpec(
            (1, N, F), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B, N, F), jnp.float32),
        interpret=interpret,
    )(idx, win, ct)
    return dv.astype(values.dtype)


def _fused_gather_max_bwd(
    k, tile_q, interpret, packed_select, int8_gather, res, cts
):
    ct = cts[0]  # the idx output is int32 -> float0 cotangent, unused
    idx, win, values, zero_x = res
    dv = _gather_max_bwd_from_winners(idx, win, values, ct, tile_q,
                                      interpret)
    return zero_x, dv


_fused_gather_max_vjp.defvjp(_fused_gather_max_fwd, _fused_gather_max_bwd)


def gather_max_from_idx(
    idx, values, tile_q: int | None = None, interpret: bool = False,
    int8_gather: bool = False,
):
    """idx [B, N, k] int32, values [B, N, F] -> [B, N, F]:
    out[b, i] = channel-wise max of values[b, idx[b, i, :]].

    The from-indices twin of fused_knn_gather_max (same output given
    idx = knn(x)), skipping the distance matmul and the k-step argmax.
    Differentiable wrt ``values`` (idx carries no gradient).
    ``int8_gather``: see fused_edge_conv (straight-through under
    differentiation)."""
    return _gather_max_from_idx_vjp(idx, values, tile_q, interpret,
                                    int8_gather)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _gather_max_from_idx_vjp(idx, values, tile_q, interpret, int8_gather):
    return _gather_max_from_idx_impl(
        idx, values, tile_q, interpret, int8_gather
    )


def _gather_max_from_idx_fwd(idx, values, tile_q, interpret, int8_gather):
    out, win = _gather_max_from_idx_impl(
        idx, values, tile_q, interpret, int8_gather, emit_winners=True,
    )
    return out, (idx, win, values)


def _gather_max_from_idx_bwd(tile_q, interpret, int8_gather, res, ct):
    import numpy as np

    idx, win, values = res
    # same winner-driven VJP as fused_knn_gather_max
    dv = _gather_max_bwd_from_winners(idx, win, values, ct, tile_q,
                                      interpret)
    # integer primal -> float0 cotangent
    return np.zeros(idx.shape, jax.dtypes.float0), dv


_gather_max_from_idx_vjp.defvjp(
    _gather_max_from_idx_fwd, _gather_max_from_idx_bwd
)


def _gather_max_from_idx_impl(
    idx, values, tile_q, interpret, int8_gather: bool = False,
    emit_winners: bool = False,
):
    B, N, k = idx.shape
    F = values.shape[-1]
    tile_q = _pick_tile(N, tile_q)
    # VMEM guard: unlike the fused kernel's fori_loop (one [TQ, N] one-hot
    # live at a time), this kernel materialises the full [k*TQ, N] one-hot
    tile_q = _vmem_guard_tile(
        tile_q, k, N, 1 if int8_gather else values.dtype.itemsize
    )
    kernel = functools.partial(
        _gather_max_from_idx_kernel, k=k, tile_q=tile_q,
        int8_gather=int8_gather, emit_winners=emit_winners,
    )
    tile_f = lambda f: pl.BlockSpec(
        (1, tile_q, f), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_specs = tile_f(F)
    out_shape = jax.ShapeDtypeStruct((B, N, F), values.dtype)
    if emit_winners:
        out_specs = [out_specs, tile_f(F)]
        out_shape = [out_shape, jax.ShapeDtypeStruct((B, N, F), jnp.int8)]
    table, scale = _table_and_scale(values, int8_gather)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, k), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(idx, table, scale)


def _fused_gather_max_impl(
    x, values, k: int, tile_q: int, interpret: bool,
    packed_select: bool = True, int8_gather: bool = False,
    deferred_gather: bool | None = None, emit_winners: bool = False,
):
    if deferred_gather is None:
        # measured default: deferred wins at int8 width, loses at bf16
        deferred_gather = (
            DEFERRED_OVERRIDE if DEFERRED_OVERRIDE is not None
            else int8_gather
        )
    B, N, C = x.shape
    F = values.shape[-1]
    flop_meter.add(flop_meter.pairwise_dist(B, N, N, C))
    tile_q = _pick_tile(N, tile_q)
    if deferred_gather:
        tile_q = _vmem_guard_tile(
            tile_q, k, N, 1 if int8_gather else values.dtype.itemsize
        )
        kern_fn = _gather_max_deferred_kernel
    else:
        kern_fn = _gather_max_kernel
    kernel = functools.partial(
        kern_fn, k=k, tile_q=tile_q,
        packed_select=packed_select, int8_gather=int8_gather,
        emit_winners=emit_winners,
    )
    idx_sds = jax.ShapeDtypeStruct((B, N, k), jnp.int32)
    tile_f = lambda f: pl.BlockSpec(
        (1, tile_q, f), lambda b, i: (b, i, 0), memory_space=pltpu.VMEM
    )
    out_specs = [tile_f(F), tile_f(k)]
    out_shape = [jax.ShapeDtypeStruct((B, N, F), values.dtype), idx_sds]
    if emit_winners:
        out_specs.append(tile_f(F))
        out_shape.append(jax.ShapeDtypeStruct((B, N, F), jnp.int8))
    table, scale = _table_and_scale(values, int8_gather)
    return pl.pallas_call(
        kernel,
        grid=(B, N // tile_q),
        in_specs=[
            pl.BlockSpec((1, tile_q, C), lambda b, i: (b, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, C), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, N), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, N, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, F), lambda b, i: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        interpret=interpret,
    )(x, x, _norms(x), table, scale)
