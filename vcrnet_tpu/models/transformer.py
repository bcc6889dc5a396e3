"""Transformer pointer: 1-block encoder-decoder cross-attention, run twice
symmetrically over (src, tgt), with the partial-overlap attention re-mask.

Reference model/transformer.py. Key semantics reproduced:
  * one shared EncoderDecoder applied in both directions
    (transformer.py:269-270) — flax gives us weight sharing by calling the
    same submodule twice;
  * pre-norm sublayer residuals ``x + f(norm(x))`` with a FINAL norm at both
    encoder and decoder output (transformer.py:108-131, 147-153);
  * torch-style LayerNorm: unbiased std in the denominator, ``(x-mu)/(std+eps)``
    (transformer.py:134-144) — note std not var, N-1 not N;
  * partial-overlap re-mask in the decoder's src-attention only
    (transformer.py:13-55, enabled at 251-255): after the first softmax, sum
    attention mass over heads+queries per KEY, keep the top
    ``int(num_key * overlap2)`` keys, re-mask scores to -1e9, re-softmax.
    The top-k size is static (a function of config), so the whole re-mask is
    one top_k + scatter + where under jit.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


class TorchLayerNorm(nn.Module):
    """LayerNorm with torch ``x.std(-1)`` semantics (unbiased, std-not-var)."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        from vcrnet_tpu.ops.layernorm import layer_norm_torch

        d = x.shape[-1]
        a = self.param("a_2", nn.initializers.ones, (d,))
        b = self.param("b_2", nn.initializers.zeros, (d,))
        # f32 math, output cast back to the input dtype (on the bf16 path
        # every consumer casts to bf16 anyway, so emitting f32 would only
        # double the HBM traffic of the norm and its reader). The analytic
        # custom VJP avoids autodiff's f32 residual traffic — see
        # ops/layernorm.py.
        return layer_norm_torch(x, a, b, self.eps)


def _remask_topk_keys(scores: jax.Array, p_attn: jax.Array, keep_k: int):
    """Partial-overlap re-mask (reference transformer.py:36-53).

    scores/p_attn: [B, H, Nq, Nk]. Keep the keep_k keys with the largest
    total attention mass (summed over heads and queries), push the rest to
    -1e9, re-softmax. (A/B note: restricting-and-renormalising the first
    softmax — p*mask / sum(p*mask), algebraically the same function — was
    measured ~0.7 ms SLOWER here: XLA fuses the where+softmax over the
    already-resident score tensor better than the explicit divide.)
    """
    col_mass = p_attn.sum(axis=(1, 2))  # [B, Nk]
    _, idx = jax.lax.top_k(col_mass, keep_k)  # [B, keep_k]
    mask = jnp.zeros(col_mass.shape, dtype=bool)
    mask = jnp.put_along_axis(mask, idx, True, axis=-1, inplace=False)
    scores = jnp.where(mask[:, None, None, :], scores, -1e9)
    return jax.nn.softmax(scores, axis=-1)


class ExposedDense(nn.Module):
    """Drop-in for the nn.Dense layers of the pointer (same param names,
    default init, and dtype promotion) that ALSO hands out (kernel, bias)
    so the fused Pallas sublayer kernels can consume the weights directly.
    Params are created in setup (input dim is static here), so both the
    matmul path and ``params_tuple`` see the same variables and the tree
    layout (linear_q/kernel, ...) is unchanged."""

    features: int
    din: int
    dtype: Any = None
    int8: bool = False  # dynamic-int8 MXU matmul (eval fast path; callers
    # gate on ``not train``) — 2x the bf16 rate at protocol shapes, see
    # ops/int8_linear.py

    def setup(self):
        self.kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.din, self.features),
        )
        self.bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,)
        )

    def __call__(self, x: jax.Array) -> jax.Array:
        x, k, b = nn.dtypes.promote_dtype(
            x, self.kernel, self.bias, dtype=self.dtype
        )
        if self.int8 and not self.is_initializing():
            from vcrnet_tpu.ops.int8_linear import int8_linear

            return int8_linear(x, k, b)
        return x @ k + b

    def params_tuple(self):
        return self.kernel, self.bias


def _flash(q, k, v, sm_scale):
    """Pallas flash attention with one-shot blocks (at N<=1024, D=128
    everything fits in VMEM; measured 6x over the library defaults) and a
    custom fused ONE-PASS backward (ops/pallas_attention.py — the stock
    backward runs two kernels each redoing the softmax recompute). Padding
    to lane multiples is handled inside flash_mha."""
    from vcrnet_tpu.ops.pallas_attention import flash_mha

    return flash_mha(q, k, v, sm_scale)


class MultiHeadAttention(nn.Module):
    """4-linear MHA (q, k, v, out), optional partial-overlap key re-mask.

    ``flash=True`` (fast TPU path, non-remasked heads only) computes the
    attention with the Pallas flash-attention kernel — the [B, H, Nq, Nk]
    score/probability tensors never touch HBM. The re-masked head needs the
    full probability column sums, so it keeps the unfused path.
    """

    n_heads: int
    d_model: int
    remask: bool = False
    overlap2: float = 1.0
    precision: Any = None
    dtype: Any = None
    flash: bool = False
    int8: bool = False  # dynamic-int8 q/k/v/out projections (eval only)
    dropout_rate: float = 0.0  # on p_attn after softmax. NOTE: the
    # reference's --dropout is DEAD code (MultiHeadedAttention hard-sets
    # self.dropout = None, reference transformer.py:198); here the flag is
    # functional, at the Annotated-Transformer position the reference's
    # structure descends from. Default 0.0 == reference behavior.
    capture_attention: bool = False  # sow p_attn (reference GlobalVar,
    # util/util.py:31-73) — retrieve with apply(..., mutable=['intermediates'])

    @nn.compact
    def __call__(
        self,
        query: jax.Array,
        key: jax.Array,
        value: jax.Array,
        train: bool = False,
    ):
        B, Nq, _ = query.shape
        Nk = key.shape[1]
        h, d_k = self.n_heads, self.d_model // self.n_heads
        # active dropout needs the materialised p_attn -> unfused path
        dropping = train and self.dropout_rate > 0.0

        d_in = query.shape[-1]
        # int8 is eval-only (zero gradient through the rounding); the q/k/v
        # projections of self-attention share one input so XLA CSEs their
        # activation quantization into a single pass
        i8 = self.int8 and not train
        dq = ExposedDense(
            self.d_model, d_in, name="linear_q", dtype=self.dtype, int8=i8
        )
        dk_m = ExposedDense(
            self.d_model, d_in, name="linear_k", dtype=self.dtype, int8=i8
        )
        dv = ExposedDense(
            self.d_model, d_in, name="linear_v", dtype=self.dtype, int8=i8
        )
        dout = ExposedDense(
            self.d_model, self.d_model, name="linear_out", dtype=self.dtype,
            int8=i8,
        )

        if (
            self.flash and not self.remask and not dropping
            and not self.capture_attention and not train
            and key is value and not self.is_initializing()
        ):
            from vcrnet_tpu.ops.pallas_pointer import (
                fused_mha, fused_mha_supported,
            )

            if fused_mha_supported(Nq, Nk, self.d_model, h):
                # whole MHA sublayer (projections + attention + out proj)
                # as ONE kernel per batch item — eval only, no VJP
                wq, bq = dq.params_tuple()
                wk, bk = dk_m.params_tuple()
                wv, bv = dv.params_tuple()
                wo, bo = dout.params_tuple()
                return fused_mha(
                    query, key, wq, bq, wk, bk, wv, bv, wo, bo, n_heads=h
                )

        if (
            self.flash and not self.remask
            and (
                not train
                or (
                    not dropping
                    and os.environ.get("VCRNET_PACKED_FLASH_TRAIN", "0")
                    == "1"
                )
            )
            and not self.capture_attention and not self.is_initializing()
            and os.environ.get("VCRNET_PACKED_FLASH", "1") == "1"
        ):
            from vcrnet_tpu.ops.pallas_attention import (
                flash_mha_packed, flash_packed_supported,
            )

            if flash_packed_supported(Nq, Nk, self.d_model, h):
                # packed-head flash: q/k/v stay [B, N, H*dk] end to end.
                # The head-split around flash_mha is free on the input
                # side (bitcast) but the transpose BACK materialises as
                # layout copies in the optimized HLO — this path removes
                # them (see flash_mha_packed docstring).
                x = flash_mha_packed(
                    dq(query), dk_m(key), dv(value), 1.0 / (d_k**0.5), h
                )
                return dout(x)

        def heads_of(y):
            return y.reshape(B, -1, h, d_k).transpose(0, 2, 1, 3)  # [B,H,N,dk]

        def proj(x, mod):
            return heads_of(mod(x))

        def proj_merged(x, mods):
            """One matmul for several projections of the SAME input: x @
            [W1|W2|...] + [b1|b2|...], then split. Exactly the per-module
            matmuls (matmul is column-separable). Measured SLOWER on the
            v5e at pointer shapes (cached pointer 17.2 vs 12.9 ms, encoder
            5.7 vs 4.0: the concatenated [512,1536] kernel defeats XLA's
            matmul+flash fusion), so it is OFF by default; A/B gate:
            VCRNET_MERGED_QKV=1 enables it."""
            kmat = jnp.concatenate([m.kernel for m in mods], axis=1)
            bias = jnp.concatenate([m.bias for m in mods])
            x, kmat, bias = nn.dtypes.promote_dtype(
                x, kmat, bias, dtype=self.dtype
            )
            return [heads_of(y) for y in
                    jnp.split(x @ kmat + bias, len(mods), axis=-1)]

        merged = os.environ.get("VCRNET_MERGED_QKV", "0") == "1"
        if merged and not i8 and query is key and key is value:
            q, k, v = proj_merged(query, (dq, dk_m, dv))
        elif merged and not i8 and key is value:
            q = proj(query, dq)
            k, v = proj_merged(key, (dk_m, dv))
        else:
            q = proj(query, dq)
            k = proj(key, dk_m)
            v = proj(value, dv)

        if self.flash and not self.remask and not dropping:
            x = _flash(q, k, v, 1.0 / (d_k**0.5))
        elif (
            self.flash and self.remask and not self.capture_attention
            and not dropping
            and Nk > 2048 and Nk % 128 == 0 and Nq % 128 == 0
        ):
            # large-N streaming re-mask (only pays off beyond ~2048 keys —
            # A/B at N=768 measured it 1-3% slower than the fused XLA path,
            # but it keeps memory O(N) where the XLA path is O(N^2)):
            # (1) per-key attention masses via the two-pass colmass kernels
            #     (no [B,H,Nq,Nk] tensor in HBM);
            # (2) the re-mask keeps exactly int(Nk * overlap2) keys — a
            #     STATIC count — so GATHER the kept key/value rows and
            #     flash-attend over just those (numerically identical to the
            #     -1e9 re-softmax: exp(-1e9) underflows to 0).
            from vcrnet_tpu.ops.pallas_colmass import softmax_colmass

            keep_k = int(Nk * self.overlap2)
            cm = softmax_colmass(
                q.reshape(B * h, Nq, d_k), k.reshape(B * h, Nk, d_k),
                1.0 / (d_k**0.5),
            )
            col_mass = cm.reshape(B, h, Nk).sum(axis=1)  # [B, Nk]
            _, keep_idx = jax.lax.top_k(col_mass, keep_k)  # [B, keep_k]
            take = lambda arr: jnp.take_along_axis(
                arr, keep_idx[:, None, :, None], axis=2
            )
            x = _flash(q, take(k), take(v), 1.0 / (d_k**0.5))
        else:
            scores = jnp.einsum(
                "bhnd,bhmd->bhnm", q, k, precision=self.precision,
                preferred_element_type=jnp.float32,
            ) / jnp.sqrt(jnp.asarray(d_k, jnp.float32))
            p_attn = jax.nn.softmax(scores, axis=-1)
            if self.remask:
                keep_k = int(Nk * self.overlap2)
                p_attn = _remask_topk_keys(scores, p_attn, keep_k)
            if self.capture_attention:
                # reference MultiHeadedAttention stores sum-over-heads
                # attention for figures (transformer.py:219)
                self.sow("intermediates", "attn", p_attn.sum(axis=1))
            if self.dropout_rate > 0.0:
                p_attn = nn.Dropout(
                    rate=self.dropout_rate, deterministic=not train,
                    name="attn_drop",
                )(p_attn)

            x = jnp.einsum(
                "bhnm,bhmd->bhnd", p_attn.astype(v.dtype), v,
                precision=self.precision, preferred_element_type=jnp.float32,
            )
        x = x.transpose(0, 2, 1, 3).reshape(B, Nq, self.d_model)
        return dout(x)


class FeedForward(nn.Module):
    """w2(relu(w1(x))) (reference transformer.py:227-238; its norm slot is
    an identity Sequential)."""

    d_ff: int
    d_model: int
    dtype: Any = None
    flash: bool = False  # enables the fused Pallas eval kernel (TPU bf16)
    dropout_rate: float = 0.0  # between relu(w1) and w2; dead in the
    # reference (its PositionwiseFeedForward nulls dropout, transformer.py:235)

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        w1 = ExposedDense(self.d_ff, x.shape[-1], name="w_1", dtype=self.dtype)
        w2 = ExposedDense(self.d_model, self.d_ff, name="w_2", dtype=self.dtype)
        if self.flash and not train and not self.is_initializing():
            from vcrnet_tpu.ops.pallas_pointer import (
                fused_ff, fused_ff_supported,
            )

            if fused_ff_supported(x.shape[1], self.d_model, self.d_ff):
                k1, b1 = w1.params_tuple()
                k2, b2 = w2.params_tuple()
                return fused_ff(x, k1, b1, k2, b2)
        x = nn.relu(w1(x))
        if self.dropout_rate > 0.0:
            x = nn.Dropout(
                rate=self.dropout_rate, deterministic=not train, name="drop"
            )(x)
        return w2(x)


def _sublayer_drop(rate: float, train: bool, name: str):
    """Residual-branch dropout ``x + drop(f(norm(x)))``; identity at rate 0
    (the reference's SublayerConnection accepts-and-ignores dropout,
    transformer.py:147-153)."""
    if rate > 0.0:
        return nn.Dropout(rate=rate, deterministic=not train, name=name)
    return lambda x: x


class EncoderLayer(nn.Module):
    n_heads: int
    d_model: int
    d_ff: int
    precision: Any = None
    dtype: Any = None
    flash: bool = False
    int8: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        attn = MultiHeadAttention(
            self.n_heads, self.d_model, precision=self.precision,
            dtype=self.dtype, flash=self.flash, int8=self.int8,
            dropout_rate=self.dropout_rate, name="self_attn",
        )
        r = self.dropout_rate
        y = TorchLayerNorm(name="norm0")(x)
        x = x + _sublayer_drop(r, train, "drop0")(attn(y, y, y, train=train))
        y = TorchLayerNorm(name="norm1")(x)
        return x + _sublayer_drop(r, train, "drop1")(
            FeedForward(
                self.d_ff, self.d_model, dtype=self.dtype, flash=self.flash,
                dropout_rate=r, name="ff",
            )(y, train=train)
        )


class DecoderLayer(nn.Module):
    n_heads: int
    d_model: int
    d_ff: int
    partial: bool = False
    overlap2: float = 1.0
    precision: Any = None
    dtype: Any = None
    flash: bool = False
    int8: bool = False
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(
        self, x: jax.Array, memory: jax.Array, train: bool = False
    ) -> jax.Array:
        self_attn = MultiHeadAttention(
            self.n_heads, self.d_model, precision=self.precision,
            dtype=self.dtype, flash=self.flash, int8=self.int8,
            dropout_rate=self.dropout_rate, name="self_attn",
        )
        src_attn = MultiHeadAttention(
            self.n_heads,
            self.d_model,
            remask=self.partial,
            overlap2=self.overlap2,
            precision=self.precision,
            dtype=self.dtype,
            flash=self.flash,
            int8=self.int8,
            dropout_rate=self.dropout_rate,
            name="src_attn",
        )
        r = self.dropout_rate
        y = TorchLayerNorm(name="norm0")(x)
        x = x + _sublayer_drop(r, train, "drop0")(
            self_attn(y, y, y, train=train)
        )
        y = TorchLayerNorm(name="norm1")(x)
        x = x + _sublayer_drop(r, train, "drop1")(
            src_attn(y, memory, memory, train=train)
        )
        y = TorchLayerNorm(name="norm2")(x)
        return x + _sublayer_drop(r, train, "drop2")(
            FeedForward(
                self.d_ff, self.d_model, dtype=self.dtype, flash=self.flash,
                dropout_rate=r, name="ff",
            )(y, train=train)
        )


class TransformerPointer(nn.Module):
    """The full pointer: encode one cloud, decode the other against it, in
    both directions with SHARED weights (reference transformer.py:241-272).

    __call__(src_emb, tgt_emb) -> (src_delta, tgt_delta), the residuals the
    caller adds back (reference vcrnet_model.py:503-505).
    """

    emb_dims: int = 512
    n_blocks: int = 1
    n_heads: int = 4
    ff_dims: int = 1024
    partial: bool = False
    overlap2: float = 1.0
    precision: Any = None
    dtype: Any = None
    flash: bool = False
    int8: bool = False
    dropout_rate: float = 0.0

    def setup(self):
        self.enc_layers = [
            EncoderLayer(
                self.n_heads, self.emb_dims, self.ff_dims,
                precision=self.precision, dtype=self.dtype, flash=self.flash,
                int8=self.int8, dropout_rate=self.dropout_rate,
            )
            for _ in range(self.n_blocks)
        ]
        self.dec_layers = [
            DecoderLayer(
                self.n_heads,
                self.emb_dims,
                self.ff_dims,
                partial=self.partial,
                overlap2=self.overlap2,
                precision=self.precision,
                dtype=self.dtype,
                flash=self.flash,
                int8=self.int8,
                dropout_rate=self.dropout_rate,
            )
            for _ in range(self.n_blocks)
        ]
        self.enc_norm = TorchLayerNorm()
        self.dec_norm = TorchLayerNorm()

    def _encode(self, x, train: bool = False):
        for layer in self.enc_layers:
            x = layer(x, train=train)
        return self.enc_norm(x)

    def _decode(self, x, memory, train: bool = False):
        for layer in self.dec_layers:
            x = layer(x, memory, train=train)
        return self.dec_norm(x)

    def encode_memory(self, x: jax.Array) -> jax.Array:
        """Encoder pass only — exposed so eval refinement loops can cache
        the (unchanging) encoded TARGET memory across iterations."""
        return self._encode(x)

    def __call__(
        self,
        src_emb: jax.Array,
        tgt_emb: jax.Array,
        tgt_memory: jax.Array | None = None,
        train: bool = False,
    ):
        # reference transformer.py:269-270: tgt' = model(src, tgt),
        # src' = model(tgt, src); model(a, b) = decode(b | encode(a)).
        # NOTE: stacking the two directions on the batch axis was A/B'd and
        # is ~6% SLOWER end-to-end at B=64 (the concat/split HBM copies cost
        # more than XLA's own overlap of the two passes saves).
        tgt_delta = self._decode(tgt_emb, self._encode(src_emb, train), train)
        if tgt_memory is None:
            tgt_memory = self._encode(tgt_emb, train)
        src_delta = self._decode(src_emb, tgt_memory, train)
        return src_delta, tgt_delta
