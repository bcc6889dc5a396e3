"""Fused one-pass flash-attention backward kernel vs XLA autodiff.

The kernel (ops/pallas_attention.py) is exercised in interpret mode: its
(q, k, v, o, do) inputs are produced by a plain-XLA attention forward,
and its (dq, dk, dv) must match jax.grad of that forward. The kernel
recomputes the softmax row stats itself (no lse residual is saved by the
forward). Covers the padded-key masking path (nk_valid < Nk) used at
partial shapes.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from vcrnet_tpu.ops.pallas_attention import _bwd_fused


def _reference_attention(q, k, v, sm_scale, nk_valid):
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k).astype(jnp.float32) * sm_scale
    if nk_valid < k.shape[2]:
        col = jnp.arange(k.shape[2])
        s = jnp.where(col[None, None, None, :] < nk_valid, s, -jnp.inf)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p.astype(v.dtype), v)
    lse = jax.scipy.special.logsumexp(s, axis=-1)  # [B,H,N]
    return o, lse


@pytest.mark.parametrize(
    "nq,nk,nk_valid",
    [(256, 256, 256), (256, 384, 256), (128, 256, 256)],
)
def test_fused_bwd_matches_xla_grads(nq, nk, nk_valid):
    rng = np.random.RandomState(0)
    B, H, D = 2, 2, 128
    sm_scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.randn(B, H, nq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, nk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, nk, D).astype(np.float32))
    ct = jnp.asarray(rng.randn(B, H, nq, D).astype(np.float32))

    def loss(q_, k_, v_):
        o, _ = _reference_attention(q_, k_, v_, sm_scale, nk_valid)
        return jnp.sum(o * ct)

    dq_ref, dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1, 2))(q, k, v)

    o, _ = _reference_attention(q, k, v, sm_scale, nk_valid)
    dq, dk, dv = _bwd_fused(
        q, k, v, o, ct, sm_scale, nk_valid, interpret=True
    )
    np.testing.assert_allclose(np.asarray(dq), np.asarray(dq_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dk), np.asarray(dk_ref), atol=2e-3)
    np.testing.assert_allclose(np.asarray(dv), np.asarray(dv_ref), atol=2e-3)


def test_fused_bwd_padded_queries_contribute_nothing():
    # padded query rows (zero do) must not touch dk/dv
    rng = np.random.RandomState(1)
    B, H, nq, nk, D = 1, 1, 256, 256, 128
    sm_scale = 1.0 / np.sqrt(D)
    q = jnp.asarray(rng.randn(B, H, nq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(B, H, nk, D).astype(np.float32))
    v = jnp.asarray(rng.randn(B, H, nk, D).astype(np.float32))
    o, _ = _reference_attention(q, k, v, sm_scale, nk)
    ct = rng.randn(B, H, nq, D).astype(np.float32)
    ct[:, :, 128:, :] = 0.0  # "padded" back half
    ct = jnp.asarray(ct)
    _, dk_full, dv_full = _bwd_fused(
        q, k, v, o, ct, sm_scale, nk, interpret=True
    )

    # reference restricted to the first 128 queries
    def loss(k_, v_):
        o_, _ = _reference_attention(q[:, :, :128], k_, v_, sm_scale, nk)
        return jnp.sum(o_ * ct[:, :, :128])

    dk_ref, dv_ref = jax.grad(loss, argnums=(0, 1))(k, v)
    np.testing.assert_allclose(
        np.asarray(dk_full), np.asarray(dk_ref), atol=2e-3
    )
    np.testing.assert_allclose(
        np.asarray(dv_full), np.asarray(dv_ref), atol=2e-3
    )


class TestPackedFlash:
    """flash_mha_packed: packed-head-layout one-shot forward (interpret
    mode) vs plain-XLA attention, plus the VJP fallback's layout
    round-trip."""

    def _packed_inputs(self, B=2, H=4, N=256, dk=128, seed=0):
        rng = np.random.RandomState(seed)
        mk = lambda: jnp.asarray(
            rng.randn(B, N, H * dk).astype(np.float32), jnp.float32
        )
        return mk(), mk(), mk()

    def test_packed_forward_matches_xla(self):
        from vcrnet_tpu.ops.pallas_attention import _flash_packed_impl

        B, H, N, dk = 2, 4, 256, 128
        q, k, v = self._packed_inputs(B, H, N, dk)
        sm = 1.0 / dk**0.5
        out = _flash_packed_impl(q, k, v, sm, H, interpret=True)

        split = lambda x: x.reshape(B, N, H, dk).transpose(0, 2, 1, 3)
        o_ref, _ = _reference_attention(
            split(q), split(k), split(v), sm, N
        )
        o_ref = o_ref.transpose(0, 2, 1, 3).reshape(B, N, H * dk)
        np.testing.assert_allclose(
            np.asarray(out), np.asarray(o_ref), rtol=2e-5, atol=2e-5
        )

    def test_packed_supported_gate(self):
        from vcrnet_tpu.ops.pallas_attention import flash_packed_supported

        assert flash_packed_supported(1024, 1024, 512, 4)
        assert flash_packed_supported(768, 768, 512, 4)  # partial shapes
        assert not flash_packed_supported(1024, 1024, 64, 4)  # dk=16
        assert not flash_packed_supported(1000, 1024, 512, 4)  # ragged

    def test_packed_vjp_matches_xla_grads(self, monkeypatch):
        # the fused backward itself is covered above; this checks the
        # packed VJP's split/merge plumbing. Residuals come from the
        # reference forward (the library kernel is TPU-only) and the
        # inner fused backward is forced into interpret mode.
        from vcrnet_tpu.ops import pallas_attention as pa

        B, H, N, dk = 1, 2, 128, 128
        q, k, v = self._packed_inputs(B, H, N, dk, seed=3)
        sm = 1.0 / dk**0.5
        split = lambda x: x.reshape(B, N, H, dk).transpose(0, 2, 1, 3)

        def ref_loss(q, k, v):
            o, _ = _reference_attention(split(q), split(k), split(v), sm, N)
            return (o.astype(jnp.float32) ** 2).sum()

        q4, k4, v4 = split(q), split(k), split(v)
        o4, _ = _reference_attention(q4, k4, v4, sm, N)
        out = o4.transpose(0, 2, 1, 3).reshape(B, N, H * dk)
        res = (q4, k4, v4, o4)

        real_bwd = pa._bwd_fused
        monkeypatch.setattr(
            pa, "_bwd_fused",
            lambda *a, **kw: real_bwd(*a, interpret=True, **kw),
        )
        dq, dk_, dv = pa._flash_packed_bwd(sm, H, res, 2.0 * out)
        gq, gk, gv = jax.grad(ref_loss, argnums=(0, 1, 2))(q, k, v)
        np.testing.assert_allclose(np.asarray(dq), np.asarray(gq),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dk_), np.asarray(gk),
                                   rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(np.asarray(dv), np.asarray(gv),
                                   rtol=2e-3, atol=2e-3)
