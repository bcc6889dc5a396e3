"""Interpret-mode parity tests for the fused pointer sublayer kernels
(ops/pallas_pointer.py) and their wiring inside the transformer pointer.

The kernels are a measured negative result (slower than flash+XLA at the
flagship shapes — see the module docstring) and default OFF; these tests
force them on via VCRNET_FUSED_POINTER=1 so the experiment stays
reproducible and correct.

The kernels are eval-only TPU fast paths; here they run in Pallas
interpret mode on CPU and are checked against the exact f32 math with
bf16-level tolerances (the kernels cast to bf16 internally, like the
rest of the fast profile).
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import vcrnet_tpu.ops.pallas_pointer as pp
from vcrnet_tpu.models.transformer import TransformerPointer


def _mha_ref(yq, ykv, wq, bq, wk, bk, wv, bv, wo, bo, n_heads):
    """Exact f32 reference of the fused sublayer."""
    q = yq @ wq + bq
    k = ykv @ wk + bk
    v = ykv @ wv + bv
    B, nq, d = q.shape
    nk = k.shape[1]
    dk = d // n_heads
    split = lambda a: a.reshape(B, -1, n_heads, dk).transpose(0, 2, 1, 3)
    q, k, v = split(q), split(k), split(v)
    s = jnp.einsum("bhnd,bhmd->bhnm", q, k) / np.sqrt(dk)
    p = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bhnm,bhmd->bhnd", p, v)
    o = o.transpose(0, 2, 1, 3).reshape(B, nq, d)
    return o @ wo + bo


def _rand(key, *shape):
    return jax.random.normal(key, shape, jnp.float32) * 0.5


class TestFusedMha:
    @pytest.mark.parametrize("nq,nk,heads", [(256, 256, 2), (256, 128, 1)])
    def test_matches_f32_math(self, nq, nk, heads):
        d = 128
        ks = jax.random.split(jax.random.PRNGKey(0), 11)
        yq = _rand(ks[0], 2, nq, d)
        ykv = yq if nq == nk else _rand(ks[1], 2, nk, d)
        wq, wk, wv, wo = (_rand(k, d, d) * 0.3 for k in ks[2:6])
        bq, bk, bv, bo = (_rand(k, d) * 0.1 for k in ks[6:10])
        got = pp.fused_mha(
            yq, ykv, wq, bq, wk, bk, wv, bv, wo, bo,
            n_heads=heads, interpret=True,
        )
        want = _mha_ref(yq, ykv, wq, bq, wk, bk, wv, bv, wo, bo, heads)
        assert got.shape == want.shape and got.dtype == jnp.bfloat16
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=0.12, rtol=0.05
        )

    def test_supported_gate(self, monkeypatch):
        monkeypatch.setenv("VCRNET_FUSED_POINTER", "1")
        assert pp.fused_mha_supported(1024, 1024, 512, 4)
        assert pp.fused_mha_supported(768, 768, 512, 4)
        assert not pp.fused_mha_supported(1000, 1024, 512, 4)  # lane align
        assert not pp.fused_mha_supported(1024, 1024, 512, 8)  # dk=64
        assert not pp.fused_mha_supported(8192, 8192, 512, 4)  # VMEM

    def test_ff_supported_gate(self, monkeypatch):
        monkeypatch.setenv("VCRNET_FUSED_POINTER", "1")
        assert pp.fused_ff_supported(1024, 512, 1024)
        assert not pp.fused_ff_supported(1000, 512, 1024)
        assert not pp.fused_ff_supported(8192, 512, 4096)


class TestFusedFF:
    def test_matches_f32_math(self):
        d, f = 128, 256
        ks = jax.random.split(jax.random.PRNGKey(1), 5)
        y = _rand(ks[0], 2, 256, d)
        w1, w2 = _rand(ks[1], d, f) * 0.3, _rand(ks[2], f, d) * 0.3
        b1, b2 = _rand(ks[3], f) * 0.1, _rand(ks[4], d) * 0.1
        got = pp.fused_ff(y, w1, b1, w2, b2, interpret=True)
        want = jnp.maximum(y @ w1 + b1, 0.0) @ w2 + b2
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=0.15, rtol=0.05
        )


class TestModuleWiring:
    """flash=True routes eval through fused_mha/fused_ff; the result must
    match the flash=False module with the SAME parameters."""

    @pytest.mark.parametrize("partial", [False, True])
    def test_fused_pointer_matches_unfused(self, monkeypatch, partial):
        monkeypatch.setenv("VCRNET_FUSED_POINTER", "1")
        monkeypatch.setattr(
            pp, "fused_mha", functools.partial(pp.fused_mha, interpret=True)
        )
        monkeypatch.setattr(
            pp, "fused_ff", functools.partial(pp.fused_ff, interpret=True)
        )
        kw = dict(
            emb_dims=128, n_blocks=1, n_heads=1, ff_dims=256,
            partial=partial, overlap2=0.75, dtype=jnp.bfloat16,
        )
        fused = TransformerPointer(flash=True, **kw)
        plain = TransformerPointer(flash=False, **kw)
        ks = jax.random.split(jax.random.PRNGKey(2), 3)
        src = _rand(ks[0], 2, 256, 128)
        tgt = _rand(ks[1], 2, 256, 128)
        variables = plain.init(ks[2], src, tgt)
        # identical param trees: fused wiring must not change layout
        sd, td = fused.apply(variables, src, tgt)
        sd0, td0 = plain.apply(variables, src, tgt)
        np.testing.assert_allclose(
            np.asarray(sd, np.float32), np.asarray(sd0, np.float32),
            atol=0.15, rtol=0.08,
        )
        np.testing.assert_allclose(
            np.asarray(td, np.float32), np.asarray(td0, np.float32),
            atol=0.15, rtol=0.08,
        )

    def test_train_mode_never_fused(self, monkeypatch):
        monkeypatch.setenv("VCRNET_FUSED_POINTER", "1")

        def boom(*a, **k):  # pragma: no cover - should not run
            raise AssertionError("fused kernel used in train mode")

        monkeypatch.setattr(pp, "fused_mha", boom)
        monkeypatch.setattr(pp, "fused_ff", boom)
        # train=True must stay on the differentiable path (kernels have no
        # VJP); _flash still runs — stub it with exact attention so this
        # test runs on CPU
        import vcrnet_tpu.models.transformer as tr

        def exact(q, k, v, sm_scale):
            s = jnp.einsum("bhnd,bhmd->bhnm", q, k) * sm_scale
            return jnp.einsum(
                "bhnm,bhmd->bhnd", jax.nn.softmax(s, -1).astype(v.dtype), v
            )

        monkeypatch.setattr(tr, "_flash", exact)
        ptr = TransformerPointer(
            emb_dims=128, n_blocks=1, n_heads=1, ff_dims=256,
            flash=True, dtype=jnp.bfloat16,
        )
        ks = jax.random.split(jax.random.PRNGKey(3), 3)
        src = _rand(ks[0], 2, 128, 128)
        tgt = _rand(ks[1], 2, 128, 128)
        variables = ptr.init(ks[2], src, tgt)
        sd, td = ptr.apply(variables, src, tgt, train=True)
        assert np.isfinite(np.asarray(sd, np.float32)).all()
