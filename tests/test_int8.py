"""Dynamic-int8 eval projections (ops/int8_linear.py): numerics of the
quantized matmul, and the gating contract — int8 applies at eval only, the
training path is bit-identical to the plain bf16 projections."""

import numpy as np

import jax
import jax.numpy as jnp

from vcrnet_tpu.ops.int8_linear import int8_linear, quantize_rows
from vcrnet_tpu.models.transformer import TransformerPointer


def test_int8_linear_close_to_matmul():
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(256, 512).astype(np.float32))
    k = jnp.asarray(rng.randn(512, 128).astype(np.float32) / 22.6)
    b = jnp.asarray(rng.randn(128).astype(np.float32))
    y = np.asarray(int8_linear(x, k, b), np.float32)
    ref = np.asarray(x @ k + b, np.float32)
    rel = np.abs(y - ref).mean() / np.abs(ref).mean()
    assert rel < 0.02, rel


def test_quantize_rows_roundtrip():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(64, 512).astype(np.float32))
    q, s = quantize_rows(x)
    assert q.dtype == jnp.int8
    back = np.asarray(q, np.float32) * np.asarray(s)
    rel = np.abs(back - np.asarray(x)).max() / np.abs(np.asarray(x)).max()
    assert rel < 0.01, rel
    # zero rows must not produce NaN scales
    q0, s0 = quantize_rows(jnp.zeros((4, 16)))
    assert np.all(np.isfinite(np.asarray(s0))) and np.all(np.asarray(q0) == 0)


def test_int8_pointer_eval_close_train_identical():
    rng = np.random.RandomState(2)
    B, N, D = 2, 64, 128
    src = jnp.asarray(rng.randn(B, N, D).astype(np.float32) / 4)
    tgt = jnp.asarray(rng.randn(B, N, D).astype(np.float32) / 4)
    kw = dict(emb_dims=D, n_heads=4, ff_dims=256, dtype=jnp.bfloat16)
    p_i8 = TransformerPointer(int8=True, **kw)
    p_bf = TransformerPointer(int8=False, **kw)
    variables = p_bf.init(jax.random.PRNGKey(0), src, tgt)

    # eval: int8 is active -> close but not equal to the bf16 path
    e_i8 = p_i8.apply(variables, src, tgt)
    e_bf = p_bf.apply(variables, src, tgt)
    for a, b in zip(e_i8, e_bf):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        denom = np.abs(b).mean() + 1e-9
        assert np.abs(a - b).mean() / denom < 0.1

    # train: the int8 flag must be inert -> bit-identical outputs
    t_i8 = p_i8.apply(variables, src, tgt, train=True)
    t_bf = p_bf.apply(variables, src, tgt, train=True)
    for a, b in zip(t_i8, t_bf):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
