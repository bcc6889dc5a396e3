"""Torch-semantics LayerNorm with an analytic custom VJP.

The pointer stack applies 14 TorchLayerNorms per call (reference
model/transformer.py:130-145: 2 encodes x (2 sublayer norms) + 2 decodes
x (3 sublayer norms) + 2 final norms). Under plain autodiff the backward
is surprisingly expensive: JAX saves the f32 upcast of x (and the f32
normalized tensor) as residuals — at [64, 1024, 512] that is ~128 MB of
f32 HBM writes+reads per norm just to redo arithmetic that costs nothing
on the VPU. Measured 1.15 ms fwd+bwd per norm on v5e vs ~0.4 ms of pure
bandwidth (benchmarks/pointer_train_micro.py).

This module wraps the SAME forward (bit-identical: f32 mean, unbiased
std-not-var, eps added to std, cast back to input dtype) in a
jax.custom_vjp whose backward saves only x (original dtype) and the
per-row mean/std ([..., 1] f32, negligible) and recomputes the
normalized tensor in-register:

    h    = (x - mu) / (s + eps)
    dh   = dy * a
    dx   = (dh - mean(dh)) / (s + eps) - h * sum(dh * h) / ((d-1) * s)
    da   = sum_rows dy * h
    db   = sum_rows dy

(The sum(dh*h)/((d-1)s) term is d(std)/dx routed through the unbiased
variance; sum_j (x_j - mu) == 0 kills the d(mu)/dx contribution to it.)
Total backward traffic: read x + dy, write dx — three bf16 passes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_torch(x, a, b, eps: float = 1e-6):
    """y = a * (x - mean) / (std_unbiased + eps) + b, computed in f32 and
    cast back to x.dtype (torch ``x.std(-1)`` semantics)."""
    y, _ = _ln_fwd_impl(x, a, b, eps)
    return y


def _ln_fwd_impl(x, a, b, eps: float):
    d = x.shape[-1]
    in_dtype = x.dtype
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mean) ** 2).sum(axis=-1, keepdims=True) / (d - 1)
    std = jnp.sqrt(var)
    y = a * (xf - mean) / (std + eps) + b
    return y.astype(in_dtype), (mean, std)


def _ln_fwd(x, a, b, eps: float):
    y, (mean, std) = _ln_fwd_impl(x, a, b, eps)
    return y, (x, a, b, mean, std)


def _ln_bwd(eps: float, res, dy):
    x, a, b, mean, std = res
    d = x.shape[-1]
    xf = x.astype(jnp.float32)
    dyf = dy.astype(jnp.float32)
    denom = std + eps
    h = (xf - mean) / denom
    dh = dyf * a
    c1 = dh.mean(axis=-1, keepdims=True)
    c2 = (dh * h).sum(axis=-1, keepdims=True)
    # zero-variance rows (e.g. ReLU-dead embedding points after a
    # leaky-slope-0.2 LPD pretrain is loaded into the slope-0.0 VCRNet):
    # h == 0 there, so the d(std)/dx term is 0 * (c2/0) — autodiff (ours
    # OR torch's through the reference's hand-written norm) emits NaN and
    # one such row poisons the whole step. Take the h->0 limit (term
    # vanishes) instead; the (dh - c1)/denom part stays exact.
    safe_std = jnp.where(std > 0.0, std, 1.0)
    dx = (dh - c1) / denom - h * (c2 / ((d - 1) * safe_std))
    red = tuple(range(x.ndim - 1))
    da = (dyf * h).sum(axis=red)
    db = dyf.sum(axis=red)
    return dx.astype(x.dtype), da.astype(a.dtype), db.astype(b.dtype)


layer_norm_torch.defvjp(_ln_fwd, _ln_bwd)
