"""Full transformer-pointer golden test: a torch mirror of the reference
encoder-decoder (model/transformer.py semantics) with random weights, vs our
TransformerPointer loaded through the state-dict converter. Catches wiring
errors (sublayer order, shared bidirectional application, final norms) that
per-op tests can't."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from vcrnet_tpu.models.transformer import TransformerPointer
from vcrnet_tpu.train.checkpoint import (
    convert_transformer_state_dict,
    merge_params,
)

D, H, FF = 64, 4, 128


def make_reference_state_dict(
    rng, n_blocks=1, prefix="pointer.model.", d=D, ff=FF
):
    """Random weights in the reference's exact key layout."""
    sd = {}

    D, FF = d, ff
    def lin(key, din, dout):
        sd[f"{key}.weight"] = torch.tensor(
            rng.randn(dout, din).astype(np.float32) * 0.05
        )
        sd[f"{key}.bias"] = torch.tensor(
            rng.randn(dout).astype(np.float32) * 0.05
        )

    def norm(key):
        sd[f"{key}.a_2"] = torch.tensor(
            1 + 0.1 * rng.randn(D).astype(np.float32)
        )
        sd[f"{key}.b_2"] = torch.tensor(
            0.1 * rng.randn(D).astype(np.float32)
        )

    for i in range(n_blocks):
        for j in range(4):
            lin(f"{prefix}encoder.layers.{i}.self_attn.linears.{j}", D, D)
            lin(f"{prefix}decoder.layers.{i}.self_attn.linears.{j}", D, D)
            lin(f"{prefix}decoder.layers.{i}.src_attn.linears.{j}", D, D)
        norm(f"{prefix}encoder.layers.{i}.sublayer.0.norm")
        norm(f"{prefix}encoder.layers.{i}.sublayer.1.norm")
        for j in range(3):
            norm(f"{prefix}decoder.layers.{i}.sublayer.{j}.norm")
        lin(f"{prefix}encoder.layers.{i}.feed_forward.w_1", D, FF)
        lin(f"{prefix}encoder.layers.{i}.feed_forward.w_2", FF, D)
        lin(f"{prefix}decoder.layers.{i}.feed_forward.w_1", D, FF)
        lin(f"{prefix}decoder.layers.{i}.feed_forward.w_2", FF, D)
    norm(f"{prefix}encoder.norm")
    norm(f"{prefix}decoder.norm")
    return sd


class TorchMirror:
    """Functional torch mirror of reference transformer.py semantics."""

    def __init__(
        self, sd, prefix="pointer.model.", d=D, h=H, overlap2=None
    ):
        self.sd = sd
        self.p = prefix
        self.d = d
        self.h = h
        self.overlap2 = overlap2  # partial re-mask in decoder src_attn

    def norm(self, x, key):
        a, b = self.sd[f"{key}.a_2"], self.sd[f"{key}.b_2"]
        mean = x.mean(-1, keepdim=True)
        std = x.std(-1, keepdim=True)  # unbiased, like reference :141-144
        return a * (x - mean) / (std + 1e-6) + b

    def linear(self, x, key):
        return x @ self.sd[f"{key}.weight"].T + self.sd[f"{key}.bias"]

    def mha(self, q_in, k_in, v_in, key, remask=False):
        D, H = self.d, self.h
        B, N, _ = q_in.shape
        dk = D // H
        q = self.linear(q_in, f"{key}.linears.0").view(B, -1, H, dk).transpose(1, 2)
        k = self.linear(k_in, f"{key}.linears.1").view(B, -1, H, dk).transpose(1, 2)
        v = self.linear(v_in, f"{key}.linears.2").view(B, -1, H, dk).transpose(1, 2)
        scores = q @ k.transpose(-2, -1) / np.sqrt(dk)
        p = F.softmax(scores, dim=-1)
        if remask and self.overlap2 is not None:
            # reference transformer.py:36-53 (is_src partial branch)
            Nk = k.size(2)
            col = torch.sum(p, dim=[1, 2])  # [B, Nk]
            keep = col.topk(k=int(Nk * self.overlap2), dim=-1)[1]
            mask = torch.zeros((B, Nk), dtype=torch.bool)
            mask.scatter_(1, keep, True)
            scores = scores.masked_fill(~mask[:, None, None, :], -1e9)
            p = F.softmax(scores, dim=-1)
        x = (p @ v).transpose(1, 2).contiguous().view(B, -1, D)
        return self.linear(x, f"{key}.linears.3")

    def ff(self, x, key):
        return self.linear(F.relu(self.linear(x, f"{key}.w_1")), f"{key}.w_2")

    def encode(self, x):
        e = f"{self.p}encoder.layers.0."
        y = self.norm(x, f"{e}sublayer.0.norm")
        x = x + self.mha(y, y, y, f"{e}self_attn")
        y = self.norm(x, f"{e}sublayer.1.norm")
        x = x + self.ff(y, f"{e}feed_forward")
        return self.norm(x, f"{self.p}encoder.norm")

    def decode(self, x, memory):
        d = f"{self.p}decoder.layers.0."
        y = self.norm(x, f"{d}sublayer.0.norm")
        x = x + self.mha(y, y, y, f"{d}self_attn")
        y = self.norm(x, f"{d}sublayer.1.norm")
        x = x + self.mha(y, memory, memory, f"{d}src_attn", remask=True)
        y = self.norm(x, f"{d}sublayer.2.norm")
        x = x + self.ff(y, f"{d}feed_forward")
        return self.norm(x, f"{self.p}decoder.norm")

    def __call__(self, src, tgt):
        # reference transformer.py:269-270: tgt' = model(src, tgt),
        # src' = model(tgt, src); model(a, b) = decode(b | encode(a))
        tgt_delta = self.decode(tgt, self.encode(src))
        src_delta = self.decode(src, self.encode(tgt))
        return src_delta, tgt_delta


def test_pointer_golden_vs_torch_mirror():
    rng = np.random.RandomState(0)
    sd = make_reference_state_dict(rng)
    mirror = TorchMirror(sd)

    src = rng.randn(2, 16, D).astype(np.float32)
    tgt = rng.randn(2, 16, D).astype(np.float32)
    with torch.no_grad():
        g_src, g_tgt = mirror(torch.tensor(src), torch.tensor(tgt))

    model = TransformerPointer(emb_dims=D, n_heads=H, ff_dims=FF)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(src), jnp.asarray(tgt)
    )
    sd_np = {k: v.numpy() for k, v in sd.items()}
    converted = convert_transformer_state_dict(sd_np)
    params = merge_params(variables["params"], converted)
    # every converted leaf must have landed (shapes all match)
    n_leaves = len(jax.tree_util.tree_leaves(converted))
    assert n_leaves == len(jax.tree_util.tree_leaves(params))

    o_src, o_tgt = model.apply({"params": params}, jnp.asarray(src), jnp.asarray(tgt))
    np.testing.assert_allclose(np.asarray(o_src), g_src.numpy(), atol=2e-5)
    np.testing.assert_allclose(np.asarray(o_tgt), g_tgt.numpy(), atol=2e-5)


def test_lpdnet_t7_export_roundtrip(tmp_path):
    import os

    import pytest

    from vcrnet_tpu.train.checkpoint import load_t7_lpdnet, export_lpdnet_t7

    t7 = "/root/reference/pretrained/lpd-pretrained.t7"
    if not os.path.exists(t7):
        pytest.skip("reference pretrained .t7 not present")
    emb = load_t7_lpdnet(t7)
    path = export_lpdnet_t7(emb, str(tmp_path / "roundtrip.t7"))
    emb2 = load_t7_lpdnet(path)
    for name in emb:
        for p in emb[name]:
            np.testing.assert_array_equal(emb[name][p], emb2[name][p])
