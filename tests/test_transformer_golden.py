"""Full transformer-pointer golden test: the shared torch mirror of the
reference encoder-decoder (benchmarks/torch_mirror.py, model/transformer.py
semantics) with random weights, vs our TransformerPointer loaded through the
state-dict converter. Catches wiring errors (sublayer order, shared
bidirectional application, final norms) that per-op tests can't."""

import numpy as np
import torch

import jax
import jax.numpy as jnp

# canonical torch mirror (also used by parity_report --reference);
# re-exported here because test_parity.py imports these names
from benchmarks.torch_mirror import (  # noqa: F401
    TorchMirror,
    make_reference_state_dict,
)
from vcrnet_tpu.models.transformer import TransformerPointer
from vcrnet_tpu.train.checkpoint import (
    convert_transformer_state_dict,
    merge_params,
)

D, H, FF = 64, 4, 128


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
