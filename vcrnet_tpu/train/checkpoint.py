"""Checkpointing: best + per-epoch saves, resume, and the .t7 converter.

Capability upgrade over the reference: the reference saves only the model
state_dict (model/vcrnet_model.py:934-937, 1012-1015) so "resume" restarts
the optimizer and LR schedule from scratch; here the full TrainState
(params + batch_stats + optimizer state + step) round-trips through
flax msgpack serialization.

``load_t7_params`` converts the shipped PyTorch checkpoint
(pretrained/lpd-pretrained.t7, 12 tensors, all LPDNet kernel-size-1 convs —
see SURVEY.md C28) into this framework's param tree: conv1d/2d k=1 weights
[out, in, 1(,1)] become Dense kernels [in, out].
"""

from __future__ import annotations

import os
import pickle
from typing import Any

import numpy as np

import jax
from flax import serialization


def save_checkpoint(directory: str, name: str, state) -> str:
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, f"{name}.msgpack")
    # pull to host before serialising
    host_state = jax.device_get(state)
    data = serialization.to_bytes(host_state)
    with open(path, "wb") as f:
        f.write(data)
    return path


def load_checkpoint(path: str, template):
    """Restore into a template TrainState (same tree structure)."""
    with open(path, "rb") as f:
        data = f.read()
    return serialization.from_bytes(template, data)


def save_params(path: str, params) -> None:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(jax.device_get(params)))


def load_params(path: str, template):
    with open(path, "rb") as f:
        return serialization.from_bytes(template, f.read())


# ---------------------------------------------------------------------------
# PyTorch .t7 conversion
# ---------------------------------------------------------------------------


def _conv_kernel_to_dense(w: np.ndarray) -> np.ndarray:
    """torch conv k=1 weight [out, in, 1] or [out, in, 1, 1] -> flax Dense
    kernel [in, out]."""
    w = np.asarray(w)
    while w.ndim > 2:
        w = w[..., 0]
    return np.ascontiguousarray(w.T)


# torch module path -> (flax param path builder)
_LPDNET_KEYS = {
    "conv1_lpd": "conv1_lpd",
    "conv2_lpd": "conv2_lpd",
    "conv3_lpd": "conv3_lpd",
    "convDG1.0": "convDG1",
    "convDG2.0": "convDG2",
    "convSN1.0": "convSN1",
}


def convert_lpdnet_state_dict(sd: dict, prefix: str = "emb_nn.") -> dict:
    """Map the reference LPDNet torch state_dict into the flax LPDNet param
    tree {layer: {kernel, bias}}. Keys it cannot map are skipped (the
    reference loads with strict=False, util/initPara.py:254)."""
    out: dict = {}
    for torch_key, flax_name in _LPDNET_KEYS.items():
        wk = f"{prefix}{torch_key}.weight"
        bk = f"{prefix}{torch_key}.bias"
        if wk not in sd:
            continue
        layer = {"kernel": _conv_kernel_to_dense(sd[wk])}
        if bk in sd:
            layer["bias"] = np.asarray(sd[bk])
        out[flax_name] = layer
    return out


def load_t7_lpdnet(path: str, prefix: str = "emb_nn.") -> dict:
    """Load a .t7 LPDNet checkpoint (requires torch, CPU) -> flax params."""
    import torch

    sd = torch.load(path, map_location="cpu")
    sd = {k: v.numpy() for k, v in sd.items()}
    return convert_lpdnet_state_dict(sd, prefix=prefix)


def merge_pretrained_embedding(params: dict, emb_params: dict) -> dict:
    """Graft converted LPDNet params into a model param tree under 'emb_nn'
    (non-strict, like the reference's strict=False load)."""
    params = jax.tree_util.tree_map(lambda x: x, params)  # shallow copy tree
    target = dict(params["emb_nn"])
    for name, layer in emb_params.items():
        if name in target:
            cur = dict(target[name])
            for pk, pv in layer.items():
                if pk in cur and cur[pk].shape == pv.shape:
                    cur[pk] = pv.astype(np.asarray(cur[pk]).dtype)
            target[name] = cur
    params = dict(params)
    params["emb_nn"] = target
    return params
