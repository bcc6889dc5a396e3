"""DCP baseline: embedding + pointer + (SVD | MLP-quaternion) head.

Reference model/dcp_model.py:177-223. The reference's ``args.use_mFea`` is
read but never defined (dcp_model.py:124 — an AttributeError as shipped);
this rebuild fixes it to the only working behaviour (xyz-only inputs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcrnet_tpu import geometry
from vcrnet_tpu.config import Config
from vcrnet_tpu.models.vcrnet import (
    make_embedding, _precision, _dtype, _use_flash, _use_int8,
)
from vcrnet_tpu.models.transformer import TransformerPointer


class MLPHead(nn.Module):
    """Global-feature quaternion regression head (reference
    dcp_model.py:82-107)."""

    emb_dims: int = 512

    @nn.compact
    def __call__(self, src_emb, tgt_emb, train: bool = False):
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        x = jnp.concatenate([src_emb, tgt_emb], axis=-1)  # [B, N, 2E]
        x = x.max(axis=1)  # global max over points -> [B, 2E]
        d = self.emb_dims
        x = nn.relu(bn("bn1")(nn.Dense(d // 2, name="fc1")(x)))
        x = nn.relu(bn("bn2")(nn.Dense(d // 4, name="fc2")(x)))
        x = nn.relu(bn("bn3")(nn.Dense(d // 8, name="fc3")(x)))
        rot = nn.Dense(4, name="proj_rot")(x)
        rot = rot / jnp.linalg.norm(rot, axis=-1, keepdims=True)
        t = nn.Dense(3, name="proj_trans")(x)
        return geometry.quat2mat(rot), t


def svd_head_corr(src_emb, tgt_emb, src, tgt, precision=None):
    """DCP's fused scaled-dot soft correspondence + Procrustes (reference
    dcp_model.py:139-174)."""
    d_k = src_emb.shape[-1]
    scores = (
        jnp.einsum("bnc,bmc->bnm", src_emb, tgt_emb, precision=precision)
        / jnp.sqrt(jnp.asarray(d_k, src_emb.dtype))
    )
    scores = jax.nn.softmax(scores, axis=2)
    src_corr = jnp.einsum("bnm,bmc->bnc", scores, tgt, precision=precision)
    R, t = geometry.procrustes(src, src_corr)
    return R, t, src, src_corr


class DCP(nn.Module):
    """__call__(src, tgt) -> (R_ab, t_ab, R_ba, t_ba, src, src_corr)
    (reference dcp_model.py:205-223)."""

    cfg: Config

    def setup(self):
        cfg = self.cfg
        self.emb_nn = make_embedding(cfg)
        if cfg.pointer == "transformer":
            self.pointer = TransformerPointer(
                emb_dims=cfg.emb_dims,
                n_blocks=cfg.n_blocks,
                n_heads=cfg.n_heads,
                ff_dims=cfg.ff_dims,
                partial=cfg.partial,
                overlap2=cfg.overlap2,
                precision=_precision(cfg),
                dtype=_dtype(cfg),
                flash=_use_flash(cfg),
                int8=_use_int8(cfg),
                dropout_rate=cfg.dropout,
            )
        elif cfg.pointer == "identity":
            self.pointer = None
        else:
            raise ValueError(f"unknown pointer: {cfg.pointer}")
        if cfg.head == "mlp":
            self.mlp_head = MLPHead(emb_dims=cfg.emb_dims)
        elif cfg.head != "svd":
            raise ValueError(f"unknown head: {cfg.head}")

    def __call__(self, src: jax.Array, tgt: jax.Array, train: bool = False):
        cfg = self.cfg
        src_emb = self.emb_nn(src, train=train)
        tgt_emb = self.emb_nn(tgt, train=train)

        if self.pointer is not None:
            src_delta, tgt_delta = self.pointer(src_emb, tgt_emb, train=train)
            src_emb = src_emb + src_delta
            tgt_emb = tgt_emb + tgt_delta

        if cfg.head == "svd":
            R_ab, t_ab, src_out, src_corr = svd_head_corr(
                src_emb, tgt_emb, src, tgt, precision=_precision(cfg)
            )
        else:
            R_ab, t_ab = self.mlp_head(src_emb, tgt_emb, train=train)
            src_out, src_corr = src, src

        if cfg.cycle:
            if cfg.head == "svd":
                R_ba, t_ba, _, _ = svd_head_corr(
                    tgt_emb, src_emb, tgt, src, precision=_precision(cfg)
                )
            else:
                R_ba, t_ba = self.mlp_head(tgt_emb, src_emb, train=train)
        else:
            R_ba, t_ba = geometry.invert_transform(R_ab, t_ab)

        return R_ab, t_ab, R_ba, t_ba, src_out, src_corr
