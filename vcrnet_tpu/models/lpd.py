"""LPD embedding pre-training: lazy triplet loss over FPS anchors.

Reference model/lpdnet_model.py:140-229. The data pipeline keeps src/tgt
point correspondence (data.py:304-309), so positives are the same index in
the target embedding and negatives are the k-farthest anchors in xyz space.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcrnet_tpu.config import Config
from vcrnet_tpu.models.vcrnet import make_embedding
from vcrnet_tpu.ops import farthest_point_sample, kfn


def lazy_triplet_loss(src_emb_k, tgt_emb_k, neg_emb, margin: float = 1.0):
    """max(0, 1 - dn / (margin + dp)) per anchor (reference
    lpdnet_model.py:176-188).

    src_emb_k, tgt_emb_k: [B, K, E]; neg_emb: [B, K, neg_k, E].
    """
    dp = jnp.mean((src_emb_k - tgt_emb_k) ** 2, axis=-1)  # [B, K]
    dn = jnp.mean(
        (src_emb_k[:, :, None, :] - neg_emb) ** 2, axis=(-1, -2)
    )  # [B, K] (mean over dims AND negatives, matching the reference's
    #   torch.mean(dim=[1, 3]) on [B, E, K, neg_k])
    return jnp.maximum(0.0, 1.0 - dn / (margin + dp))


def lpd_loss(src, src_emb, tgt_emb, k: int = 32, neg_k: int = 8,
             per_sample: bool = False):
    """Full LPD loss: lazy triplet over FPS anchors + embedding-norm
    regulariser x 0.03 (reference getLoss, lpdnet_model.py:191-229).

    With ``per_sample=True`` returns a [B] vector (per-sample means) so the
    engine can mask padded eval samples; its weighted mean equals the scalar.
    """
    sample_idx = farthest_point_sample(src, k)  # [B, k]
    take = lambda arr, idx: jnp.take_along_axis(arr, idx[:, :, None], axis=1)
    src_k = take(src, sample_idx)  # [B, k, 3]
    src_emb_k = take(src_emb, sample_idx)  # [B, k, E]
    tgt_emb_k = take(tgt_emb, sample_idx)

    # hard negatives: k-farthest anchors in xyz space, embeddings gathered
    # from the TARGET side (reference lpdnet_model.py:202-213)
    far_idx = kfn(src_k, k=neg_k)  # [B, k, neg_k]
    B, K, E = tgt_emb_k.shape
    neg = jnp.take_along_axis(
        tgt_emb_k, far_idx.reshape(B, K * neg_k)[:, :, None], axis=1
    ).reshape(B, K, neg_k, E)

    triplet = lazy_triplet_loss(src_emb_k, tgt_emb_k, neg)  # [B, K]

    src_len = jnp.linalg.norm(src_emb, axis=-1)  # [B, N]
    tgt_len = jnp.linalg.norm(tgt_emb, axis=-1)
    if per_sample:
        norm1 = jnp.sqrt(jnp.mean((src_len - 1.0) ** 2, axis=1))  # [B]
        norm2 = jnp.sqrt(jnp.mean((tgt_len - 1.0) ** 2, axis=1))
        return triplet.mean(axis=1) + (norm1 + norm2) / 2.0 * 0.03
    loss_norm1 = jnp.sqrt(jnp.mean((src_len - 1.0) ** 2))
    loss_norm2 = jnp.sqrt(jnp.mean((tgt_len - 1.0) ** 2))
    return triplet.mean() + (loss_norm1 + loss_norm2) / 2.0 * 0.03


class LPD(nn.Module):
    """__call__(src, tgt) -> (src_emb, tgt_emb, loss, mse, mae)
    (reference lpdnet_model.py:149-161). Uses negative_slope=0.2."""

    cfg: Config

    def setup(self):
        self.emb_nn = make_embedding(self.cfg, for_lpd_pretrain=True)

    def __call__(self, src: jax.Array, tgt: jax.Array, train: bool = False):
        B = src.shape[0]
        src_emb = self.emb_nn(src, train=train)
        tgt_emb = self.emb_nn(tgt, train=train)
        loss = lpd_loss(src, src_emb, tgt_emb)
        mse = jnp.mean((src_emb - tgt_emb) ** 2) * B
        mae = jnp.mean(jnp.abs(src_emb - tgt_emb)) * B
        return src_emb, tgt_emb, loss, mse, mae
