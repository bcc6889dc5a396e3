"""Point-cloud embedding backbones: LPDNet, DGCNN, PointNet, TransformNet.

One implementation each (the reference duplicates PointNet/DGCNN across
model/vcrnet_model.py:65-123 and model/dcp_model.py:21-79). Channels-last
[B, N, C]; every kernel-size-1 conv in the reference is a Dense matmul here
(same math, MXU-shaped). Submodule names match the reference state-dict keys
so the .t7 converter is a pure layout transform.

Capability parity:
  LPDNet       reference model/lpdnet_model.py:73-137
  TransformNet reference model/lpdnet_model.py:19-70
  DGCNN        reference model/vcrnet_model.py:90-123
  PointNet     reference model/vcrnet_model.py:65-87
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from vcrnet_tpu.ops import graph_feature, knn


def _kaiming_uniform(negative_slope: float):
    """fan_in kaiming-uniform for leaky_relu, matching torch
    nn.init.kaiming_uniform_ (reference util/initPara.py:44-46)."""

    def init(key, shape, dtype=jnp.float32):
        # flax Dense kernel shape = (fan_in, fan_out)
        fan_in = shape[0]
        gain = (2.0 / (1.0 + negative_slope**2)) ** 0.5
        bound = gain * (3.0 / fan_in) ** 0.5
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class LPDNet(nn.Module):
    """LPD-Net feature embedding: dynamic graph in feature space + spatial
    neighborhood fusion on the original xyz (reference lpdnet_model.py:103-137).

    Input  [B, N, 3] -> output [B, N, emb_dims].

    ``dtype=bfloat16`` runs the Dense matmuls on the MXU in bf16 (params stay
    float32); ``approx_knn`` swaps the exact [B,N,N] top-k for the
    TPU-optimised approx_max_k.
    """

    emb_dims: int = 512
    k: int = 20
    negative_slope: float = 0.0  # 0.0 inside VCRNet, 0.2 in LPD pretrain
    t3d: bool = False
    tfea: bool = False
    precision: Any = None
    dtype: Any = None
    approx_knn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        act = lambda v: nn.leaky_relu(v, self.negative_slope)
        dense = lambda feats, name: nn.Dense(
            feats,
            name=name,
            dtype=self.dtype,
            kernel_init=_kaiming_uniform(self.negative_slope),
            bias_init=nn.initializers.zeros,
        )

        x_init_3d = x
        if self.t3d:
            trans = TransformNet(k=3, name="t_net3d")(x, train=train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans, precision=self.precision)

        x = act(dense(64, "conv1_lpd")(x))
        x = act(dense(64, "conv2_lpd")(x))

        if self.tfea:
            trans = TransformNet(k=64, name="t_net_fea")(x, train=train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans, precision=self.precision)

        # dynamic graph in feature space
        gf = graph_feature(
            x, k=self.k, precision=self.precision, approx=self.approx_knn
        )  # [B,N,k,128]
        x = act(dense(128, "convDG1")(gf))
        x1 = x.max(axis=2)  # [B,N,128]
        x = act(dense(128, "convDG2")(x))
        x2 = x.max(axis=2)  # [B,N,128]

        # spatial neighborhood fusion: kNN on the ORIGINAL xyz coords
        idx = knn(
            x_init_3d, k=self.k, precision=self.precision,
            approx=self.approx_knn,
        )
        gf = graph_feature(x2, idx=idx)  # [B,N,k,256]
        x = act(dense(256, "convSN1")(gf))
        x3 = x.max(axis=2)  # [B,N,256]

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # [B,N,512]
        return act(dense(self.emb_dims, "conv3_lpd")(x))


class TransformNet(nn.Module):
    """PointNet-style k x k input/feature alignment (T-Net).

    Reference model/lpdnet_model.py:19-70. Gated by --t3d / --tfea.
    """

    k: int = 3

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        x = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Dense(1024, name="conv3")(x)))
        x = x.max(axis=1)  # global max pool over points -> [B, 1024]
        x = nn.relu(bn("bn4")(nn.Dense(512, name="fc1")(x)))
        x = nn.relu(bn("bn5")(nn.Dense(256, name="fc2")(x)))
        x = nn.Dense(self.k * self.k, name="fc3")(x)
        iden = jnp.eye(self.k, dtype=x.dtype).reshape(1, -1)
        return (x + iden).reshape(-1, self.k, self.k)


class DGCNN(nn.Module):
    """4 edge-conv blocks, multi-scale concat (reference vcrnet_model.py:90-123)."""

    emb_dims: int = 512
    k: int = 20
    precision: Any = None
    dtype: Any = None
    approx_knn: bool = False

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, name=name, dtype=self.dtype
        )

        B, N, _ = x.shape
        g = graph_feature(
            x, k=self.k, precision=self.precision, approx=self.approx_knn
        )  # [B,N,k,6]

        x = nn.relu(bn("bn1")(dense(64, "conv1")(g)))
        x1 = x.max(axis=2)
        x = nn.relu(bn("bn2")(dense(64, "conv2")(x)))
        x2 = x.max(axis=2)
        x = nn.relu(bn("bn3")(dense(128, "conv3")(x)))
        x3 = x.max(axis=2)
        x = nn.relu(bn("bn4")(dense(256, "conv4")(x)))
        x4 = x.max(axis=2)

        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B,N,512]
        return nn.relu(bn("bn5")(dense(self.emb_dims, "conv5")(x)))


class PointNet(nn.Module):
    """5 pointwise conv+BN+ReLU stacks (reference vcrnet_model.py:65-87)."""

    emb_dims: int = 512

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        for i, feats in enumerate([64, 64, 64, 128, self.emb_dims], start=1):
            x = nn.Dense(feats, use_bias=False, name=f"conv{i}")(x)
            x = nn.relu(bn(f"bn{i}")(x))
        return x
