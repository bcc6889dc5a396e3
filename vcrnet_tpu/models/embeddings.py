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


class SplitEdgeDense(nn.Module):
    """Dense over concat(neighbor, center), evaluated in decomposed form.

    An edge-conv's kernel-size-1 conv on [neighbor ; center] splits exactly:
        W @ [n_j ; c_i] + b = (n_j @ A) + (c_i @ B + b),  A = W[:C], B = W[C:]
    so the expensive per-edge [B, N, k, 2C] matmul becomes two per-POINT
    [B, N, C] matmuls; only the (cheap) add happens per edge. The parameter
    tree ({kernel [2C, F], bias [F]}) is identical to the fused nn.Dense, so
    .t7 conversion and checkpoints are unaffected.

    Returns (a, h): neighbor projection [B, N, F] (gather THIS by neighbor
    index) and center projection + bias [B, N, F].
    """

    features: int
    negative_slope: float = 0.0
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jax.Array):
        c = x.shape[-1]
        kernel = self.param(
            "kernel", _kaiming_uniform(self.negative_slope),
            (2 * c, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype)
        a = x @ kernel[:c]
        h = x @ kernel[c:] + bias
        return a, h


class DenseParams(nn.Module):
    """Declares {kernel, bias} with nn.Dense-compatible naming, for layers
    whose weights are consumed by fused Pallas kernels."""

    features: int
    in_features: int
    negative_slope: float = 0.0

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", _kaiming_uniform(self.negative_slope),
            (self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class LPDNet(nn.Module):
    """LPD-Net feature embedding: dynamic graph in feature space + spatial
    neighborhood fusion on the original xyz (reference lpdnet_model.py:103-137).

    Input  [B, N, 3] -> output [B, N, emb_dims].

    TPU-first restructuring (exact math, different factorisation):
      * edge convs are decomposed (see SplitEdgeDense) so matmuls run
        per-point, not per-edge;
      * the SN block fuses entirely into a gather-max: since leaky_relu is
        monotone and the conv decomposes as a_j + h_i,
        max_j leaky(a_j + h_i) = leaky(max_j a_j + h_i) — no [B, N, k, 256]
        tensor is ever built;
      * ``dtype=bfloat16`` runs matmuls on the MXU in bf16 (params stay
        float32) and switches neighbor gathers to one-hot MXU matmuls
        (3.5x faster than XLA gather here, and exact for bf16 data);
      * ``approx_knn`` swaps the exact [B,N,N] top-k for approx_max_k.
    """

    emb_dims: int = 512
    k: int = 20
    negative_slope: float = 0.0  # 0.0 inside VCRNet, 0.2 in LPD pretrain
    t3d: bool = False
    tfea: bool = False
    precision: Any = None
    dtype: Any = None
    approx_knn: bool = False
    int8_train_gathers: bool = False  # int8 one-hot gathers during
    # TRAINING too (straight-through backward); eval is always int8

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        spatial_idx: jax.Array | None = None,
        feature_idx: jax.Array | None = None,
    ) -> jax.Array:
        """``spatial_idx`` optionally supplies precomputed xyz-kNN indices
        [B, N, k] (e.g. cached across eval refinement iterations — rigid
        transforms preserve distances, so the spatial neighbor sets of a
        transformed cloud equal the original's).

        ``feature_idx`` optionally supplies precomputed FEATURE-space kNN
        indices for the DG block. Unlike spatial reuse this is an
        APPROXIMATION when the input cloud has changed (pointwise features
        are not rigid-invariant); gated by Config.reuse_feature_knn for
        eval refinement, where the near-aligned iterations 2+ barely move
        the feature graph."""
        from vcrnet_tpu.ops.graph import gather_neighbors, gather_max_neighbors

        act = lambda v: nn.leaky_relu(v, self.negative_slope)
        dense = lambda feats, name: nn.Dense(
            feats,
            name=name,
            dtype=self.dtype,
            kernel_init=_kaiming_uniform(self.negative_slope),
            bias_init=nn.initializers.zeros,
        )
        gather_method = "onehot" if self.dtype == jnp.bfloat16 else "gather"

        x_init_3d = x
        if self.t3d:
            trans = TransformNet(
                k=3, negative_slope=self.negative_slope, name="t_net3d"
            )(x, train=train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans, precision=self.precision)

        x = act(dense(64, "conv1_lpd")(x))
        x = act(dense(64, "conv2_lpd")(x))

        if self.tfea:
            trans = TransformNet(
                k=64, negative_slope=self.negative_slope, name="t_net_fea"
            )(x, train=train)
            x = jnp.einsum("bnc,bcd->bnd", x, trans, precision=self.precision)

        # fully-fused Pallas path: kNN + neighbor combine in VMEM. Used for
        # BOTH eval and training — the ops carry custom-VJP Pallas backward
        # kernels (see ops/pallas_edgeconv.py), so no [B, N, k, F] edge
        # tensor is materialised in either direction. The XLA formulation
        # below is the same math (used off-TPU / float32-exact paths).
        use_fused = (
            self.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and x.shape[1] % 8 == 0  # Mosaic sublane tiling constraint
        )

        # dynamic graph in feature space (reference convDG1/convDG2)
        a, h = SplitEdgeDense(
            128, self.negative_slope, dtype=self.dtype, name="convDG1"
        )(x)
        k2, b2 = DenseParams(128, 128, self.negative_slope, name="convDG2")()
        if self.dtype is not None:
            k2 = k2.astype(self.dtype)
            b2 = b2.astype(self.dtype)
        # int8 one-hot gathers: always at eval; during training only when
        # opted in (the backward then recomputes from the same quantized
        # table — straight-through gradient, ops/pallas_edgeconv.py)
        int8_gather = (not train) or self.int8_train_gathers
        if use_fused:
            from vcrnet_tpu.ops.pallas_edgeconv import (
                edge_conv_from_idx, fused_edge_conv,
            )

            if feature_idx is not None:
                x1, x2 = edge_conv_from_idx(
                    feature_idx, a, h, k2, b2,
                    negative_slope=self.negative_slope,
                    int8_gather=int8_gather,
                )
            elif not train:
                # the kernel materialises its selection anyway; expose it
                # so eval refinement loops can reuse it (return_idx
                # bypasses the VJP — eval only)
                x1, x2, idx_f = fused_edge_conv(
                    x, a, h, k2, b2, k=self.k,
                    negative_slope=self.negative_slope,
                    int8_gather=int8_gather, return_idx=True,
                )
                self.sow("intermediates", "feature_idx", idx_f)
            else:
                x1, x2 = fused_edge_conv(
                    x, a, h, k2, b2, k=self.k,
                    negative_slope=self.negative_slope,
                    int8_gather=int8_gather,
                )
        else:
            if feature_idx is not None:
                idx_f = feature_idx
            else:
                idx_f = knn(
                    x, k=self.k, precision=self.precision,
                    approx=self.approx_knn,
                )
                self.sow("intermediates", "feature_idx", idx_f)
            a_nb = gather_neighbors(a, idx_f, method=gather_method)
            z = act(a_nb + h[:, :, None, :])  # [B,N,k,128]
            x1 = z.max(axis=2)  # [B,N,128]
            z = act(z @ k2 + b2)  # plain conv on the edge tensor
            x2 = z.max(axis=2)  # [B,N,128]

        # spatial neighborhood fusion on ORIGINAL xyz (reference convSN1):
        # fully fused to gather-max by monotonicity of leaky_relu
        a2, h2 = SplitEdgeDense(
            256, self.negative_slope, dtype=self.dtype, name="convSN1"
        )(x2)
        if use_fused:
            if spatial_idx is not None:
                from vcrnet_tpu.ops.pallas_edgeconv import gather_max_from_idx

                x3 = act(
                    gather_max_from_idx(
                        spatial_idx, a2, int8_gather=int8_gather
                    )
                    + h2
                )
            else:
                from vcrnet_tpu.ops.pallas_edgeconv import fused_knn_gather_max

                gm, sn_idx = fused_knn_gather_max(
                    x_init_3d, a2, k=self.k, return_idx=True,
                    int8_gather=int8_gather,
                )
                x3 = act(gm + h2)
                # expose the spatial selection so eval refinement loops can
                # reuse it (apply with mutable=['intermediates'] to collect)
                self.sow("intermediates", "spatial_idx", sn_idx)
        else:
            if spatial_idx is not None:
                idx_s = spatial_idx
            else:
                idx_s = knn(
                    x_init_3d, k=self.k, precision=self.precision,
                    approx=self.approx_knn,
                )
                self.sow("intermediates", "spatial_idx", idx_s)
            x3 = act(gather_max_neighbors(a2, idx_s, method=gather_method) + h2)

        x = jnp.concatenate([x1, x2, x3], axis=-1)  # [B,N,512]
        return act(dense(self.emb_dims, "conv3_lpd")(x))


class TransformNet(nn.Module):
    """PointNet-style k x k input/feature alignment (T-Net).

    Reference model/lpdnet_model.py:19-70. Gated by --t3d / --tfea.

    Init parity with reference initNet (util/initPara.py:38-55): the conv
    weights get kaiming-uniform at the parent LPDNet's leaky slope; the fc
    (nn.Linear) weights get normal(std=1e-3) with zero bias. (initNet leaves
    conv biases at torch's default; we keep flax's zeros — the convs feed
    BatchNorm, which absorbs any constant bias.)
    """

    k: int = 3
    negative_slope: float = 0.0

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        conv = lambda feats, name: nn.Dense(
            feats, name=name,
            kernel_init=_kaiming_uniform(self.negative_slope),
            bias_init=nn.initializers.zeros,
        )
        fc = lambda feats, name: nn.Dense(
            feats, name=name,
            kernel_init=nn.initializers.normal(1e-3),
            bias_init=nn.initializers.zeros,
        )
        x = nn.relu(bn("bn1")(conv(64, "conv1")(x)))
        x = nn.relu(bn("bn2")(conv(128, "conv2")(x)))
        x = nn.relu(bn("bn3")(conv(1024, "conv3")(x)))
        x = x.max(axis=1)  # global max pool over points -> [B, 1024]
        x = nn.relu(bn("bn4")(fc(512, "fc1")(x)))
        x = nn.relu(bn("bn5")(fc(256, "fc2")(x)))
        x = fc(self.k * self.k, "fc3")(x)
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
    def __call__(
        self,
        x: jax.Array,
        train: bool = False,
        spatial_idx: jax.Array | None = None,
    ) -> jax.Array:
        """``spatial_idx`` optionally supplies the precomputed xyz-kNN
        selection ([B, N, k] int32). DGCNN's graph is built on the INPUT
        coordinates, so it is exactly rigid-invariant — eval refinement
        loops cache iteration 1's selection (sown as 'spatial_idx', the
        same contract as LPDNet)."""
        bn = lambda name: nn.BatchNorm(
            use_running_average=not train, momentum=0.9, epsilon=1e-5, name=name
        )
        dense = lambda feats, name: nn.Dense(
            feats, use_bias=False, name=name, dtype=self.dtype
        )

        B, N, _ = x.shape
        if spatial_idx is not None:
            idx = spatial_idx
        else:
            idx = knn(
                x, k=self.k, precision=self.precision, approx=self.approx_knn
            )
            self.sow("intermediates", "spatial_idx", idx)
        if (
            not train
            and self.dtype == jnp.bfloat16
            and jax.default_backend() == "tpu"
            and not self.is_initializing()
        ):
            from vcrnet_tpu.ops.pallas_dgcnn import (
                fold_dgcnn_eval_params, fused_dgcnn_eval,
                fused_dgcnn_supported,
            )

            if fused_dgcnn_supported(N, self.k, self.emb_dims):
                # whole 4-stage edge-conv chain + projection as ONE Pallas
                # program per (batch, tile): the XLA path writes ~2.7 GB of
                # [B, N, k, C] intermediates to HBM per cloud (13.9 ms at
                # B=64 vs ~1.5 ms of matmul FLOPs). Eval-mode BN is an
                # affine and folds into each stage's weights.
                v = self.variables
                folded = fold_dgcnn_eval_params(
                    v["params"], v["batch_stats"]
                )
                return fused_dgcnn_eval(x, idx, folded, self.emb_dims)
        g = graph_feature(
            x, idx=idx, k=self.k, precision=self.precision,
            approx=self.approx_knn,
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
