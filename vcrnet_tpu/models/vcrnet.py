"""VCR-Net assembly + eval-time refinement loops.

Reference model/vcrnet_model.py:463-518 (assembly), 21-43 (vcrnetIter),
46-62 (ICP post-refinement). The SVD head is the shared batched Procrustes
solve from geometry.py — no per-item python SVD loop.
"""

from __future__ import annotations



import jax
import jax.numpy as jnp
from flax import linen as nn

from vcrnet_tpu import geometry
from vcrnet_tpu.config import Config
from vcrnet_tpu.models.embeddings import LPDNet, DGCNN, PointNet
from vcrnet_tpu.models.transformer import TransformerPointer
from vcrnet_tpu.models import heads
from vcrnet_tpu.models.icp import icp_register


def make_embedding(cfg: Config, for_lpd_pretrain: bool = False):
    precision = _precision(cfg)
    dtype = _dtype(cfg)
    if cfg.emb_nn == "pointnet":
        return PointNet(emb_dims=cfg.emb_dims)
    if cfg.emb_nn == "dgcnn":
        return DGCNN(
            emb_dims=cfg.emb_dims,
            precision=precision,
            dtype=dtype,
            approx_knn=cfg.approx_knn,
        )
    if cfg.emb_nn == "lpdnet":
        return LPDNet(
            emb_dims=cfg.emb_dims,
            negative_slope=0.2 if for_lpd_pretrain else 0.0,
            t3d=cfg.t3d,
            tfea=cfg.tfea,
            precision=precision,
            dtype=dtype,
            approx_knn=cfg.approx_knn,
            int8_train_gathers=cfg.int8_train_gathers,
        )
    raise ValueError(f"unknown emb_nn: {cfg.emb_nn}")


def _precision(cfg: Config):
    # bfloat16 MXU path for the big matmuls; float32 for exact parity
    return (
        jax.lax.Precision.DEFAULT
        if cfg.compute_dtype == "bfloat16"
        else jax.lax.Precision.HIGHEST
    )


def _dtype(cfg: Config):
    return jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None


def _use_int8(cfg: Config) -> bool:
    """Dynamic-int8 pointer projections: eval fast path only. Pure XLA
    (int8 dot_general), so unlike flash it also runs off-TPU — tests
    exercise it on CPU."""
    return cfg.int8_eval and cfg.compute_dtype == "bfloat16"


def _use_flash(cfg: Config) -> bool:
    """Pallas flash attention: fast path only, and only where a TPU backend
    is actually present (the kernel doesn't run on CPU)."""
    if cfg.compute_dtype != "bfloat16":
        return False
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


class VCRNet(nn.Module):
    """embed -> transformer pointer (residual) -> VCP head -> SVD solve.

    __call__(src, tgt) with src/tgt [B, N, 3] returns
    (srcK, src_corrK, R_ab, t_ab, R_ba, t_ba) like reference
    vcrnet_model.py:495-518.
    """

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
        if cfg.vcp_nn == "att":
            self.vcp_att = heads.VcpAtt(
                emb_dims=cfg.emb_dims, precision=_precision(cfg)
            )

    def _vcp(self, src_emb, tgt_emb, src, tgt, train: bool = False):
        cfg = self.cfg
        precision = _precision(cfg)
        if cfg.vcp_nn == "topK":
            if cfg.partial:
                return heads.vcp_top_k_partial(
                    src_emb, tgt_emb, src, tgt, cfg.overlap2, precision=precision
                )
            on_tpu_bf16 = (
                _dtype(cfg) == jnp.bfloat16
                and jax.default_backend() == "tpu"
                and src.shape[1] % 8 == 0
                and tgt.shape[1] % 8 == 0
            )
            if on_tpu_bf16 and not train:
                from vcrnet_tpu.ops.pallas_vcp import (
                    streaming_soft_correspondence,
                )

                corr = streaming_soft_correspondence(src_emb, tgt_emb, tgt)
                return src, corr
            if on_tpu_bf16 and train and cfg.streaming_vcp_train:
                from vcrnet_tpu.ops.pallas_vcp import (
                    soft_correspondence_vjp, streaming_vjp_supported,
                )

                if streaming_vjp_supported(
                    src.shape[1], tgt.shape[1], src_emb.shape[-1]
                ):
                    # differentiable streaming path: the XLA formulation
                    # below materialises the [B, Ns, Nt] probabilities in
                    # HBM twice (fwd + bwd, ~270 MB each at B=64 N=1024);
                    # the custom-VJP kernel pair keeps memory O(N)
                    corr = soft_correspondence_vjp(src_emb, tgt_emb, tgt)
                    return src, corr
            return heads.vcp_top_k_whole(
                src_emb, tgt_emb, src, tgt, precision=precision
            )
        if cfg.vcp_nn == "dist":
            return heads.vcp_by_dis(src_emb, tgt_emb, src, tgt, precision=precision)
        if cfg.vcp_nn == "att":
            return self.vcp_att(src_emb, tgt_emb, src, tgt)
        raise ValueError(f"unknown vcp_nn: {self.cfg.vcp_nn}")

    def embed(
        self,
        x: jax.Array,
        train: bool = False,
        spatial_idx: jax.Array | None = None,
        feature_idx: jax.Array | None = None,
    ) -> jax.Array:
        """Embedding only — exposed so eval refinement loops can cache the
        (unchanging) target embedding across iterations. ``spatial_idx`` /
        ``feature_idx`` optionally supply precomputed kNN selections
        (spatial: LPDNet + DGCNN, both exactly rigid-invariant;
        feature_idx: LPDNet only — see LPDNet.__call__ for the
        exact-vs-approximate distinction)."""
        kw = {}
        if spatial_idx is not None:
            kw["spatial_idx"] = spatial_idx
        if feature_idx is not None:
            kw["feature_idx"] = feature_idx
        return self.emb_nn(x, train=train, **kw)

    def register_embedded(
        self,
        src: jax.Array,
        tgt: jax.Array,
        src_emb: jax.Array,
        tgt_emb: jax.Array,
        train: bool = False,
        tgt_memory: jax.Array | None = None,
    ):
        """pointer -> VCP -> SVD on precomputed embeddings. ``tgt_memory``
        optionally supplies a cached encoder pass over tgt_emb (exact: the
        target embedding never changes across refinement iterations)."""
        return self._register(
            src, tgt, src_emb, tgt_emb, train, tgt_memory=tgt_memory
        )

    def encode_target(self, tgt_emb: jax.Array) -> jax.Array:
        """The pointer's encoder pass over the target embedding — cacheable
        across eval refinement iterations (see vcrnet_iter)."""
        return self.pointer.encode_memory(tgt_emb)

    def __call__(self, src: jax.Array, tgt: jax.Array, train: bool = False):
        # embed both clouds in ONE call (stacked on the batch axis): halves
        # kernel-launch count and doubles per-kernel parallelism vs the
        # reference's two sequential embedding passes (vcrnet_model.py:499-500).
        # Not done when a BatchNorm embedding trains — stacking would pool
        # the two clouds' batch statistics (LPDNet has no BN; eval-mode BN
        # uses running averages, so stacking is exact there).
        if self.cfg.emb_nn == "lpdnet" or not train:
            both = jnp.concatenate([src, tgt], axis=0)
            emb = self.emb_nn(both, train=train)
            src_emb, tgt_emb = jnp.split(emb, 2, axis=0)
        else:
            src_emb = self.emb_nn(src, train=train)
            tgt_emb = self.emb_nn(tgt, train=train)
        return self._register(src, tgt, src_emb, tgt_emb, train)

    def _register(self, src, tgt, src_emb, tgt_emb, train, tgt_memory=None):
        if self.pointer is not None:
            src_delta, tgt_delta = self.pointer(
                src_emb, tgt_emb, tgt_memory=tgt_memory, train=train
            )
            src_emb = src_emb + src_delta
            tgt_emb = tgt_emb + tgt_delta

        src_k, src_corr_k = self._vcp(src_emb, tgt_emb, src, tgt, train=train)
        R_ab, t_ab = geometry.procrustes(src_k, src_corr_k)

        if self.cfg.cycle:
            tgt_k, tgt_corr_k = self._vcp(tgt_emb, src_emb, tgt, src, train=train)
            R_ba, t_ba = geometry.procrustes(tgt_k, tgt_corr_k)
        else:
            R_ba, t_ba = geometry.invert_transform(R_ab, t_ab)

        return src_k, src_corr_k, R_ab, t_ab, R_ba, t_ba


def _find_sown(tree, name):
    """Depth-first search of a flax 'intermediates' collection for the
    first value sown under ``name`` (sow stores tuples; returns element 0).
    Returns None if absent (e.g. a non-LPDNet embedding)."""
    if isinstance(tree, dict):
        for key, val in tree.items():
            if key == name:
                return val[0] if isinstance(val, tuple) else val
            found = _find_sown(val, name)
            if found is not None:
                return found
    return None


def vcrnet_iter(apply_fn, variables, src, tgt, n_iter: int, model=None):
    """Iterative eval-time refinement (reference vcrnetIter,
    vcrnet_model.py:21-43): re-run the net on the transformed source and
    compose. n_iter is static (small), so a python loop unrolls under jit.

    When ``model`` is given, three iteration-invariant quantities are
    computed ONCE and cached:
      * the target embedding (the target never changes),
      * the pointer's encoder pass over it,
      * the SOURCE's spatial (xyz) kNN indices — rigid transforms preserve
        pairwise distances, so the transformed source's spatial neighbor
        sets equal the original's (LPDNet and DGCNN).
    All three are exact in exact arithmetic (the reference recomputes them
    every pass), and together cut per-iteration cost by the full
    target-embedding + target-encoder + spatial-kNN time.

    With ``model.cfg.reuse_feature_knn`` the source's FEATURE-space kNN
    selection (the DG block's dynamic graph) is also reused across later
    iterations — an APPROXIMATION (pointwise features are not
    rigid-invariant). ``model.cfg.feature_knn_refresh`` sets how many
    leading iterations compute a fresh graph before reuse starts (1 =
    reuse iteration 1's graph everywhere; 2 = refresh once on the
    near-aligned iteration-2 cloud, measurably closer to exact). Accuracy
    is A/B'd like the other fast-profile knobs (bench.py --accuracy).

    With ``model.cfg.refine_subsample = M`` (whole mode only) iterations
    2+ run on the first M points of each cloud: iteration 1's full-size
    pass does the heavy lifting, and the later iterations only estimate a
    small residual transform, which needs far fewer correspondences. The
    subsampled target embedding/encoder pass is computed once, and the
    subsampled source's spatial kNN is sown on the first subsampled
    iteration and reused after (exact within the subsample — the same
    point rows are re-embedded under a rigid transform each time). Also
    an approximation knob; M >= N degrades to the exact cached path.
    """
    transformed = src
    R_final = None
    t_final = None
    out = None
    tgt_emb = None
    tgt_memory = None
    reuse_feat = model is not None and getattr(
        model.cfg, "reuse_feature_knn", False
    )
    refresh = max(1, getattr(model.cfg, "feature_knn_refresh", 1)) if (
        reuse_feat
    ) else 1
    sub = 0
    if model is not None and not model.cfg.partial and n_iter > 1:
        sub = min(
            max(0, getattr(model.cfg, "refine_subsample", 0) or 0),
            src.shape[1],
        )

    def embed_src(x, spatial_idx, feature_idx, fresh_graph):
        """One source-embedding pass; a fresh-graph pass sows the
        selections it computes anyway (spatial xyz-kNN and the DG feature
        graph) so later iterations can reuse them."""
        if fresh_graph and model.cfg.emb_nn in ("lpdnet", "dgcnn"):
            emb, sown = model.apply(
                variables, x, method=VCRNet.embed,
                mutable=["intermediates"], spatial_idx=spatial_idx,
            )
            inter = sown.get("intermediates", {})
            if spatial_idx is None:
                spatial_idx = _find_sown(inter, "spatial_idx")
            if reuse_feat:
                feature_idx = _find_sown(inter, "feature_idx")
            return emb, spatial_idx, feature_idx
        emb = model.apply(
            variables, x, method=VCRNet.embed,
            spatial_idx=spatial_idx, feature_idx=feature_idx,
        )
        return emb, spatial_idx, feature_idx

    if model is not None:
        tgt_emb = model.apply(variables, tgt, method=VCRNet.embed)
        if model.cfg.pointer == "transformer":
            tgt_memory = model.apply(
                variables, tgt_emb, method=VCRNet.encode_target
            )
    # per-size caches: [0] = full clouds (iteration 1), [1] = subsample
    sp_idx = [None, None]
    ft_idx = [None, None]
    tgt_cache = [(tgt, tgt_emb, tgt_memory), None]
    for i in range(n_iter):
        if model is None:
            out = apply_fn(variables, transformed, tgt)
        else:
            use_sub = sub > 0 and sub < tgt.shape[1] and i >= 1
            if use_sub and tgt_cache[1] is None:
                tgt_s = tgt[:, :sub]
                tgt_emb_s = model.apply(variables, tgt_s, method=VCRNet.embed)
                tgt_mem_s = None
                if model.cfg.pointer == "transformer":
                    tgt_mem_s = model.apply(
                        variables, tgt_emb_s, method=VCRNet.encode_target
                    )
                tgt_cache[1] = (tgt_s, tgt_emb_s, tgt_mem_s)
            c = 1 if use_sub else 0
            cur_src = transformed[:, :sub] if use_sub else transformed
            # fresh feature graph on the first pass at this size, and on
            # the leading `refresh` iterations when reuse is enabled
            fresh = sp_idx[c] is None or (reuse_feat and i < refresh)
            src_emb, sp_idx[c], ft_idx[c] = embed_src(
                cur_src, sp_idx[c], ft_idx[c], fresh
            )
            cur_tgt, cur_tgt_emb, cur_tgt_mem = tgt_cache[c]
            out = model.apply(
                variables, cur_src, cur_tgt, src_emb, cur_tgt_emb,
                method=VCRNet.register_embedded, tgt_memory=cur_tgt_mem,
            )
        src_k, src_corr_k, R_ab, t_ab, _, _ = out
        transformed = geometry.transform_points(transformed, R_ab, t_ab)
        if R_final is None:
            R_final, t_final = R_ab, t_ab
        else:
            R_final, t_final = geometry.compose_transforms(R_ab, t_ab, R_final, t_final)
    R_ba, t_ba = geometry.invert_transform(R_final, t_final)
    return out[0], out[1], R_final, t_final, R_ba, t_ba


def vcrnet_icp(apply_fn, variables, src, tgt, max_iterations: int):
    """Net once, then classical ICP refinement, composed (reference
    vcrnetIcpNet, vcrnet_model.py:46-62)."""
    src_k, src_corr_k, R_ab, t_ab, _, _ = apply_fn(variables, src, tgt)
    transformed = geometry.transform_points(src, R_ab, t_ab)
    _, _, R_icp, t_icp, _, _ = icp_register(
        transformed, tgt, max_iterations=max_iterations
    )
    R_ab, t_ab = geometry.compose_transforms(R_icp, t_icp, R_ab, t_ab)
    R_ba, t_ba = geometry.invert_transform(R_ab, t_ab)
    return src_k, src_corr_k, R_ab, t_ab, R_ba, t_ba
