"""Torch end-to-end mirror of the reference VCR-Net EVAL stack.

An independent torch re-expression of the reference semantics (every block
cites reference file:line), assembled into the FULL eval protocol: model
forward -> vcrnetIter refinement -> reference metric math (scipy euler).
Used by benchmarks/parity_report.py --reference and
tests/test_e2e_reference_parity.py to prove END-TASK parity: identical
weights + identical eval batches must produce the same rot/trans RMSE
through two completely separate stacks (torch ops + scipy here, JAX +
closed-form euler in vcrnet_tpu). The reference code itself cannot be
imported (util/util.py calls nvmlInit at import; .cuda() is hardcoded), so
this mirror is the runnable oracle.

The component-level torch goldens in tests/test_parity.py validate each
block in isolation; this module is their composition plus the eval loop
that none of them cover (refinement composition, metric accumulation,
epoch aggregation — reference model/vcrnet_model.py:21-43, 521-649,
768-806).
"""

import numpy as np
import torch
import torch.nn.functional as F
from scipy.spatial.transform import Rotation

# ---------------------------------------------------------------------------
# primitives — reference util/util.py
# ---------------------------------------------------------------------------


def knn_idx(x, k):
    """reference util/util.py:143-160: x [B, C, N] -> idx [B, N, k];
    top-(k+1) of negative squared distance, self dropped."""
    inner = -2 * torch.matmul(x.transpose(2, 1), x)
    xx = torch.sum(x**2, dim=1, keepdim=True)
    pd = -xx - inner - xx.transpose(2, 1)
    return pd.topk(k=k + 1, dim=-1)[1][:, :, 1:]


def graph_feature(x, k=20, idx=None):
    """reference util/util.py:176-199: [B, C, N] -> [B, 2C, N, k]
    (concat(neighbor, center))."""
    B, C, N = x.shape
    if idx is None:
        idx = knn_idx(x, k)
    idx = (idx + torch.arange(0, B).view(-1, 1, 1) * N).view(-1)
    xl = x.transpose(2, 1).contiguous()
    feature = xl.view(B * N, -1)[idx, :].view(B, N, k, C)
    xl = xl.view(B, N, 1, C).repeat(1, 1, k, 1)
    return torch.cat((feature, xl), dim=3).permute(0, 3, 1, 2)


def transform_point_cloud(pc, R, t):
    """reference util/util.py:91-96 (matrix branch): pc [B,3,N]."""
    return torch.matmul(R, pc) + t.unsqueeze(2)


def npmat2euler(mats, seq="zyx"):
    """reference util/util.py:99-104 (scipy from_dcm == from_matrix)."""
    return np.asarray(
        [Rotation.from_matrix(m).as_euler(seq, degrees=True) for m in mats],
        dtype="float32",
    )


# ---------------------------------------------------------------------------
# LPDNet embedding forward — reference model/lpdnet_model.py:103-137
# ---------------------------------------------------------------------------


def lpdnet_forward(sd, x, slope=0.0, k=20, prefix="emb_nn."):
    """Shipped-.t7-layout state dict `sd` forwarded through the reference
    LPDNet graph; x [B, 3, N] -> [B, emb, N]."""
    lr = lambda v: F.leaky_relu(v, negative_slope=slope)
    g = lambda name, p: sd[f"{prefix}{name}.{p}"]
    x_init = x
    x = lr(F.conv1d(x, g("conv1_lpd", "weight"), g("conv1_lpd", "bias")))
    x = lr(F.conv1d(x, g("conv2_lpd", "weight"), g("conv2_lpd", "bias")))
    gf = graph_feature(x, k=k)
    x = lr(F.conv2d(gf, g("convDG1.0", "weight"), g("convDG1.0", "bias")))
    x1 = x.max(dim=-1, keepdim=True)[0]
    x = lr(F.conv2d(x, g("convDG2.0", "weight"), g("convDG2.0", "bias")))
    x2 = x.max(dim=-1, keepdim=True)[0]
    idx = knn_idx(x_init, k)  # spatial neighborhood on original xyz (:129)
    gf = graph_feature(x2.squeeze(-1), k=k, idx=idx)
    x = lr(F.conv2d(gf, g("convSN1.0", "weight"), g("convSN1.0", "bias")))
    x3 = x.max(dim=-1, keepdim=True)[0]
    x = torch.cat((x1, x2, x3), dim=1).squeeze(-1)
    return lr(F.conv1d(x, g("conv3_lpd", "weight"), g("conv3_lpd", "bias")))


# ---------------------------------------------------------------------------
# transformer pointer — reference model/transformer.py
# ---------------------------------------------------------------------------


def make_reference_state_dict(
    rng, n_blocks=1, prefix="pointer.model.", d=64, ff=128
):
    """Random weights in the reference's exact state_dict key layout."""
    sd = {}

    def lin(key, din, dout):
        sd[f"{key}.weight"] = torch.tensor(
            rng.randn(dout, din).astype(np.float32) * 0.05
        )
        sd[f"{key}.bias"] = torch.tensor(
            rng.randn(dout).astype(np.float32) * 0.05
        )

    def norm(key):
        sd[f"{key}.a_2"] = torch.tensor(
            1 + 0.1 * rng.randn(d).astype(np.float32)
        )
        sd[f"{key}.b_2"] = torch.tensor(0.1 * rng.randn(d).astype(np.float32))

    for i in range(n_blocks):
        for j in range(4):
            lin(f"{prefix}encoder.layers.{i}.self_attn.linears.{j}", d, d)
            lin(f"{prefix}decoder.layers.{i}.self_attn.linears.{j}", d, d)
            lin(f"{prefix}decoder.layers.{i}.src_attn.linears.{j}", d, d)
        norm(f"{prefix}encoder.layers.{i}.sublayer.0.norm")
        norm(f"{prefix}encoder.layers.{i}.sublayer.1.norm")
        for j in range(3):
            norm(f"{prefix}decoder.layers.{i}.sublayer.{j}.norm")
        lin(f"{prefix}encoder.layers.{i}.feed_forward.w_1", d, ff)
        lin(f"{prefix}encoder.layers.{i}.feed_forward.w_2", ff, d)
        lin(f"{prefix}decoder.layers.{i}.feed_forward.w_1", d, ff)
        lin(f"{prefix}decoder.layers.{i}.feed_forward.w_2", ff, d)
    norm(f"{prefix}encoder.norm")
    norm(f"{prefix}decoder.norm")
    return sd


class TorchMirror:
    """Functional torch mirror of reference transformer.py semantics
    (pre-norm sublayers :147-153, unbiased-std LayerNorm :134-144, shared
    bidirectional application :269-270, partial re-mask :36-53)."""

    def __init__(self, sd, prefix="pointer.model.", d=64, h=4, overlap2=None):
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
        view = lambda t: t.view(B, -1, H, dk).transpose(1, 2)
        q = view(self.linear(q_in, f"{key}.linears.0"))
        k = view(self.linear(k_in, f"{key}.linears.1"))
        v = view(self.linear(v_in, f"{key}.linears.2"))
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


# ---------------------------------------------------------------------------
# VCP heads + SVD solve — reference model/vcrnet_model.py
# ---------------------------------------------------------------------------


def _gather_cf(x_cf, idx):
    """[B,C,N] gathered by [B,K] -> [B,C,K]."""
    return torch.gather(
        x_cf, 2, idx.unsqueeze(1).expand(-1, x_cf.size(1), -1)
    )


def vcp_whole(se, te, src_t, tgt_t):
    """reference getCopairALL (vcrnet_model.py:334-347), channels-first."""
    inner = -2 * torch.matmul(se.transpose(2, 1), te)
    xx = torch.sum(se**2, dim=1, keepdim=True).transpose(2, 1)
    yy = torch.sum(te**2, dim=1, keepdim=True)
    scores = F.softmax(-xx - inner - yy, dim=2)
    return src_t, torch.matmul(tgt_t, scores.transpose(2, 1))


def vcp_partial(se, te, src_t, tgt_t, overlap2):
    """reference selectCom + getCopair, tgtK=1 (vcrnet_model.py:190-332)."""
    N = se.size(2)
    K1 = int(N * 0.84 * overlap2)
    inner = -2 * torch.matmul(se.transpose(2, 1), te)
    xx = torch.sum(se**2, dim=1, keepdim=True).transpose(2, 1)
    yy = torch.sum(te**2, dim=1, keepdim=True)
    scores = -xx - inner - yy
    tgt_idx = F.softmax(scores, dim=2).sum(dim=1).topk(k=K1, dim=-1)[1]
    src_idx = F.softmax(scores, dim=1).sum(dim=2).topk(k=K1, dim=-1)[1]
    src_o, se_o = _gather_cf(src_t, src_idx), _gather_cf(se, src_idx)
    tgt_o, te_o = _gather_cf(tgt_t, tgt_idx), _gather_cf(te, tgt_idx)
    K2 = int(K1 * 0.52 * overlap2)
    inner = -2 * torch.matmul(se_o.transpose(2, 1), te_o)
    xx = torch.sum(se_o**2, dim=1, keepdim=True).transpose(2, 1)
    yy = torch.sum(te_o**2, dim=1, keepdim=True)
    p = F.softmax(-xx - inner - yy, dim=2)
    val, idx1 = p.topk(k=1, dim=-1)
    keep = val.squeeze(-1).topk(k=K2, dim=-1)[1]
    srcK = _gather_cf(src_o, keep)
    corrK = _gather_cf(tgt_o, torch.gather(idx1.squeeze(-1), 1, keep))
    return srcK, corrK


def svd_head(srcK, corrK):
    """reference SVDHead (vcrnet_model.py:356-398): per-item torch.svd with
    the det<0 reflection fix; srcK/corrK [B, 3, K] channels-first."""
    sc = srcK - srcK.mean(dim=2, keepdim=True)
    cc = corrK - corrK.mean(dim=2, keepdim=True)
    Hm = torch.matmul(sc, cc.transpose(2, 1))
    reflect = torch.eye(3, dtype=srcK.dtype)
    reflect[2, 2] = -1
    Rs = []
    for i in range(Hm.size(0)):
        u, s, v = torch.svd(Hm[i])
        r = v @ u.T
        if torch.det(r) < 0:
            r = (v @ reflect) @ u.T
        Rs.append(r)
    R = torch.stack(Rs)
    t = (
        -torch.matmul(R, srcK.mean(dim=2, keepdim=True))
        + corrK.mean(dim=2, keepdim=True)
    ).squeeze(-1)
    return R, t


# ---------------------------------------------------------------------------
# full model + eval protocol — reference model/vcrnet_model.py:463-518, 21-43,
# 521-649, 768-806
# ---------------------------------------------------------------------------


class TorchVCRNet:
    """reference VCRNet.forward (vcrnet_model.py:495-518): LPDNet embed both
    clouds, pointer residual, VCP head, SVD, analytic inverse. Weights come
    as reference-layout state dicts (emb_nn.* for LPDNet, pointer.model.*
    for the transformer)."""

    def __init__(self, sd, d=512, h=4, overlap2=None, slope=0.0):
        self.sd = sd
        self.d = d
        self.overlap2 = overlap2
        self.slope = slope
        self.pointer = TorchMirror(sd, d=d, h=h, overlap2=overlap2)

    def __call__(self, src_t, tgt_t):
        se = lpdnet_forward(self.sd, src_t, slope=self.slope)
        te = lpdnet_forward(self.sd, tgt_t, slope=self.slope)
        se_cl, te_cl = se.transpose(2, 1), te.transpose(2, 1)
        src_delta, tgt_delta = self.pointer(se_cl, te_cl)
        se = (se_cl + src_delta).transpose(2, 1)  # residual add :503-505
        te = (te_cl + tgt_delta).transpose(2, 1)
        if self.overlap2 is not None:
            srcK, corrK = vcp_partial(se, te, src_t, tgt_t, self.overlap2)
        else:
            srcK, corrK = vcp_whole(se, te, src_t, tgt_t)
        R_ab, t_ab = svd_head(srcK, corrK)
        R_ba = R_ab.transpose(2, 1)
        t_ba = -torch.matmul(R_ba, t_ab.unsqueeze(2)).squeeze(2)
        return srcK, corrK, R_ab, t_ab, R_ba, t_ba


def vcrnet_iter(net, src, tgt, n_iter=1):
    """reference vcrnetIter (vcrnet_model.py:21-43): re-run the net on the
    transformed source, composing R_final = R_i @ R_final,
    t_final = R_i @ t_final + t_i; final B->A is the analytic inverse."""
    transformed = src
    R_final = t_final = None
    for _ in range(n_iter):
        srcK, corrK, R, t, _, _ = net(transformed, tgt)
        transformed = transform_point_cloud(transformed, R, t)
        if R_final is None:
            R_final, t_final = R, t
        else:
            R_final = torch.matmul(R, R_final)
            t_final = torch.matmul(R, t_final.unsqueeze(2)).squeeze(2) + t
    R_ba = R_final.transpose(2, 1).contiguous()
    t_ba = -torch.matmul(R_ba, t_final.unsqueeze(2)).squeeze(2)
    return srcK, corrK, R_final, t_final, R_ba, t_ba


def eval_protocol(net, batches, n_iter=1):
    """reference test_one_epoch + testVCRNet epoch aggregation
    (vcrnet_model.py:521-649, 768-790): per-batch vcrnetIter, collect preds,
    then rot metrics in euler DEGREES via scipy ('zyx' for A->B, 'xyz' for
    B->A) and translation metrics in linear space.

    `batches` iterates dicts in the vcrnet_tpu collate schema (channels-LAST
    [B, N, 3] src/tgt, euler_* in radians, optional `valid` row mask)."""
    R_ab_pred, t_ab_pred, R_ba_pred, t_ba_pred = [], [], [], []
    t_ab_gt, t_ba_gt, e_ab_gt, e_ba_gt = [], [], [], []
    with torch.no_grad():
        for b in batches:
            keep = np.asarray(
                b.get("valid", np.ones(b["src"].shape[0]))
            ).astype(bool)
            src = torch.tensor(
                np.asarray(b["src"])[keep].transpose(0, 2, 1)
            )
            tgt = torch.tensor(
                np.asarray(b["tgt"])[keep].transpose(0, 2, 1)
            )
            _, _, R_ab, t_ab, R_ba, t_ba = vcrnet_iter(
                net, src, tgt, n_iter=n_iter
            )
            R_ab_pred.append(R_ab.numpy())
            t_ab_pred.append(t_ab.numpy())
            R_ba_pred.append(R_ba.numpy())
            t_ba_pred.append(t_ba.numpy())
            t_ab_gt.append(np.asarray(b["t_ab"])[keep])
            t_ba_gt.append(np.asarray(b["t_ba"])[keep])
            e_ab_gt.append(np.asarray(b["euler_ab"])[keep])
            e_ba_gt.append(np.asarray(b["euler_ba"])[keep])

    cat = lambda xs: np.concatenate(xs, axis=0)
    e_ab_pred = npmat2euler(cat(R_ab_pred), "zyx")
    e_ba_pred = npmat2euler(cat(R_ba_pred), "xyz")
    out = {"num_examples": float(e_ab_pred.shape[0])}
    for d, ep, eg, tp, tg in (
        ("ab", e_ab_pred, cat(e_ab_gt), cat(t_ab_pred), cat(t_ab_gt)),
        ("ba", e_ba_pred, cat(e_ba_gt), cat(t_ba_pred), cat(t_ba_gt)),
    ):
        r_err = ep - np.degrees(eg)
        t_err = tg - tp
        out[f"rot_{d}_MSE"] = float(np.mean(r_err**2))
        out[f"rot_{d}_RMSE"] = float(np.sqrt(np.mean(r_err**2)))
        out[f"rot_{d}_MAE"] = float(np.mean(np.abs(r_err)))
        out[f"trans_{d}_MSE"] = float(np.mean(t_err**2))
        out[f"trans_{d}_RMSE"] = float(np.sqrt(np.mean(t_err**2)))
        out[f"trans_{d}_MAE"] = float(np.mean(np.abs(t_err)))
    return out
