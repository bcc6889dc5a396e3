"""Ops unit tests: kNN/kFN vs brute-force numpy, gather, FPS semantics."""

import numpy as np
import pytest
import jax.numpy as jnp

from vcrnet_tpu import ops


def np_knn(x, k, exclude_self=True):
    # x: [B, N, C] brute force
    d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)  # [B,N,N]
    order = np.argsort(d, axis=-1, kind="stable")
    return order[..., 1 : k + 1] if exclude_self else order[..., :k]


class TestKnn:
    def test_knn_matches_bruteforce(self):
        rng = np.random.RandomState(0)
        x = rng.randn(4, 64, 3).astype(np.float32)
        ours = np.asarray(ops.knn(jnp.asarray(x), k=8))
        ref = np_knn(x, 8)
        # compare as sets per point (tie order may differ)
        assert ours.shape == ref.shape
        same = (np.sort(ours, -1) == np.sort(ref, -1)).mean()
        assert same > 0.999

    def test_kfn_farthest(self):
        rng = np.random.RandomState(1)
        x = rng.randn(2, 32, 4).astype(np.float32)
        ours = np.asarray(ops.kfn(jnp.asarray(x), k=5))
        d = ((x[:, :, None, :] - x[:, None, :, :]) ** 2).sum(-1)
        ref = np.argsort(-d, axis=-1, kind="stable")[..., :5]
        same = (np.sort(ours, -1) == np.sort(ref, -1)).mean()
        assert same > 0.999

    def test_pairwise_sqdist_cross(self):
        rng = np.random.RandomState(2)
        x = rng.randn(3, 16, 8).astype(np.float32)
        y = rng.randn(3, 24, 8).astype(np.float32)
        ours = np.asarray(ops.pairwise_sqdist(jnp.asarray(x), jnp.asarray(y)))
        ref = ((x[:, :, None, :] - y[:, None, :, :]) ** 2).sum(-1)
        np.testing.assert_allclose(ours, ref, atol=1e-4)


class TestGather:
    def test_gather_neighbors(self):
        rng = np.random.RandomState(3)
        feats = rng.randn(2, 10, 6).astype(np.float32)
        idx = rng.randint(0, 10, size=(2, 10, 4))
        out = np.asarray(ops.gather_neighbors(jnp.asarray(feats), jnp.asarray(idx)))
        for b in range(2):
            for n in range(10):
                for j in range(4):
                    np.testing.assert_array_equal(out[b, n, j], feats[b, idx[b, n, j]])

    def test_graph_feature_concat_order(self):
        # reference concatenates (neighbor, center) on the channel axis
        # (util/util.py:197)
        rng = np.random.RandomState(4)
        feats = rng.randn(1, 8, 3).astype(np.float32)
        idx = np.zeros((1, 8, 2), dtype=np.int32)  # all neighbors = point 0
        gf = np.asarray(ops.graph_feature(jnp.asarray(feats), idx=jnp.asarray(idx)))
        assert gf.shape == (1, 8, 2, 6)
        np.testing.assert_array_equal(gf[0, 3, 0, :3], feats[0, 0])  # neighbor
        np.testing.assert_array_equal(gf[0, 3, 0, 3:], feats[0, 3])  # center


class TestFPS:
    def np_fps(self, xyz, npoint):
        # mirror of reference util/util.py:107-140 semantics in numpy
        B, N, _ = xyz.shape
        centroids = np.zeros((B, npoint), np.int64)
        distance = np.full((B, N), 1e10)
        bary = xyz.mean(axis=1, keepdims=True)
        farthest = np.argmax(((xyz - bary) ** 2).sum(-1), axis=-1)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[np.arange(B), farthest][:, None, :]
            dist = ((xyz - centroid) ** 2).sum(-1)
            distance = np.minimum(distance, dist)
            farthest = np.argmax(distance, axis=-1)
        return centroids

    def test_fps_matches_reference_semantics(self):
        rng = np.random.RandomState(5)
        xyz = rng.randn(3, 100, 3).astype(np.float32)
        ours = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))
        ref = self.np_fps(xyz.astype(np.float64), 16)
        np.testing.assert_array_equal(ours, ref)

    def test_fps_spreads_points(self):
        # FPS on a grid should pick spread-out points: min pairwise distance
        # among samples should beat random sampling
        rng = np.random.RandomState(6)
        xyz = rng.rand(1, 256, 3).astype(np.float32)
        idx = np.asarray(ops.farthest_point_sample(jnp.asarray(xyz), 16))[0]
        pts = xyz[0, idx]
        d = ((pts[:, None] - pts[None]) ** 2).sum(-1)
        np.fill_diagonal(d, np.inf)
        rand_pts = xyz[0, rng.choice(256, 16, replace=False)]
        dr = ((rand_pts[:, None] - rand_pts[None]) ** 2).sum(-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()


class TestPallasKnn:
    def test_fused_knn_matches_exact(self):
        import jax
        from vcrnet_tpu.ops.pallas_knn import fused_knn

        rng = np.random.RandomState(7)
        x = jnp.asarray(rng.rand(2, 256, 16).astype(np.float32))
        exact = np.asarray(ops.knn(x, 8, method="exact"))
        fused = np.asarray(
            fused_knn(x, 8, interpret=True, packed_select=False)
        )
        # neighbor sets identical (ordering may differ only on exact ties)
        same = np.mean(
            [
                len(set(exact[b, n]) & set(fused[b, n])) / 8.0
                for b in range(2)
                for n in range(256)
            ]
        )
        assert same == 1.0

    def test_packed_select_matches_argmax_on_separated_scores(self):
        # packed selection compares scores at >=13 mantissa bits; integer
        # coordinates give integer scores < 2^13 (exactly representable,
        # immune to the low-bit clearing), so packed must agree with the
        # exact-argmax path EXACTLY — including first-index order on
        # genuine ties (duplicate integer distances occur in this data)
        from vcrnet_tpu.ops.pallas_knn import fused_knn

        rng = np.random.RandomState(9)
        x = jnp.asarray(
            rng.randint(-5, 6, size=(2, 256, 16)).astype(np.float32)
        )
        a = np.asarray(fused_knn(x, 8, interpret=True, packed_select=False))
        b = np.asarray(fused_knn(x, 8, interpret=True, packed_select=True))
        np.testing.assert_array_equal(a, b)

    def test_packed_select_overlap_on_f32_random(self):
        # on raw-f32 random data near-ties below ~2^-13 relative may flip;
        # the neighbor sets must still agree almost everywhere
        from vcrnet_tpu.ops.pallas_knn import fused_knn

        rng = np.random.RandomState(10)
        x = jnp.asarray(rng.rand(2, 256, 16).astype(np.float32))
        a = np.asarray(fused_knn(x, 8, interpret=True, packed_select=False))
        b = np.asarray(fused_knn(x, 8, interpret=True, packed_select=True))
        same = np.mean(
            [
                len(set(a[i, n]) & set(b[i, n])) / 8.0
                for i in range(2)
                for n in range(256)
            ]
        )
        assert same > 0.995

    def test_auto_method_selects_exact_on_cpu(self):
        import jax

        assert jax.default_backend() == "cpu"
        rng = np.random.RandomState(8)
        x = jnp.asarray(rng.rand(1, 64, 3).astype(np.float32))
        a = np.asarray(ops.knn(x, 5))          # auto -> exact on CPU
        b = np.asarray(ops.knn(x, 5, method="exact"))
        np.testing.assert_array_equal(a, b)


class TestPallasEdgeConv:
    def _setup(self):
        rng = np.random.RandomState(11)
        B, N, C, F, k = 2, 128, 16, 64, 8
        x = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
        a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        h = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        w2 = jnp.asarray(rng.randn(F, F).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
        return x, a, h, w2, b2, k

    def test_fused_edge_conv_matches_xla_path(self):
        from vcrnet_tpu.ops.pallas_edgeconv import fused_edge_conv

        x, a, h, w2, b2, k = self._setup()
        idx = ops.knn(x, k, method="exact")
        a_nb = ops.gather_neighbors(a, idx)
        z = jnp.maximum(a_nb + h[:, :, None, :], 0)
        x1_ref = z.max(2)
        zz = z @ w2 + b2
        x2_ref = jnp.maximum(zz, 0).max(2)
        x1, x2 = fused_edge_conv(x, a, h, w2, b2, k=k, interpret=True)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x1_ref), atol=1e-5)
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x2_ref), atol=1e-5)

    def test_fused_gather_max_matches_xla_path(self):
        from vcrnet_tpu.ops.pallas_edgeconv import fused_knn_gather_max

        x, a, h, w2, b2, k = self._setup()
        idx = ops.knn(x, k, method="exact")
        ref = ops.gather_max_neighbors(a, idx)
        out = fused_knn_gather_max(x, a, k=k, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    def test_gather_max_from_idx_matches_fused(self):
        from vcrnet_tpu.ops.pallas_edgeconv import (
            fused_knn_gather_max, gather_max_from_idx,
        )

        x, a, h, w2, b2, k = self._setup()
        idx = ops.knn(x, k, method="exact")
        ref = fused_knn_gather_max(x, a, k=k, interpret=True)
        out = gather_max_from_idx(idx, a, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_edge_conv_from_idx_matches_fused(self):
        # the from-indices twin reproduces the fused kernel exactly when
        # fed the fused kernel's own selection (return_idx)
        from vcrnet_tpu.ops.pallas_edgeconv import (
            edge_conv_from_idx, fused_edge_conv,
        )

        x, a, h, w2, b2, k = self._setup()
        x1_ref, x2_ref, idx = fused_edge_conv(
            x, a, h, w2, b2, k=k, interpret=True, return_idx=True
        )
        x1, x2 = edge_conv_from_idx(idx, a, h, w2, b2, interpret=True)
        np.testing.assert_allclose(
            np.asarray(x1), np.asarray(x1_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(x2), np.asarray(x2_ref), atol=1e-5
        )
        # leaky slope and int8 gathers follow the same equivalence
        x1s_ref, x2s_ref, idx_s = fused_edge_conv(
            x, a, h, w2, b2, k=k, negative_slope=0.2, interpret=True,
            return_idx=True,
        )
        x1s, x2s = edge_conv_from_idx(
            idx_s, a, h, w2, b2, negative_slope=0.2, interpret=True
        )
        np.testing.assert_allclose(
            np.asarray(x1s), np.asarray(x1s_ref), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(x2s), np.asarray(x2s_ref), atol=1e-5
        )

    def test_edge_conv_from_idx_int8_matches_quantized(self):
        # int8 one-hot gather == bf16 path over the quantized table
        from vcrnet_tpu.ops.pallas_edgeconv import edge_conv_from_idx

        x, a, h, w2, b2, k = self._setup()
        idx = ops.knn(x, k, method="exact")
        out8 = edge_conv_from_idx(
            idx, a, h, w2, b2, interpret=True, int8_gather=True
        )
        a32 = np.asarray(a, np.float32)
        scale = np.abs(a32).max(axis=1, keepdims=True) / 127.0 + 1e-30
        aq = jnp.asarray(np.round(a32 / scale) * scale)
        ref = edge_conv_from_idx(idx, aq, h, w2, b2, interpret=True)
        for o, r in zip(out8, ref):
            np.testing.assert_allclose(
                np.asarray(o), np.asarray(r), atol=1e-4
            )

    def test_fused_edge_conv_return_idx_matches_knn(self):
        from vcrnet_tpu.ops.pallas_edgeconv import fused_edge_conv

        x, a, h, w2, b2, k = self._setup()
        _, _, idx = fused_edge_conv(
            x, a, h, w2, b2, k=k, interpret=True, return_idx=True,
            packed_select=False,
        )
        ref_idx = ops.knn(x, k, method="exact")
        # same neighbor SETS (selection order may differ on ties)
        assert np.all(
            np.sort(np.asarray(idx), axis=-1)
            == np.sort(np.asarray(ref_idx), axis=-1)
        )

    def test_deferred_gather_matches_interleaved(self):
        # the deferred-gather kernel variant (select first, then one big
        # one-hot gather + conv) must reproduce the in-loop variant
        # EXACTLY in every mode combination
        from vcrnet_tpu.ops.pallas_edgeconv import (
            _fused_edge_conv_fwd_impl, _fused_gather_max_impl,
        )

        x, a, h, w2, b2, k = self._setup()
        for packed in (True, False):
            for int8 in (True, False):
                ec_il = _fused_edge_conv_fwd_impl(
                    x, a, h, w2, b2, k, 0.2, 128, True, packed, int8,
                    deferred_gather=False,
                )
                ec_df = _fused_edge_conv_fwd_impl(
                    x, a, h, w2, b2, k, 0.2, 128, True, packed, int8,
                    deferred_gather=True,
                )
                for o_il, o_df in zip(ec_il, ec_df):
                    np.testing.assert_array_equal(
                        np.asarray(o_il), np.asarray(o_df),
                        err_msg=f"packed={packed} int8={int8}",
                    )
                gm_il = _fused_gather_max_impl(
                    x, a, k, 128, True, packed, int8, deferred_gather=False
                )
                gm_df = _fused_gather_max_impl(
                    x, a, k, 128, True, packed, int8, deferred_gather=True
                )
                for o_il, o_df in zip(gm_il, gm_df):
                    np.testing.assert_array_equal(
                        np.asarray(o_il), np.asarray(o_df),
                        err_msg=f"packed={packed} int8={int8}",
                    )

    def test_gather_max_from_idx_large_n_vmem_guard(self):
        # at large N the [k*TQ, N] one-hot must shrink its query tile to
        # stay within VMEM; verify the guarded tiling stays exact
        from vcrnet_tpu.ops.pallas_edgeconv import gather_max_from_idx

        rng = np.random.RandomState(7)
        B, N, k, F = 1, 2048, 20, 16
        a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, N, size=(B, N, k)).astype(np.int32))
        ref = ops.gather_max_neighbors(a, idx)
        out = gather_max_from_idx(idx, a, interpret=True)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-6)

    def test_int8_gather_matches_quantized_reference(self):
        # int8 one-hot gather == gather of the per-channel-quantized table
        # (the matmul itself adds NO error: each output row copies one row)
        from vcrnet_tpu.ops.pallas_edgeconv import (
            fused_knn_gather_max, gather_max_from_idx,
        )

        x, a, h, w2, b2, k = self._setup()
        out8 = fused_knn_gather_max(
            x, a, k=k, interpret=True, int8_gather=True
        )
        # quantize the table the same way, then run the exact path
        a32 = np.asarray(a, np.float32)
        scale = np.abs(a32).max(axis=1, keepdims=True) / 127.0 + 1e-30
        aq = jnp.asarray(np.round(a32 / scale) * scale)
        ref = fused_knn_gather_max(x, aq, k=k, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out8), np.asarray(ref), atol=1e-5
        )
        # error vs the unquantized path bounded by table quantization
        ref_full = fused_knn_gather_max(x, a, k=k, interpret=True)
        err = np.abs(np.asarray(out8) - np.asarray(ref_full)).max()
        assert err <= (np.abs(a32).max() / 127.0) * 0.51 + 1e-6

        idx = ops.knn(x, k, method="exact")
        out8i = gather_max_from_idx(idx, a, interpret=True, int8_gather=True)
        refi = gather_max_from_idx(idx, aq, interpret=True)
        np.testing.assert_allclose(
            np.asarray(out8i), np.asarray(refi), atol=1e-5
        )

    def _quant_st(self, a):
        """Straight-through per-channel int8 quantization mirror of the
        kernels' _quantize_channels (gradient = identity)."""
        import jax

        a32 = a.astype(jnp.float32)
        scale = jnp.max(jnp.abs(a32), axis=1, keepdims=True) / 127.0 + 1e-30
        aq = jnp.round(a32 / scale) * scale
        return a32 + jax.lax.stop_gradient(aq - a32)

    @staticmethod
    def _first_claim_max(z):
        """Max over the neighbor axis (2) whose gradient routes each
        channel's cotangent to the FIRST maximal neighbor — the kernels'
        value-match-claim semantics. Quantization makes value ties common,
        where jnp.max's VJP (split among ties) would differ."""
        j = jnp.argmax(z, axis=2)  # first max index per [B, N, F]
        return jnp.take_along_axis(z, j[:, :, None, :], axis=2)[:, :, 0, :]

    def test_int8_gather_max_grad_is_straight_through(self):
        # grad of the int8 fused path == grad of a first-claim XLA mirror
        # over the straight-through-quantized table, gathered in the
        # kernel's own selection order
        import jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_knn_gather_max

        x, a, h, w2, b2, k = self._setup()
        _, idx = fused_knn_gather_max(
            x, a, k=k, interpret=True, packed_select=False,
            int8_gather=True, return_idx=True,
        )
        ct = jnp.asarray(
            np.random.RandomState(5).randn(*a.shape).astype(np.float32)
        )

        def loss_pallas(a_):
            return jnp.sum(
                fused_knn_gather_max(
                    x, a_, k=k, interpret=True, packed_select=False,
                    int8_gather=True,
                )
                * ct
            )

        def loss_xla(a_):
            g = ops.gather_neighbors(self._quant_st(a_), idx)
            return jnp.sum(self._first_claim_max(g) * ct)

        np.testing.assert_allclose(
            np.asarray(jax.grad(loss_pallas)(a)),
            np.asarray(jax.grad(loss_xla)(a)),
            atol=1e-4,
        )

    def test_int8_edge_conv_grad_decoupled_backward(self):
        # NEW winner-driven semantics: the forward gathers the QUANTIZED
        # table (selection + outputs in the quantized domain), while the
        # backward evaluates the gradient with EXACT values at the
        # forward's winner selection (winners saved by the kernel, so no
        # value-match claim couples the two domains).
        import jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_edge_conv

        x, a, h, w2, b2, k = self._setup()
        _, _, idx = fused_edge_conv(
            x, a, h, w2, b2, k=k, interpret=True, packed_select=False,
            int8_gather=True, return_idx=True,
        )
        rngs = np.random.RandomState(6)
        ct1 = jnp.asarray(rngs.randn(*a.shape).astype(np.float32))
        ct2 = jnp.asarray(rngs.randn(*a.shape).astype(np.float32))

        def loss_pallas(a_, h_, w2_, b2_):
            x1, x2 = fused_edge_conv(
                x, a_, h_, w2_, b2_, k=k, interpret=True,
                packed_select=False, int8_gather=True,
            )
            return jnp.sum(x1 * ct1) + jnp.sum(x2 * ct2)

        # winners from the QUANTIZED forward (first max == jnp.argmax)
        aq_nb = ops.gather_neighbors(self._quant_st(a), idx)
        zq = jnp.maximum(aq_nb + h[:, :, None, :], 0)
        win1 = jnp.argmax(zq, axis=2)  # [B, N, F]
        yq = jnp.maximum(zq @ w2 + b2, 0)
        win2 = jnp.argmax(yq, axis=2)
        take = lambda t, w: jnp.take_along_axis(
            t, w[:, :, None, :], axis=2
        )[:, :, 0]
        # the x2 cotangent is activation-gated by the sign of the SAVED
        # (quantized-domain) output — that is what the kernel's
        # dleaky(x2) does — not by the exact-value relu
        gate2 = (take(yq, win2) > 0).astype(jnp.float32)

        def loss_xla(a_, h_, w2_, b2_):
            a_nb = ops.gather_neighbors(a_, idx)  # EXACT values
            z = jnp.maximum(a_nb + h_[:, :, None, :], 0)
            ylin = z @ w2_ + b2_  # linear; relu' replaced by gate2
            x1 = take(z, win1)
            x2 = take(ylin, win2) * gate2
            return jnp.sum(x1 * ct1) + jnp.sum(x2 * ct2)

        gp = jax.grad(loss_pallas, argnums=(0, 1, 2, 3))(a, h, w2, b2)
        gx = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(a, h, w2, b2)
        for p, r in zip(gp, gx):
            np.testing.assert_allclose(
                np.asarray(p), np.asarray(r), atol=2e-4
            )

    def test_vmem_guard_tile_constraints(self, monkeypatch):
        # (ADVICE r1) shrink under pressure, but never below a multiple of 8
        # that divides N — and the backward wrappers must apply the guard
        from vcrnet_tpu.ops.pallas_edgeconv import _vmem_guard_tile

        # assertions are about the DEFAULT budgets; neutralize the A/B knob
        monkeypatch.delenv("VCRNET_ONEHOT_VMEM_BUDGET_MB", raising=False)

        # 20*128*4096*4B = 40 MB -> shrinks under the 6 MB default budget:
        # 64 (20 MB) -> 32 (10 MB) -> 16 (5 MB, fits); candidates divide 4096
        assert _vmem_guard_tile(128, 20, 4096, 4) == 16
        # non-power-of-two caller tile: 96 -> 48 (÷8 ok, divides 768)
        # -> 24 would be ÷8-violating, so stop at... 48%8==0, 24%8==0 no
        t = _vmem_guard_tile(96, 20, 768, 4)
        assert t % 8 == 0 and 768 % t == 0
        # small problem (20*128*512*2B = 2.6 MB <= 6 MB): untouched
        assert _vmem_guard_tile(128, 20, 512, 2) == 128
        # round-5 default tile 256 int8 at N=1024 (5 MB) fits untouched
        assert _vmem_guard_tile(256, 20, 1024, 1) == 256

    def test_edge_conv_bwd_large_n_vmem_guard(self):
        # (ADVICE r1 medium) backward kernels at N=2048 must tile-shrink and
        # stay exact vs the XLA grad
        import jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_knn_gather_max

        rng = np.random.RandomState(11)
        B, N, k, F = 1, 2048, 20, 16
        x = jnp.asarray(rng.rand(B, N, 3).astype(np.float32))
        a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        ct = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        idx = ops.knn(x, k, method="exact")

        def loss_pallas(a_):
            # packed_select=False: the XLA reference grad uses exact-f32
            # kNN indices; this test targets the VMEM tile guard
            return jnp.sum(
                fused_knn_gather_max(
                    x, a_, k=k, interpret=True, packed_select=False
                )
                * ct
            )

        def loss_xla(a_):
            return jnp.sum(ops.gather_max_neighbors(a_, idx) * ct)

        gp = np.asarray(jax.grad(loss_pallas)(a))
        gx = np.asarray(jax.grad(loss_xla)(a))
        np.testing.assert_allclose(gp, gx, atol=1e-4)

    def test_gather_max_from_idx_grad_matches_xla(self):
        import jax
        from vcrnet_tpu.ops.pallas_edgeconv import gather_max_from_idx

        x, a, h, w2, b2, k = self._setup()
        idx = ops.knn(x, k, method="exact")
        ct = jnp.asarray(
            np.random.RandomState(3).randn(*a.shape).astype(np.float32)
        )

        def loss_pallas(a_):
            return jnp.sum(gather_max_from_idx(idx, a_, interpret=True) * ct)

        def loss_xla(a_):
            return jnp.sum(ops.gather_max_neighbors(a_, idx) * ct)

        gp = np.asarray(jax.grad(loss_pallas)(a))
        gx = np.asarray(jax.grad(loss_xla)(a))
        np.testing.assert_allclose(gp, gx, atol=1e-4)

    def test_fused_knn_zero_grad(self):
        import jax
        from vcrnet_tpu.ops.pallas_knn import fused_knn

        x = jnp.asarray(np.random.RandomState(12).rand(1, 64, 8).astype(np.float32))

        def loss(x):
            idx = fused_knn(x, 4, 128, True)
            g = jnp.take_along_axis(x, idx.reshape(1, -1)[:, :, None], axis=1)
            return jnp.sum(g * x.mean())

        g = np.asarray(jax.grad(loss)(x))
        assert np.isfinite(g).all()


class TestStreamingVcp:
    def test_matches_xla_whole_correspondence(self):
        from vcrnet_tpu.ops.pallas_vcp import streaming_soft_correspondence
        from vcrnet_tpu.models.heads import vcp_top_k_whole

        rng = np.random.RandomState(13)
        B, Ns, Nt, E = 2, 128, 256, 32
        se = jnp.asarray(rng.randn(B, Ns, E).astype(np.float32))
        te = jnp.asarray(rng.randn(B, Nt, E).astype(np.float32))
        src = jnp.asarray(rng.randn(B, Ns, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(B, Nt, 3).astype(np.float32))
        _, ref = vcp_top_k_whole(se, te, src, tgt)
        out = streaming_soft_correspondence(
            se, te, tgt, tile_q=64, tile_k=64, interpret=True
        )
        # the kernel's p @ v pass runs as bf16 hi+lo splits (3 bf16 MXU
        # matmuls instead of one 8x-slower f32 dot); the dropped lo x lo
        # term bounds the error at ~2^-18 relative — atol reflects that
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=5e-5)

    def test_vjp_value_and_grads_match_xla(self):
        """The differentiable streaming path (train): forward equals the
        XLA whole-mode correspondence and ALL THREE input cotangents match
        jax.grad of the XLA formulation (same loss), in interpret mode.

        Shapes chosen so BOTH multi-tile paths run: Ns=512 gives
        n_q_tiles=2 in the backward (tile_q=256 from the 1 MB score
        bound, so the dk/dv/colsum accumulation across the sequential
        q-tile grid is active) and Nt=768 gives n_k_tiles=3 in the
        forward's online-softmax lse path (tile_k falls back from 1024
        to 256) — at the previous 128/256 both grids were single-tile
        and the accumulation logic untested."""
        import jax
        from vcrnet_tpu.ops.pallas_vcp import soft_correspondence_vjp
        from vcrnet_tpu.models.heads import vcp_top_k_whole

        rng = np.random.RandomState(7)
        B, Ns, Nt, E = 1, 512, 768, 32
        se = jnp.asarray(rng.randn(B, Ns, E).astype(np.float32))
        te = jnp.asarray(rng.randn(B, Nt, E).astype(np.float32))
        src = jnp.asarray(rng.randn(B, Ns, 3).astype(np.float32))
        tgt = jnp.asarray(rng.randn(B, Nt, 3).astype(np.float32))
        w = jnp.asarray(rng.randn(B, Ns, 3).astype(np.float32))

        def loss_ref(se, te, tgt):
            _, corr = vcp_top_k_whole(se, te, src, tgt)
            return jnp.sum(w * corr)

        def loss_stream(se, te, tgt):
            corr = soft_correspondence_vjp(se, te, tgt, True)
            return jnp.sum(w * corr)

        v_ref, g_ref = jax.value_and_grad(loss_ref, argnums=(0, 1, 2))(
            se, te, tgt
        )
        v_st, g_st = jax.value_and_grad(loss_stream, argnums=(0, 1, 2))(
            se, te, tgt
        )
        np.testing.assert_allclose(
            float(v_st), float(v_ref), rtol=1e-4, atol=1e-4
        )
        for gs, gr, name in zip(g_st, g_ref, ("dsrc_emb", "dtgt_emb", "dtgt")):
            gs, gr = np.asarray(gs), np.asarray(gr)
            # bf16 matmuls in the backward bound the relative error;
            # compare against the gradient's own scale
            scale = np.abs(gr).max() + 1e-8
            np.testing.assert_allclose(
                gs / scale, gr / scale, atol=4e-3, err_msg=name
            )

    def test_vjp_forward_no_lse_matches_lse_path(self):
        from vcrnet_tpu.ops.pallas_vcp import (
            _run_streaming, soft_correspondence_vjp,
        )

        rng = np.random.RandomState(8)
        B, Ns, Nt, E = 1, 64, 128, 16
        se = jnp.asarray(rng.randn(B, Ns, E).astype(np.float32))
        te = jnp.asarray(rng.randn(B, Nt, E).astype(np.float32))
        tgt = jnp.asarray(rng.randn(B, Nt, 3).astype(np.float32))
        plain = _run_streaming(se, te, tgt, 128, 1024, True, save_lse=False)
        with_lse, lse = _run_streaming(
            se, te, tgt, 128, 1024, True, save_lse=True
        )
        np.testing.assert_allclose(
            np.asarray(plain), np.asarray(with_lse), rtol=0, atol=0
        )
        # lse really is the logsumexp of the scores
        s = (
            2.0 * np.einsum("bne,bme->bnm", np.asarray(se), np.asarray(te))
            - np.sum(np.asarray(te) ** 2, axis=-1)[:, None, :]
        )
        ref_lse = np.log(np.exp(s - s.max(-1, keepdims=True)).sum(-1)) + \
            s.max(-1)
        np.testing.assert_allclose(
            np.asarray(lse)[:, :, 0], ref_lse, rtol=2e-5, atol=2e-4
        )


def test_knn_auto_rejects_non_tileable_n():
    # N=100 is not a multiple of 8: auto must fall back to the exact path
    # (the Pallas kernel needs 8-row sublane tiles)
    rng = np.random.RandomState(40)
    x = jnp.asarray(rng.rand(1, 100, 3).astype(np.float32))
    idx = ops.knn(x, 5)  # must not raise, CPU or TPU
    ref = ops.knn(x, 5, method="exact")
    np.testing.assert_array_equal(np.asarray(idx), np.asarray(ref))


def test_softmax_colmass_matches_xla():
    import jax
    from vcrnet_tpu.ops.pallas_colmass import softmax_colmass

    rng = np.random.RandomState(41)
    G, Nq, Nk, D = 3, 64, 96, 16
    q = jnp.asarray(rng.randn(G, Nq, D).astype(np.float32))
    k = jnp.asarray(rng.randn(G, Nk, D).astype(np.float32))
    scale = 1 / np.sqrt(D)
    ref = jax.nn.softmax(
        jnp.einsum("gnd,gmd->gnm", q, k) * scale, axis=-1
    ).sum(axis=1)
    out = softmax_colmass(q, k, scale, tile_q=32, tile_k=32, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


class TestPallasEdgeConvGrad:
    """Custom-VJP backward kernels == autodiff of the XLA formulation with
    fixed kNN indices (indices carry zero grad, like torch.topk)."""

    def _setup(self, slope=0.0, seed=13):
        rng = np.random.RandomState(seed)
        B, N, C, F, k = 2, 64, 8, 32, 6
        x = jnp.asarray(rng.rand(B, N, C).astype(np.float32))
        a = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        h = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        w2 = jnp.asarray(rng.randn(F, F).astype(np.float32) * 0.1)
        b2 = jnp.asarray(rng.randn(F).astype(np.float32) * 0.1)
        ct1 = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        ct2 = jnp.asarray(rng.randn(B, N, F).astype(np.float32))
        return x, a, h, w2, b2, k, slope, ct1, ct2

    @staticmethod
    def _xla_edge_conv(x, a, h, w2, b2, idx, slope):
        import jax as _jax

        act = lambda v: _jax.nn.leaky_relu(v, slope)
        a_nb = ops.gather_neighbors(a, idx)
        z = act(a_nb + h[:, :, None, :])
        x1 = z.max(2)
        x2 = act(z @ w2 + b2).max(2)
        return x1, x2

    def test_edge_conv_grads_match_xla(self):
        import jax as _jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_edge_conv

        for slope in (0.0, 0.2):
            x, a, h, w2, b2, k, _, ct1, ct2 = self._setup(slope)
            idx = ops.knn(x, k, method="exact")

            def loss_ref(args):
                a_, h_, w2_, b2_ = args
                x1, x2 = self._xla_edge_conv(x, a_, h_, w2_, b2_, idx, slope)
                return jnp.sum(x1 * ct1) + jnp.sum(x2 * ct2)

            def loss_fused(args):
                a_, h_, w2_, b2_ = args
                x1, x2 = fused_edge_conv(
                    x, a_, h_, w2_, b2_, k=k, negative_slope=slope,
                    interpret=True,
                )
                return jnp.sum(x1 * ct1) + jnp.sum(x2 * ct2)

            g_ref = _jax.grad(loss_ref)((a, h, w2, b2))
            g_fus = _jax.grad(loss_fused)((a, h, w2, b2))
            for name, r, f in zip(("da", "dh", "dw2", "db2"), g_ref, g_fus):
                np.testing.assert_allclose(
                    np.asarray(f), np.asarray(r), atol=2e-4, rtol=1e-4,
                    err_msg=f"{name} slope={slope}",
                )

    def test_edge_conv_x_gets_zero_grad(self):
        import jax as _jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_edge_conv

        x, a, h, w2, b2, k, slope, ct1, ct2 = self._setup()

        def loss(x_):
            x1, x2 = fused_edge_conv(
                x_, a, h, w2, b2, k=k, interpret=True
            )
            return jnp.sum(x1 * ct1) + jnp.sum(x2 * ct2)

        gx = _jax.grad(loss)(x)
        np.testing.assert_array_equal(np.asarray(gx), 0.0)

    def test_gather_max_grad_matches_xla(self):
        import jax as _jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_knn_gather_max

        x, a, _, _, _, k, _, ct1, _ = self._setup()
        idx = ops.knn(x, k, method="exact")

        def loss_ref(v):
            return jnp.sum(ops.gather_max_neighbors(v, idx) * ct1)

        def loss_fused(v):
            return jnp.sum(
                fused_knn_gather_max(x, v, k=k, interpret=True) * ct1
            )

        g_ref = _jax.grad(loss_ref)(a)
        g_fus = _jax.grad(loss_fused)(a)
        np.testing.assert_allclose(
            np.asarray(g_fus), np.asarray(g_ref), atol=2e-4, rtol=1e-4
        )

    def test_bf16_grads_finite_and_close(self):
        """bf16 fast-path dtypes: grads come back in the primal dtypes and
        agree with the f32 XLA formulation to bf16 resolution."""
        import jax as _jax
        from vcrnet_tpu.ops.pallas_edgeconv import fused_edge_conv

        x, a, h, w2, b2, k, slope, ct1, ct2 = self._setup()
        ab, hb = a.astype(jnp.bfloat16), h.astype(jnp.bfloat16)
        w2b, b2b = w2.astype(jnp.bfloat16), b2.astype(jnp.bfloat16)

        def loss(args):
            a_, h_, w2_, b2_ = args
            x1, x2 = fused_edge_conv(
                x, a_, h_, w2_, b2_, k=k, interpret=True
            )
            return (
                jnp.sum(x1.astype(jnp.float32) * ct1)
                + jnp.sum(x2.astype(jnp.float32) * ct2)
            )

        g = _jax.grad(loss)((ab, hb, w2b, b2b))
        assert g[0].dtype == jnp.bfloat16
        idx = ops.knn(x, k, method="exact")

        def loss_ref(args):
            a_, h_, w2_, b2_ = args
            x1, x2 = self._xla_edge_conv(x, a_, h_, w2_, b2_, idx, 0.0)
            return jnp.sum(x1 * ct1) + jnp.sum(x2 * ct2)

        g_ref = _jax.grad(loss_ref)((a, h, w2, b2))
        for name, f, r in zip(("da", "dh", "dw2", "db2"), g, g_ref):
            f32 = np.asarray(f, dtype=np.float32)
            r32 = np.asarray(r, dtype=np.float32)
            assert np.isfinite(f32).all(), name
            # bf16 rounding can flip which neighbor wins a (near-tied) max,
            # relocating that element's cotangent — a discontinuity of the
            # op itself, not a kernel bug. Check aggregate closeness, and
            # for the big per-point grads that the bulk matches.
            fro = np.linalg.norm(f32 - r32) / max(np.linalg.norm(r32), 1e-6)
            assert fro < 0.1, (name, fro)
            if name in ("da", "dh"):
                rel = np.abs(f32 - r32) / max(np.abs(r32).max(), 1.0)
                assert (rel > 0.05).mean() < 0.02, name
                assert np.median(rel) < 0.01, name


class TestLayerNormVJP:
    """ops/layernorm.py: forward bit-identical to the naive formulation,
    analytic backward == autodiff of the naive formulation."""

    @staticmethod
    def _naive(x, a, b, eps=1e-6):
        d = x.shape[-1]
        xf = x.astype(jnp.float32)
        mean = xf.mean(axis=-1, keepdims=True)
        var = ((xf - mean) ** 2).sum(axis=-1, keepdims=True) / (d - 1)
        y = a * (xf - mean) / (jnp.sqrt(var) + eps) + b
        return y.astype(x.dtype)

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_forward_bit_identical(self, dtype):
        import jax as _jax

        from vcrnet_tpu.ops.layernorm import layer_norm_torch

        rng = np.random.RandomState(0)
        x = jnp.asarray(rng.randn(4, 33, 96).astype(np.float32), dtype)
        a = jnp.asarray(rng.rand(96).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(96).astype(np.float32))
        got = _jax.jit(layer_norm_torch)(x, a, b)
        want = _jax.jit(self._naive)(x, a, b)
        assert got.dtype == want.dtype
        np.testing.assert_array_equal(
            np.asarray(got, np.float32), np.asarray(want, np.float32)
        )

    @pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
    def test_backward_matches_autodiff(self, dtype):
        import jax as _jax

        from vcrnet_tpu.ops.layernorm import layer_norm_torch

        rng = np.random.RandomState(1)
        x = jnp.asarray(rng.randn(3, 17, 64).astype(np.float32), dtype)
        a = jnp.asarray(rng.rand(64).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(64).astype(np.float32))
        ct = jnp.asarray(rng.randn(3, 17, 64).astype(np.float32), dtype)

        def loss(fn, args):
            return jnp.sum(fn(*args).astype(jnp.float32) * ct.astype(jnp.float32))

        g = _jax.grad(lambda t: loss(layer_norm_torch, t))((x, a, b))
        g_ref = _jax.grad(lambda t: loss(self._naive, t))((x, a, b))
        assert g[0].dtype == dtype
        tol = 1e-5 if dtype == jnp.float32 else 2e-2
        for name, f, r in zip(("dx", "da", "db"), g, g_ref):
            f32 = np.asarray(f, np.float32)
            r32 = np.asarray(r, np.float32)
            fro = np.linalg.norm(f32 - r32) / max(np.linalg.norm(r32), 1e-6)
            assert fro < tol, (name, fro)

    def test_zero_variance_rows_finite_grad(self):
        """A ReLU-dead (all-constant) row must yield FINITE gradients.

        Regression for the self-sufficient warm start: an LPD embedding
        pretrained at leaky-slope 0.2 loaded into the slope-0.0 VCRNet
        leaves ~30% of points with all-zero embeddings; autodiff of the
        d(std)/dx term is 0/0 on those rows and one NaN row poisoned the
        whole train step (observed: train_loss=nan from epoch 0)."""
        import jax as _jax

        from vcrnet_tpu.ops.layernorm import layer_norm_torch

        rng = np.random.RandomState(3)
        x = rng.randn(2, 8, 32).astype(np.float32)
        x[0, 0] = 0.0  # dead row
        x[1, 3] = 2.5  # constant-but-nonzero row (also zero variance)
        x = jnp.asarray(x)
        a = jnp.asarray(rng.rand(32).astype(np.float32) + 0.5)
        b = jnp.asarray(rng.randn(32).astype(np.float32))
        ct = jnp.asarray(rng.randn(2, 8, 32).astype(np.float32))

        g = _jax.grad(
            lambda t: jnp.sum(layer_norm_torch(*t) * ct)
        )((x, a, b))
        for name, leaf in zip(("dx", "da", "db"), g):
            assert np.isfinite(np.asarray(leaf)).all(), name
        # healthy rows still match autodiff of the naive formulation
        g_ref = _jax.grad(
            lambda t: jnp.sum(self._naive(*t) * ct)
        )((x, a, b))
        np.testing.assert_allclose(
            np.asarray(g[0])[0, 1:], np.asarray(g_ref[0])[0, 1:],
            rtol=1e-5, atol=1e-6,
        )

    def test_grad_through_module(self):
        # the flax wrapper differentiates end-to-end (params + input)
        import jax as _jax

        from vcrnet_tpu.models.transformer import TorchLayerNorm

        rng = np.random.RandomState(2)
        x = jnp.asarray(rng.randn(2, 9, 32).astype(np.float32))
        m = TorchLayerNorm()
        v = m.init(_jax.random.PRNGKey(0), x)

        def loss(params, xx):
            return jnp.sum(m.apply({"params": params}, xx) ** 2)

        gp, gx = _jax.grad(loss, argnums=(0, 1))(v["params"], x)
        assert np.isfinite(np.asarray(gx)).all()
        assert all(
            np.isfinite(np.asarray(l)).all()
            for l in _jax.tree_util.tree_leaves(gp)
        )


class TestFusedDGCNN:
    """fused_dgcnn_eval (interpret mode) vs the XLA DGCNN module at eval
    with randomized BatchNorm running stats — validates both the BN fold
    and the in-VMEM conv chain."""

    def test_matches_module_eval(self):
        import jax as _jax
        from vcrnet_tpu.models.embeddings import DGCNN
        from vcrnet_tpu.ops import knn
        from vcrnet_tpu.ops.pallas_dgcnn import (
            fold_dgcnn_eval_params, fused_dgcnn_eval,
        )

        rng = np.random.RandomState(3)
        B, N, k, emb = 2, 64, 5, 128
        x = jnp.asarray(rng.rand(B, N, 3).astype(np.float32) - 0.5)
        model = DGCNN(emb_dims=emb, k=k)  # dtype=None -> f32 slow path
        variables = model.init(_jax.random.PRNGKey(0), x)
        # randomize the running stats so the fold is actually exercised
        bs = _jax.tree_util.tree_map(
            lambda a: jnp.asarray(
                rng.rand(*a.shape).astype(np.float32) * 0.5 + 0.75
            ),
            variables["batch_stats"],
        )
        variables = {"params": variables["params"], "batch_stats": bs}

        ref = model.apply(variables, x, train=False)
        folded = fold_dgcnn_eval_params(
            variables["params"], variables["batch_stats"]
        )
        idx = knn(x, k=k)
        out = fused_dgcnn_eval(x, idx, folded, emb, interpret=True)
        assert out.shape == ref.shape
        scale = float(np.abs(np.asarray(ref)).max()) + 1e-8
        # kernel runs bf16 matmuls (the TPU fast profile); the f32 module
        # is the oracle — tolerance covers 4 stages of bf16 rounding
        np.testing.assert_allclose(
            np.asarray(out) / scale, np.asarray(ref) / scale, atol=2e-2
        )

    def test_supported_gate(self):
        from vcrnet_tpu.ops.pallas_dgcnn import fused_dgcnn_supported

        assert fused_dgcnn_supported(1024, 20, 512)
        assert fused_dgcnn_supported(768, 20, 512)
        assert not fused_dgcnn_supported(1001, 20, 512)  # ragged N
        assert not fused_dgcnn_supported(1024, 20, 320)  # emb % 128
