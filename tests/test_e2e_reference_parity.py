"""END-TASK parity: the full eval protocol (model forward -> vcrnetIter
refinement -> reference metric math) through our JAX stack vs the torch
mirror of the reference (benchmarks/torch_mirror.py), on identical weights
and identical eval batches.

This is the composition the per-module goldens (tests/test_parity.py)
don't cover: the refinement transform composition (reference
vcrnet_model.py:21-43), the eval loop + epoch aggregation (:521-649), and
the euler-degree metric math (:768-790, scipy vs our closed-form). If these
agree here at small shapes — and every module is golden-tested at the
component level — the stacks produce the same end-task RMSE for any
weights; benchmarks/parity_report.py --reference runs the same comparison
at full reference shapes.

Weights come from OUR random init exported through the reverse converters
(export_vcrnet_state_dict), which round-trips the converter pair in the
process.
"""

import numpy as np
import pytest
import torch

import jax

from benchmarks import torch_mirror as tm
from vcrnet_tpu.config import Config
from vcrnet_tpu.data import Loader, SyntheticDataset
from vcrnet_tpu.models import VCRNet
from vcrnet_tpu.train import Trainer
from vcrnet_tpu.train.checkpoint import (
    convert_vcrnet_state_dict,
    export_vcrnet_state_dict,
    merge_params,
)

KEYS = (
    "rot_ab_RMSE", "rot_ab_MAE", "trans_ab_RMSE", "trans_ab_MAE",
    "rot_ba_RMSE", "trans_ba_RMSE",
)


def _run_both(partial: bool, n_iter: int):
    cfg = Config(
        num_points=64, emb_dims=64, ff_dims=128, n_heads=4,
        test_batch_size=8, iter=n_iter, partial=partial,
        overlap=0.575 if partial else 0.75,
    )
    ds = SyntheticDataset(cfg, "test", n_items=16, cloud_points=256)
    batches = list(Loader(ds, cfg.test_batch_size, shuffle=False))

    model = VCRNet(cfg=cfg)
    variables = model.init(
        jax.random.PRNGKey(0),
        batches[0]["src"][:1], batches[0]["tgt"][:1],
    )
    params = variables["params"]

    trainer = Trainer(cfg)
    state = trainer.init_state(jax.random.PRNGKey(cfg.seed), batches[0])
    state = state.replace(params=jax.device_put(params))
    ours = trainer.eval_epoch(state, batches)

    sd = {
        k: torch.tensor(np.asarray(v))
        for k, v in export_vcrnet_state_dict(params).items()
    }
    net = tm.TorchVCRNet(
        sd, d=cfg.emb_dims, h=cfg.n_heads,
        overlap2=cfg.overlap2 if partial else None,
    )
    theirs = tm.eval_protocol(net, batches, n_iter=n_iter)
    return ours, theirs


@pytest.mark.parametrize(
    "partial,n_iter,rot_tol",
    [
        pytest.param(False, 1, 0.05, id="whole_iter1"),
        pytest.param(False, 2, 0.05, id="whole_iter2"),
        # partial's hard top-k selections can FLIP on numerically-marginal
        # candidates under f32 (observed: 1 item of 16, where the two
        # stacks pick a different correspondence and R moves ~0.13; in f64
        # ALL items agree to 5e-7 — see test_partial_iter_parity_f64
        # below, the exactness certificate). The aggregate f32 tolerance
        # absorbs rare flips without masking systematic divergence.
        pytest.param(True, 2, 1.5, id="partial_iter2"),
    ],
)
def test_end_task_metrics_match_reference_stack(partial, n_iter, rot_tol):
    ours, theirs = _run_both(partial, n_iter)
    for k in KEYS:
        a, b = float(ours[k]), float(theirs[k])
        tol = rot_tol if k.startswith("rot") else 1e-3 * max(1.0, rot_tol)
        assert abs(a - b) < tol, f"{k}: jax={a} torch={b}"
    # the metrics must also be non-degenerate (untrained net, real rotations
    # in the eval set -> tens of degrees of rotation error)
    assert float(ours["rot_ab_RMSE"]) > 1.0


def test_partial_iter_parity_f64():
    """Exact parity certificate for the PARTIAL protocol: in float64 (no
    marginal top-k flips) the JAX refinement loop and the torch reference
    mirror must agree per item on the final composed (R, t)."""
    from vcrnet_tpu.models.vcrnet import vcrnet_iter

    jax.config.update("jax_enable_x64", True)
    try:
        n_iter = 2
        cfg = Config(
            num_points=64, emb_dims=64, ff_dims=128, n_heads=4,
            test_batch_size=8, iter=n_iter, partial=True, overlap=0.575,
        )
        ds = SyntheticDataset(cfg, "test", n_items=16, cloud_points=256)
        batches = list(Loader(ds, cfg.test_batch_size, shuffle=False))
        model = VCRNet(cfg=cfg)
        import jax.numpy as jnp

        src1 = jnp.asarray(batches[0]["src"][:1].astype(np.float64))
        variables = model.init(jax.random.PRNGKey(0), src1, src1)
        params = jax.tree_util.tree_map(
            lambda x: np.asarray(x, np.float64), variables["params"]
        )
        sd = {
            k: torch.tensor(np.asarray(v)).double()
            for k, v in export_vcrnet_state_dict(params).items()
        }
        net = tm.TorchVCRNet(sd, d=64, h=4, overlap2=cfg.overlap2)
        for b in batches:
            src = jnp.asarray(np.asarray(b["src"], np.float64))
            tgt = jnp.asarray(np.asarray(b["tgt"], np.float64))
            out = vcrnet_iter(
                model.apply, {"params": params}, src, tgt, n_iter
            )
            st = torch.tensor(
                np.asarray(b["src"]).transpose(0, 2, 1)
            ).double()
            tt = torch.tensor(
                np.asarray(b["tgt"]).transpose(0, 2, 1)
            ).double()
            with torch.no_grad():
                _, _, R_t, t_t, _, _ = tm.vcrnet_iter(
                    net, st, tt, n_iter=n_iter
                )
            np.testing.assert_allclose(
                np.asarray(out[2]), R_t.numpy(), atol=1e-5
            )
            np.testing.assert_allclose(
                np.asarray(out[3]), t_t.numpy(), atol=1e-5
            )
    finally:
        jax.config.update("jax_enable_x64", False)


def test_export_import_roundtrip():
    """export_vcrnet_state_dict is the exact inverse of
    convert_vcrnet_state_dict on the flagship param surface."""
    cfg = Config(num_points=64, emb_dims=64, ff_dims=128)
    model = VCRNet(cfg=cfg)
    rng = np.random.RandomState(0)
    src = rng.rand(1, 64, 3).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(1), src, src)
    params = variables["params"]

    sd = export_vcrnet_state_dict(params)
    back = convert_vcrnet_state_dict(sd)
    merged = merge_params(params, back)

    flat_a = jax.tree_util.tree_leaves_with_path(params)
    flat_b = {
        jax.tree_util.keystr(k): v
        for k, v in jax.tree_util.tree_leaves_with_path(merged)
    }
    for key, leaf in flat_a:
        np.testing.assert_array_equal(
            np.asarray(leaf), np.asarray(flat_b[jax.tree_util.keystr(key)]),
            err_msg=jax.tree_util.keystr(key),
        )
