"""Generic jitted train/eval engine for all four model families.

One parameterised engine replaces the reference's four copy-pasted
train/test loop pairs (model/vcrnet_model.py:521-1017, dcp_model.py:226-560,
lpdnet_model.py:232-372, icp_model.py:174-325). Differences from the
reference that are deliberate TPU-first upgrades:

  * the whole step (forward, loss, grads, optimizer, metric sums) is ONE
    jitted function — no per-batch host sync (the reference detaches every
    prediction to numpy every step, vcrnet_model.py:693-703);
  * metrics accumulate as on-device sums (see metrics.py);
  * batch axis is sharded over a 1-D device mesh; the gradient all-reduce is
    inserted by the jit partitioner (see parallel/mesh.py);
  * eval keeps static shapes: ragged final batches arrive padded with a
    `valid` mask from the loader.

Loss definitions (parity with reference vcrnet_model.py:711-720):
  pose:  MSE(R_pred^T R_gt, I) + MSE(t_pred, t_gt)
  point: MSE(R_gt srcK + t_gt, src_corrK)
  mixed: pose + 0.1 * MSE(R_pred src + t_pred, tgt)
Cycle-consistency (x0.1) is metric-only for VCRNet (reference backward() at
:722 happens before the cycle block) but part of the DCP training loss
(dcp_model.py:409-418).
"""

from __future__ import annotations

from typing import Any, Optional

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct

from vcrnet_tpu import geometry
from vcrnet_tpu.config import Config
from vcrnet_tpu.models import VCRNet, DCP, LPD, icp_register
from vcrnet_tpu.models.vcrnet import vcrnet_iter, vcrnet_icp
from vcrnet_tpu.models.lpd import lpd_loss
from vcrnet_tpu.parallel import (
    make_mesh,
    batch_sharding,
    replicated_sharding,
)
from vcrnet_tpu.train import metrics as M
from vcrnet_tpu.train.optim import (
    make_optimizer,
    initial_lr,
    set_lr,
    ReduceLROnPlateau,
    MultiStepLR,
    EARLY_STOP_LR,
)


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array

    def variables(self):
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        return v


def _loader_len(loader) -> Optional[int]:
    try:
        return len(loader)
    except TypeError:
        return None


def _weighted_mean(per_sample: jax.Array, valid: jax.Array) -> jax.Array:
    return jnp.sum(per_sample * valid) / jnp.maximum(jnp.sum(valid), 1e-12)


def _pose_loss_per_sample(R_pred, t_pred, R_gt, t_gt):
    eye = jnp.eye(3, dtype=R_pred.dtype)
    r = jnp.einsum("bji,bjk->bik", R_pred, R_gt) - eye
    return jnp.mean(r**2, axis=(1, 2)) + jnp.mean((t_pred - t_gt) ** 2, axis=1)


def _cycle_loss(R_ab_p, t_ab_p, R_ba_p, t_ba_p):
    """reference vcrnet_model.py:727-734 (batch-mean scalar)."""
    eye = jnp.eye(3, dtype=R_ab_p.dtype)
    rot = jnp.mean((jnp.einsum("bij,bjk->bik", R_ba_p, R_ab_p) - eye) ** 2)
    tr = jnp.mean(
        (jnp.einsum("bji,bj->bi", R_ba_p, t_ab_p) + t_ba_p) ** 2
    )
    return rot + tr


def _board_scalars(writer, split: str, loss: float, summary: dict, epoch: int):
    """The reference's full TensorBoard scalar matrix (dcp_model.py:727-793):
    for each direction x split, loss plus point/rotation/translation
    MSE/RMSE/MAE. The reference's vcrnet loop writes a subset of the same
    tags (vcrnet_model.py:997-1010); we emit the full matrix for both."""
    for d, suf in (("A->B", "ab"), ("B->A", "ba")):
        writer.scalar(f"{d}/{split}/loss", loss, epoch)
        for tag, key in (
            ("MSE", f"point_{suf}_MSE"),
            ("RMSE", f"point_{suf}_RMSE"),
            ("MAE", f"point_{suf}_MAE"),
            ("rotation/MSE", f"rot_{suf}_MSE"),
            ("rotation/RMSE", f"rot_{suf}_RMSE"),
            ("rotation/MAE", f"rot_{suf}_MAE"),
            ("translation/MSE", f"trans_{suf}_MSE"),
            ("translation/RMSE", f"trans_{suf}_RMSE"),
            ("translation/MAE", f"trans_{suf}_MAE"),
        ):
            if key in summary:
                writer.scalar(f"{d}/{split}/{tag}", summary[key], epoch)


class Trainer:
    """Builds the model for cfg.model and exposes jitted step functions."""

    def __init__(self, cfg: Config, mesh=None):
        self.cfg = cfg
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh_shape)
        if cfg.model == "vcrnet":
            self.model = VCRNet(cfg=cfg)
        elif cfg.model == "dcp":
            self.model = DCP(cfg=cfg)
        elif cfg.model == "lpd":
            self.model = LPD(cfg=cfg)
        elif cfg.model == "icp":
            self.model = None  # parameter-free
        else:
            raise ValueError(f"unknown model: {cfg.model}")
        self.tx = make_optimizer(cfg) if self.model is not None else None

        self._rep = replicated_sharding(self.mesh)
        self._shd = batch_sharding(self.mesh)

        self._train_step = jax.jit(
            self._train_step_impl,
            in_shardings=(self._rep, self._shd),
            donate_argnums=(0,),
        )
        # raw-cloud path: augmentation happens INSIDE the jitted step on
        # device (north-star data path; host only ships raw clouds)
        self._train_step_raw = jax.jit(
            self._train_step_raw_impl,
            in_shardings=(self._rep, self._shd),
            donate_argnums=(0,),
        )
        self._eval_step = jax.jit(
            self._eval_step_impl, in_shardings=(self._rep, self._shd)
        )

    # ------------------------------------------------------------------
    # state
    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array, example_batch: dict) -> TrainState:
        src = jnp.asarray(example_batch["src"][:1])
        tgt = jnp.asarray(example_batch["tgt"][:1])
        variables = self.model.init(rng, src, tgt)
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            step=jnp.asarray(0, jnp.int32),
        )
        return jax.device_put(state, self._rep)

    # ------------------------------------------------------------------
    # forward + loss per model family
    # ------------------------------------------------------------------

    def _apply(self, variables, src, tgt, train: bool, rngs=None):
        if train:
            def fwd(variables, src, tgt):
                return self.model.apply(
                    variables, src, tgt, True,
                    mutable=["batch_stats"], rngs=rngs,
                )

            if self.cfg.remat:
                # full rematerialization: store only the step inputs and
                # recompute the forward during the backward — exact math,
                # ~one extra forward of FLOPs for most of the activation
                # HBM (Config.remat; lever for larger batch/N)
                fwd = jax.checkpoint(fwd)
            return fwd(variables, src, tgt)
        return self.model.apply(variables, src, tgt), {}

    def _vcrnet_loss_and_sums(self, out, batch, valid):
        cfg = self.cfg
        src, tgt = batch["src"], batch["tgt"]
        src_k, src_corr_k, R_ab_p, t_ab_p, R_ba_p, t_ba_p = out
        R_gt, t_gt = batch["R_ab"], batch["t_ab"]

        pose_ps = _pose_loss_per_sample(R_ab_p, t_ab_p, R_gt, t_gt)
        moved_k = geometry.transform_points(src_k, R_gt, t_gt)
        point_ps = jnp.mean((moved_k - src_corr_k) ** 2, axis=(1, 2))

        if cfg.loss == "pose":
            loss_ps = pose_ps
        elif cfg.loss == "point":
            loss_ps = point_ps
        else:  # mixed
            moved_full = geometry.transform_points(src, R_ab_p, t_ab_p)
            loss_ps = pose_ps + 0.1 * jnp.mean(
                (moved_full - tgt) ** 2, axis=(1, 2)
            )
        loss = _weighted_mean(loss_ps, valid)

        sums = {"loss": jnp.sum(loss_ps * valid), "loss_pose": jnp.sum(pose_ps * valid)}
        if cfg.cycle:
            cyc = _cycle_loss(R_ab_p, t_ab_p, R_ba_p, t_ba_p)
            sums["cycle_loss"] = 0.1 * cyc * jnp.sum(valid)
            # reference folds the cycle term into loss_pose (the
            # best-checkpoint / plateau metric), vcrnet_model.py:727-734
            sums["loss_pose"] = sums["loss_pose"] + 0.1 * cyc * jnp.sum(valid)
        # point metrics ab: transformed srcK vs corr; ba: back-transformed tgt vs src
        back = geometry.transform_points(tgt, R_ba_p, t_ba_p)
        ps_ab = M.point_sums(moved_k, src_corr_k, valid)
        ps_ba = M.point_sums(back, src, valid)
        sums["p_se_ab"], sums["p_ae_ab"] = ps_ab["p_se"], ps_ab["p_ae"]
        sums["p_se_ba"], sums["p_ae_ba"] = ps_ba["p_se"], ps_ba["p_ae"]
        sums["count"] = ps_ab["count"]
        rt_ab = M.rotation_translation_sums(
            R_ab_p, t_ab_p, batch["euler_ab"], batch["t_ab"], valid, "zyx"
        )
        rt_ba = M.rotation_translation_sums(
            R_ba_p, t_ba_p, batch["euler_ba"], batch["t_ba"], valid, "xyz"
        )
        sums.update({f"{k}_ab": v for k, v in rt_ab.items() if k != "count3"})
        sums.update({f"{k}_ba": v for k, v in rt_ba.items() if k != "count3"})
        sums["count3"] = rt_ab["count3"]
        return loss, sums

    def _dcp_loss_and_sums(self, out, batch, valid):
        cfg = self.cfg
        src, tgt = batch["src"], batch["tgt"]
        R_ab_p, t_ab_p, R_ba_p, t_ba_p, src_out, src_corr = out
        R_gt, t_gt = batch["R_ab"], batch["t_ab"]

        moved = geometry.transform_points(src_out, R_ab_p, t_ab_p)
        if cfg.loss == "pose":
            loss_ps = _pose_loss_per_sample(R_ab_p, t_ab_p, R_gt, t_gt)
        else:  # point
            loss_ps = jnp.mean((moved - src_corr) ** 2, axis=(1, 2))
        loss = _weighted_mean(loss_ps, valid)
        sums = {"loss": jnp.sum(loss_ps * valid)}
        if cfg.cycle:
            cyc = _cycle_loss(R_ab_p, t_ab_p, R_ba_p, t_ba_p)
            loss = loss + 0.1 * cyc  # in the DCP gradient (dcp_model.py:416)
            sums["cycle_loss"] = 0.1 * cyc * jnp.sum(valid)

        back = geometry.transform_points(tgt, R_ba_p, t_ba_p)
        ps_ab = M.point_sums(moved, tgt, valid)
        ps_ba = M.point_sums(back, src, valid)
        sums["p_se_ab"], sums["p_ae_ab"] = ps_ab["p_se"], ps_ab["p_ae"]
        sums["p_se_ba"], sums["p_ae_ba"] = ps_ba["p_se"], ps_ba["p_ae"]
        sums["count"] = ps_ab["count"]
        rt_ab = M.rotation_translation_sums(
            R_ab_p, t_ab_p, batch["euler_ab"], batch["t_ab"], valid, "zyx"
        )
        rt_ba = M.rotation_translation_sums(
            R_ba_p, t_ba_p, batch["euler_ba"], batch["t_ba"], valid, "xyz"
        )
        sums.update({f"{k}_ab": v for k, v in rt_ab.items() if k != "count3"})
        sums.update({f"{k}_ba": v for k, v in rt_ba.items() if k != "count3"})
        sums["count3"] = rt_ab["count3"]
        return loss, sums

    def _lpd_loss_and_sums(self, variables, batch, valid, train):
        src, tgt = batch["src"], batch["tgt"]
        if train:
            (src_emb, tgt_emb, _, _, _), mut = self.model.apply(
                variables, src, tgt, True, mutable=["batch_stats"]
            )
        else:
            src_emb, tgt_emb, _, _, _ = self.model.apply(variables, src, tgt)
            mut = {}
        loss_ps = lpd_loss(src, src_emb, tgt_emb, per_sample=True)  # [B]
        loss = _weighted_mean(loss_ps, valid)
        mse_ps = jnp.mean((src_emb - tgt_emb) ** 2, axis=(1, 2))
        mae_ps = jnp.mean(jnp.abs(src_emb - tgt_emb), axis=(1, 2))
        sums = {
            # reference: mse_ab_ = batch_mean * B (lpdnet_model.py:158),
            # accumulated plainly (250-252) == sum of per-sample means
            "loss": jnp.sum(loss_ps * valid),
            "mse": jnp.sum(mse_ps * valid),
            "mae": jnp.sum(mae_ps * valid),
            "count": jnp.sum(valid),
        }
        return loss, sums, mut

    # ------------------------------------------------------------------
    # jitted steps
    # ------------------------------------------------------------------

    def _train_step_impl(self, state: TrainState, batch: dict):
        cfg = self.cfg
        valid = batch.get("valid", jnp.ones(batch["src"].shape[0]))
        # dropout rng: deterministic fold of (seed, step); only threaded when
        # the flag is active so the dropout=0 trace is unchanged
        rngs = None
        if cfg.dropout > 0.0:
            rngs = {
                "dropout": jax.random.fold_in(
                    jax.random.PRNGKey(cfg.seed + 0xD0), state.step
                )
            }

        def loss_fn(params):
            variables = {"params": params}
            if state.batch_stats:
                variables["batch_stats"] = state.batch_stats
            if cfg.model == "lpd":
                loss, sums, mut = self._lpd_loss_and_sums(
                    variables, batch, valid, train=True
                )
                return loss, (sums, mut)
            out, mut = self._apply(
                variables, batch["src"], batch["tgt"], train=True, rngs=rngs
            )
            if cfg.model == "vcrnet":
                loss, sums = self._vcrnet_loss_and_sums(out, batch, valid)
            else:
                loss, sums = self._dcp_loss_and_sums(out, batch, valid)
            return loss, (sums, mut)

        (_, (sums, mut)), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        new_bs = mut.get("batch_stats", state.batch_stats)
        state = state.replace(
            params=params,
            batch_stats=new_bs,
            opt_state=opt_state,
            step=state.step + 1,
        )
        return state, sums

    def _train_step_raw_impl(self, state: TrainState, batch: dict):
        """Train on raw clouds: the ModelNet40-style augmentation (rotate/
        translate/subsample/crop/jitter) runs on-device inside this jitted
        step — the host never touches augmented data."""
        from vcrnet_tpu.data.augment import device_augment_batch

        key = jax.random.fold_in(
            jax.random.PRNGKey(self.cfg.seed), state.step
        )
        aug = device_augment_batch(key, batch["clouds"], self.cfg)
        aug["valid"] = batch.get(
            "valid", jnp.ones(batch["clouds"].shape[0])
        )
        return self._train_step_impl(state, aug)

    def train_epoch_raw(self, state: TrainState, cloud_batches):
        """Epoch over raw-cloud batches: iterable of [B, M, 3] arrays."""
        from vcrnet_tpu.data.pipeline import prefetch
        from vcrnet_tpu.parallel.mesh import pad_to_multiple

        def to_device(clouds):
            batch = {"clouds": np.asarray(clouds)}
            batch["valid"] = np.ones(batch["clouds"].shape[0], np.float32)
            batch = pad_to_multiple(batch, self.mesh.devices.size)
            return jax.tree_util.tree_map(
                lambda x: jax.device_put(x, self._shd), batch
            )

        acc = M.EpochAccumulator()
        for dev in prefetch(cloud_batches, to_device):
            state, sums = self._train_step_raw(state, dev)
            acc.add(sums)
        return state, M.summarize(acc)

    def _eval_step_impl(self, state: TrainState, batch: dict):
        cfg = self.cfg
        valid = batch.get("valid", jnp.ones(batch["src"].shape[0]))
        src, tgt = batch["src"], batch["tgt"]

        if cfg.model == "icp":
            _, _, R_ab, t_ab, R_ba, t_ba = icp_register(
                src, tgt, max_iterations=cfg.max_iterations
            )
            out = (R_ab, t_ab, R_ba, t_ba, src, src)
            _, sums = self._dcp_loss_and_sums(out, batch, valid)
            return sums

        variables = state.variables()
        if cfg.model == "lpd":
            _, sums, _ = self._lpd_loss_and_sums(
                variables, batch, valid, train=False
            )
            return sums
        if cfg.model == "vcrnet":
            apply_fn = lambda v, s, t: self.model.apply(v, s, t)
            if cfg.iter > 0:
                out = vcrnet_iter(
                    apply_fn, variables, src, tgt, cfg.iter, model=self.model
                )
            else:
                out = vcrnet_icp(
                    apply_fn, variables, src, tgt, cfg.max_iterations
                )
            _, sums = self._vcrnet_loss_and_sums(out, batch, valid)
            return sums
        out, _ = self._apply(variables, src, tgt, train=False)
        _, sums = self._dcp_loss_and_sums(out, batch, valid)
        return sums

    def _per_sample_errors_impl(self, state: TrainState, batch: dict):
        """Per-sample rot/trans squared errors (for worst-case mining,
        reference showBad / the argsort scaffolds in testVCRNet:808-813
        and testDCP:491-499)."""
        cfg = self.cfg
        src, tgt = batch["src"], batch["tgt"]
        if cfg.model == "icp":
            _, _, R_ab, t_ab, _, _ = icp_register(
                src, tgt, max_iterations=cfg.max_iterations
            )
        else:
            variables = state.variables()
            if cfg.model == "vcrnet" and cfg.iter > 0:
                out = vcrnet_iter(
                    lambda v, s, t: self.model.apply(v, s, t),
                    variables, src, tgt, cfg.iter, model=self.model,
                )
                R_ab, t_ab = out[2], out[3]
            else:
                out = self.model.apply(variables, src, tgt)
                R_ab, t_ab = (out[2], out[3]) if cfg.model == "vcrnet" else (
                    out[0], out[1]
                )
        e_pred = geometry.mat_to_euler_zyx(R_ab, degrees=True)
        e_gt = jnp.degrees(batch["euler_ab"])
        rot_se = jnp.sum((e_pred - e_gt) ** 2, axis=-1)
        trans_se = jnp.sum((batch["t_ab"] - t_ab) ** 2, axis=-1)
        return rot_se, trans_se, batch["valid"]

    def worst_cases(self, state: TrainState, loader, k: int = 5):
        """Indices (dataset order) of the k worst rotation and translation
        errors over the loader."""
        # outputs replicated so every process can fetch them to host
        # (under the multi-host feed path a batch-sharded output would
        # span non-addressable devices and np.asarray would fail)
        fn = jax.jit(
            self._per_sample_errors_impl,
            in_shardings=(self._rep, self._shd),
            out_shardings=self._rep,
        )
        rot, trans = [], []
        for batch in loader:
            r, t, valid = fn(state, self._to_device(batch))
            r = np.where(np.asarray(valid) > 0, np.asarray(r), -np.inf)
            t = np.where(np.asarray(valid) > 0, np.asarray(t), -np.inf)
            rot.append(r)
            trans.append(t)
        rot = np.concatenate(rot)
        trans = np.concatenate(trans)
        return {
            "worst_rot_idx": np.argsort(rot)[-k:][::-1].tolist(),
            "worst_trans_idx": np.argsort(trans)[-k:][::-1].tolist(),
            "rot_se": rot,
            "trans_se": trans,
        }

    # ------------------------------------------------------------------
    # epoch drivers
    # ------------------------------------------------------------------

    def train_epoch(self, state: TrainState, loader):
        from vcrnet_tpu.data.pipeline import prefetch
        from vcrnet_tpu.utils.logging import Progress

        acc = M.EpochAccumulator()
        prog = Progress(desc="train")
        for batch in prog.wrap(prefetch(loader, self._to_device),
                               total=_loader_len(loader)):
            state, sums = self._train_step(state, batch)
            acc.add(sums)
        return state, M.summarize(acc)

    def eval_epoch(self, state: TrainState, loader):
        from vcrnet_tpu.data.pipeline import prefetch
        from vcrnet_tpu.utils.logging import Progress

        acc = M.EpochAccumulator()
        prog = Progress(desc="eval")
        for batch in prog.wrap(prefetch(loader, self._to_device),
                               total=_loader_len(loader)):
            sums = self._eval_step(state, batch)
            acc.add(sums)
        return M.summarize(acc)

    def _to_device(self, batch: dict) -> dict:
        from vcrnet_tpu.parallel.mesh import pad_to_multiple

        batch = {k: np.asarray(v) for k, v in batch.items() if k != "label"}
        if "valid" not in batch:
            batch["valid"] = np.ones(batch["src"].shape[0], np.float32)
        batch = pad_to_multiple(batch, self.mesh.devices.size)
        if jax.process_count() > 1:
            # multi-host: every process iterates the same batches; keep
            # only our rows and assemble the global sharded arrays
            from vcrnet_tpu.parallel.multihost import (
                global_batch_from_local,
                local_batch_slice,
            )

            global_b = batch["src"].shape[0]
            return global_batch_from_local(
                local_batch_slice(batch), self.mesh, global_b
            )
        return jax.tree_util.tree_map(
            lambda x: jax.device_put(x, self._shd), batch
        )

    # ------------------------------------------------------------------
    # full fit loop
    # ------------------------------------------------------------------

    def fit(
        self,
        state: TrainState,
        train_loader,
        test_loader,
        epochs: Optional[int] = None,
        log=print,
        checkpoint_dir: Optional[str] = None,
        metrics_writer=None,
    ):
        cfg = self.cfg
        epochs = epochs if epochs is not None else cfg.epochs
        if cfg.model == "lpd":
            sched = MultiStepLR(initial_lr(cfg))
        else:
            patience = 5 if cfg.model == "dcp" else 10
            sched = ReduceLROnPlateau(initial_lr(cfg), patience=patience)
        best_loss = float("inf")
        best_sum: dict = {}
        start_epoch = 0
        # resume the scheduler/best-loss trackers (the reference restarts
        # the LR schedule on resume — SURVEY.md §5 checkpoint)
        if checkpoint_dir is not None:
            from vcrnet_tpu.train.checkpoint import load_fit_state

            fit_state = load_fit_state(checkpoint_dir)
            if fit_state is not None:
                best_loss = fit_state["best_loss"]
                start_epoch = fit_state["epoch"] + 1
                sched.__dict__.update(fit_state["sched"])
                state = state.replace(
                    opt_state=set_lr(state.opt_state, sched.lr)
                )
                log(f"resumed fit state at epoch {start_epoch}")
        history = []
        for epoch in range(start_epoch, epochs):
            state, train_sum = self.train_epoch(state, train_loader)
            test_sum = self.eval_epoch(state, test_loader)
            key = "loss_pose" if cfg.model == "vcrnet" else "loss"
            test_loss = test_sum.get(key, test_sum.get("loss", 0.0))
            if test_loss <= best_loss:
                best_loss = test_loss
                best_sum = test_sum
                if checkpoint_dir is not None:
                    from vcrnet_tpu.train.checkpoint import save_checkpoint

                    save_checkpoint(checkpoint_dir, "model.best", state)
            # reference steps the plateau scheduler on the BEST loss
            # (vcrnet_model.py:940)
            lr = sched.step(best_loss if cfg.model != "lpd" else None)
            state = state.replace(opt_state=set_lr(state.opt_state, lr))
            history.append(
                {"epoch": epoch, "lr": lr, "train": train_sum, "test": test_sum}
            )
            if metrics_writer is not None:
                # full reference scalar matrix (dcp_model.py:727-793) plus
                # the vcrnet-specific tags (vcrnet_model.py:997-1010)
                _board_scalars(
                    metrics_writer, "train",
                    train_sum.get("loss", 0.0), train_sum, epoch,
                )
                _board_scalars(
                    metrics_writer, "test",
                    test_sum.get("loss", 0.0), test_sum, epoch,
                )
                _board_scalars(
                    metrics_writer, "best_test", best_loss, best_sum, epoch
                )
                metrics_writer.scalar(
                    "A->B/train/lossPose",
                    train_sum.get("loss_pose", 0.0), epoch,
                )
                metrics_writer.scalar(
                    "A->B/test/lossPose",
                    test_sum.get("loss_pose", 0.0), epoch,
                )
                metrics_writer.scalar("A->B/best_test/lr", lr, epoch)
            log(
                f"epoch {epoch}: lr={lr:.2e} "
                f"train_loss={train_sum.get('loss', float('nan')):.6f} "
                f"test_loss={test_loss:.6f} best={best_loss:.6f}"
            )
            if checkpoint_dir is not None:
                from vcrnet_tpu.train.checkpoint import (
                    save_checkpoint,
                    save_fit_state,
                )

                save_checkpoint(checkpoint_dir, f"model.{epoch}", state)
                save_fit_state(
                    checkpoint_dir,
                    {
                        "epoch": epoch,
                        "best_loss": best_loss,
                        "lr": lr,
                        "sched": dict(sched.__dict__),
                    },
                )
            if lr <= EARLY_STOP_LR:
                break
        return state, history
