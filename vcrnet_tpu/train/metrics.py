"""Registration metrics, accumulated as on-device sums.

The reference stores every prediction of the epoch on the host and converts
rotation matrices to euler degrees in a per-item scipy loop at epoch end
(model/vcrnet_model.py:768-815, util/util.py:99-104 — a D2H sync per batch).
Here each batch contributes weighted SUMS (squared error, absolute error,
counts), computed on device with the closed-form euler conversions; the
epoch summary is exact-equal math: mean = sum / count, RMSE = sqrt(MSE of
the whole epoch).

Metric definitions (parity-critical, reference vcrnet_model.py:774-790):
  rot_MSE  = mean over samples x 3 angles of (euler_pred_deg - euler_gt_deg)^2
             euler order 'zyx' for A->B, 'xyz' for B->A
  trans_MSE = mean over samples x 3 of (t_gt - t_pred)^2
  point MSE/MAE as in vcrnet_model.py:626-630.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from vcrnet_tpu import geometry


def rotation_translation_sums(
    R_pred, t_pred, euler_gt_rad, t_gt, valid, euler_order: str
):
    """Per-batch weighted sums for rot/trans metrics.

    R_pred [B,3,3], t_pred [B,3], euler_gt_rad [B,3], t_gt [B,3], valid [B].
    Returns dict of scalar sums.
    """
    if euler_order == "zyx":
        e_pred = geometry.mat_to_euler_zyx(R_pred, degrees=True)
    else:
        e_pred = geometry.mat_to_euler_xyz(R_pred, degrees=True)
    e_gt = jnp.degrees(euler_gt_rad)
    w = valid[:, None]
    r_err = e_pred - e_gt
    t_err = t_gt - t_pred
    return {
        "r_se": jnp.sum(w * r_err**2),
        "r_ae": jnp.sum(w * jnp.abs(r_err)),
        "t_se": jnp.sum(w * t_err**2),
        "t_ae": jnp.sum(w * jnp.abs(t_err)),
        "count3": jnp.sum(valid) * 3.0,
    }


def point_sums(a, b, valid):
    """Weighted sums of per-sample mean point errors: the reference
    accumulates batch_mean * batch_size (vcrnet_model.py:742-746), which is
    the sum over samples of per-sample means."""
    per_sample_se = jnp.mean((a - b) ** 2, axis=(1, 2))  # [B]
    per_sample_ae = jnp.mean(jnp.abs(a - b), axis=(1, 2))
    return {
        "p_se": jnp.sum(valid * per_sample_se),
        "p_ae": jnp.sum(valid * per_sample_ae),
        "count": jnp.sum(valid),
    }


class EpochAccumulator:
    """Accumulates per-batch sum dicts WITHOUT a host sync.

    Each ``add`` stacks the batch's device scalars into one vector and folds
    it into a running device vector — two tiny async dispatches per batch,
    no blocking. The (blocking) host conversion happens ONCE, lazily, when
    the sums are read at epoch end. This keeps the epoch loop fully
    asynchronous: host batch prep overlaps device compute instead of
    serializing on a ``float()`` of every step's metrics.
    """

    def __init__(self):
        self._dev = {}  # running device scalars
        self._host = None  # cached host dict after the epoch-end fetch

    def add(self, sums: dict):
        for k, v in sums.items():
            v = jnp.asarray(v, jnp.float32)
            prev = self._dev.get(k)
            self._dev[k] = v if prev is None else prev + v
        self._host = None

    @property
    def sums(self) -> dict:
        if self._host is None:
            if not self._dev:
                self._host = {}
            else:
                import numpy as np

                keys = list(self._dev.keys())
                # the one (blocking) host fetch of the epoch
                vals = np.asarray(jnp.stack([self._dev[k] for k in keys]))
                self._host = {k: float(v) for k, v in zip(keys, vals)}
        return self._host

    def __getitem__(self, k):
        return self.sums[k]

    def get(self, k, default=0.0):
        return self.sums.get(k, default)


def summarize(acc: EpochAccumulator) -> dict:
    """Epoch summary in the reference's reporting vocabulary."""
    n = max(acc.get("count", 0.0), 1e-12)
    n3 = max(acc.get("count3_ab", acc.get("count3", 0.0)), 1e-12)
    out = {"num_examples": acc.get("count", 0.0)}

    def put(prefix, se_key, ae_key, denom):
        if se_key in acc.sums:
            mse = acc[se_key] / denom
            out[f"{prefix}_MSE"] = mse
            out[f"{prefix}_RMSE"] = mse**0.5
            out[f"{prefix}_MAE"] = acc[ae_key] / denom

    put("rot_ab", "r_se_ab", "r_ae_ab", n3)
    put("trans_ab", "t_se_ab", "t_ae_ab", n3)
    put("rot_ba", "r_se_ba", "r_ae_ba", n3)
    put("trans_ba", "t_se_ba", "t_ae_ba", n3)
    put("point_ab", "p_se_ab", "p_ae_ab", n)
    put("point_ba", "p_se_ba", "p_ae_ba", n)
    for key in ("loss", "loss_pose", "cycle_loss", "mse", "mae"):
        if key in acc.sums:
            out[key] = acc[key] / n
    return out
