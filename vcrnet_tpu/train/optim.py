"""Optimizers and LR schedules with torch-matching semantics.

Reference: Adam(lr, weight_decay=1e-4) or SGD(lr*100, momentum, wd=1e-4)
(model/vcrnet_model.py:819-824); ReduceLROnPlateau(min, factor=0.1,
patience=10, threshold=1e-6) stepped on the BEST test loss with early stop
at lr <= 1.1e-6 (vcrnet_model.py:826, 940-944; DCP uses patience 5,
dcp_model.py:567); MultiStepLR([75, 150, 200], 0.1) for LPD pretrain
(lpdnet_model.py:304).

torch's Adam weight_decay is L2-added-to-gradient (not AdamW), reproduced by
``add_decayed_weights`` BEFORE the Adam moments.
"""

from __future__ import annotations

import optax

from vcrnet_tpu.config import Config


def make_optimizer(cfg: Config) -> optax.GradientTransformation:
    """Returns an inject_hyperparams-wrapped optimizer so the learning rate
    lives in the optimizer state and schedulers can update it per epoch."""

    @optax.inject_hyperparams
    def make(learning_rate):
        if cfg.use_sgd:
            return optax.chain(
                optax.add_decayed_weights(cfg.weight_decay),
                optax.trace(decay=cfg.momentum, nesterov=False),
                optax.scale(-learning_rate),
            )
        return optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
            optax.scale(-learning_rate),
        )

    return make(initial_lr(cfg))


def initial_lr(cfg: Config) -> float:
    # reference: SGD runs at lr*100 (vcrnet_model.py:821)
    return cfg.lr * 100.0 if cfg.use_sgd else cfg.lr


def set_lr(opt_state, lr: float):
    """Set the injected learning rate through the supported optax tree API
    (``optax.tree_utils.tree_set``) rather than poking the
    InjectHyperparamsState namedtuple internals."""
    import jax.numpy as jnp
    from optax import tree_utils as otu

    return otu.tree_set(opt_state, learning_rate=jnp.asarray(lr, jnp.float32))


def get_lr(opt_state) -> float:
    from optax import tree_utils as otu

    return float(otu.tree_get(opt_state, "learning_rate"))


class ReduceLROnPlateau:
    """torch ReduceLROnPlateau, mode='min', threshold_mode='rel'."""

    def __init__(self, lr: float, factor=0.1, patience=10, threshold=1e-6):
        self.lr = lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.best = float("inf")
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            self.lr *= self.factor
            self.num_bad_epochs = 0
        return self.lr


class MultiStepLR:
    """torch MultiStepLR: lr * gamma^(milestones passed)."""

    def __init__(self, lr: float, milestones=(75, 150, 200), gamma=0.1):
        self.base_lr = lr
        self.milestones = sorted(milestones)
        self.gamma = gamma
        self.epoch = 0

    def step(self, _metric: float | None = None) -> float:
        self.epoch += 1
        passed = sum(1 for m in self.milestones if self.epoch >= m)
        self.lr = self.base_lr * self.gamma**passed
        return self.lr


EARLY_STOP_LR = 1.1e-6  # reference vcrnet_model.py:943-944
