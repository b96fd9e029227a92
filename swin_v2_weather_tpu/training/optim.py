"""Optimizers and learning-rate schedules.

Reference behavior (``train.py:175-180, 210-215, 240-243``):
  * ``optimizer_type: 'adam'`` — fused Adam, betas (0.9, 0.95);
  * ``optimizer_type: 'FusedLAMB'`` — apex LAMB with max_grad_norm 5;
  * scheduler stepped **once per epoch**: CosineAnnealingLR(T_max=max_epochs)
    or ReduceLROnPlateau(factor=0.2, patience=5, mode='min').

TPU-native mapping: optax transforms (XLA fuses the elementwise optimizer
math into one kernel — the "fused" property the reference gets from
apex/cuda comes for free under jit). The per-epoch schedule runs on the
host, exactly like torch's ``scheduler.step()``, and pokes the learning rate
into the optimizer state via ``optax.inject_hyperparams`` — no recompilation
(the LR is an array leaf of the state pytree, not a compile-time constant).
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import optax


def build_optimizer(params) -> optax.GradientTransformation:
    """Optimizer factory; LR is injected as a state hyperparameter."""
    opt_type = str(params.optimizer_type)
    lr = float(params.lr)
    if opt_type == "adam":
        make = lambda learning_rate: optax.adam(learning_rate, b1=0.9, b2=0.95)
    elif opt_type in ("FusedLAMB", "lamb"):
        make = lambda learning_rate: optax.chain(
            optax.clip_by_global_norm(float(getattr(params, "max_grad_norm", None) or 5.0)),
            optax.lamb(learning_rate),
        )
    else:
        raise ValueError(f"optimizer type {opt_type} not implemented")
    return optax.inject_hyperparams(make)(learning_rate=lr)


def set_learning_rate(opt_state, lr: float):
    """Return opt_state with the injected learning rate replaced."""
    hp = dict(opt_state.hyperparams)
    hp["learning_rate"] = jnp.asarray(lr, dtype=jnp.float32)
    return opt_state._replace(hyperparams=hp)


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class CosineAnnealingLR:
    """lr(epoch) = eta_min + (base - eta_min) * (1 + cos(pi * epoch/T_max)) / 2.

    Torch ``CosineAnnealingLR`` closed form, stepped per epoch
    (reference ``train.py:214-215, 242-243``).
    """

    def __init__(self, base_lr: float, t_max: int, eta_min: float = 0.0, last_epoch: int = -1):
        self.base_lr = float(base_lr)
        self.t_max = int(t_max)
        self.eta_min = float(eta_min)
        self.epoch = last_epoch + 1  # epochs completed

    @property
    def lr(self) -> float:
        return self.eta_min + (self.base_lr - self.eta_min) * 0.5 * (
            1.0 + math.cos(math.pi * self.epoch / self.t_max)
        )

    def step(self, metric: Optional[float] = None) -> float:
        self.epoch += 1
        return self.lr

    def state_dict(self) -> dict:
        return {"epoch": float(self.epoch)}

    def load_state_dict(self, state: dict) -> None:
        self.epoch = int(state.get("epoch", self.epoch))


class ReduceLROnPlateau:
    """Torch ``ReduceLROnPlateau(factor=0.2, patience=5, mode='min')`` twin
    (reference ``train.py:211-212, 240-241``).

    Matches torch's default relative-improvement test (``threshold=1e-4``,
    ``threshold_mode='rel'``): an epoch only counts as an improvement when
    ``metric < best * (1 - threshold)`` — a run plateauing with
    micro-improvements decays the LR exactly where torch would.
    """

    def __init__(self, base_lr: float, factor: float = 0.2, patience: int = 5,
                 threshold: float = 1e-4):
        self.lr = float(base_lr)
        self.factor = factor
        self.patience = patience
        self.threshold = float(threshold)
        self.best = float("inf")
        self.bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.bad_epochs = 0
        else:
            self.bad_epochs += 1
            if self.bad_epochs > self.patience:
                self.lr *= self.factor
                self.bad_epochs = 0
        return self.lr

    def state_dict(self) -> dict:
        return {"lr": self.lr, "best": self.best, "bad_epochs": float(self.bad_epochs)}

    def load_state_dict(self, state: dict) -> None:
        self.lr = float(state.get("lr", self.lr))
        self.best = float(state.get("best", self.best))
        self.bad_epochs = int(state.get("bad_epochs", self.bad_epochs))


class ConstantLR:
    def __init__(self, base_lr: float):
        self.lr = float(base_lr)

    def step(self, metric: Optional[float] = None) -> float:
        return self.lr

    def state_dict(self) -> dict:
        return {}

    def load_state_dict(self, state: dict) -> None:
        pass


def build_scheduler(params, last_epoch: int = -1):
    """Scheduler factory (reference ``train.py:210-215``)."""
    name = getattr(params, "scheduler", None)
    lr = float(params.lr)
    if name == "CosineAnnealingLR":
        return CosineAnnealingLR(lr, int(params.max_epochs), last_epoch=last_epoch)
    if name == "ReduceLROnPlateau":
        return ReduceLROnPlateau(lr)
    return ConstantLR(lr)
